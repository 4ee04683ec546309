package graft

import org.apache.spark.sql.functions._
import graft.sim.EmbeddingOps

/** Product-quantization invariants the DuckDB gate can't express: code
  * ranges/coverage (the 64× compression artifact), and the ADC identity —
  * the LUT-sum distance must equal the L2² between the query and the
  * RECONSTRUCTED (decoded) vector, because the subspaces partition the
  * dimensions: Σ_m ‖q_m − c_m‖² = ‖q − concat(c_m)‖². Computed by two
  * different routes (4-part LUT sum vs one 64-dim fold over the decoded
  * vector), so they agree to float tolerance, not bit-exactly.
  */
class PqSpec extends SparkSpec {

  test("every vector compresses to 4 codes in [0, 8)") {
    val codes = EmbeddingOps.pqCodes(spark, tiny).collect()
    val n = Tables.embeddings(spark, tiny).count()
    assert(codes.length == n, "one code row per corpus vector")
    codes.foreach { r =>
      (0 until 4).foreach { m =>
        val c = r.getAs[Int](s"c$m")
        assert(c >= 0 && c < 8, s"code out of codebook range: $r")
      }
    }
  }

  test("ADC distance equals L2² to the decoded reconstruction") {
    val cents = EmbeddingOps.pqCodebooks(spark, tiny)
      .collect().map(r => (r.getAs[Int]("m"), r.getAs[Int]("cell")) ->
        r.getSeq[Double](2).toArray).toMap
    val codes = EmbeddingOps.pqCodes(spark, tiny).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until 4).map(m => r.getAs[Int](s"c$m"))).toMap
    val vecs = Tables.embeddings(spark, tiny)
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val adc = EmbeddingOps.annPqAdc(spark, tiny).collect()
    assert(adc.nonEmpty)
    adc.foreach { r =>
      val q = vecs(r.getAs[Long]("query_id"))
      val recon = codes(r.getAs[Long]("vizinho")).zipWithIndex
        .flatMap { case (c, m) => cents((m, c)) }.toArray
      val l2 = q.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(r.getAs[Double]("adist") - l2) < 1e-9,
        s"ADC must decompose the decoded L2²: $r vs $l2")
    }
  }
}
