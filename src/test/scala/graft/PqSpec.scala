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

  test("a Lloyd round that empties a PQ cell fails the LUT build loudly") {
    // Engineer the empty cell the guard exists for: deterministic init
    // takes the K smallest vec_ids' sub-vectors as centroids, so making
    // vec 0 and vec 1 identical duplicates centroids 0 and 1; the
    // assignment tie-break (min on (dist, cell)) sends every member to
    // cell 0, pqRecompute's groupBy drops the now-empty cell 1, and the
    // codebook comes out non-dense. Before the guard this silently
    // shifted every higher code's positional ADC lookup.
    import spark.implicits._
    val vecs = (0 until 32).map { id =>
      val base = if (id == 1) 0 else id // vec 1 duplicates vec 0
      (id.toLong, Array.tabulate(64)(i => (base * 64 + i).toFloat))
    }
    val subBase = vecs.toDF("vec_id", "embedding")
      .withColumn("m", explode(sequence(lit(0), lit(3))))
      .selectExpr("vec_id", "m", "slice(embedding, m * 16 + 1, 16) AS sub")
    val cents = EmbeddingOps.pqCodebooksOf(subBase)
    assert(cents.groupBy("m").count().collect().forall(_.getLong(1) < 8),
      "setup must actually produce a non-dense codebook")
    val lut = cents.select(lit(0L).as("query_id"), col("m"),
      col("cell").as("code"), lit(1.0).as("part"))
    val ex = intercept[Exception] {
      EmbeddingOps.lutParts(lut).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(ex).contains("non-dense PQ codebook"),
      s"expected the explicit density error, got: ${messages(ex)}")
  }
}
