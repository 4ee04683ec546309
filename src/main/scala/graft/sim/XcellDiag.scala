package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: WHY does the 0.975-ceiling truth pair stay
  * unreachable to the seam-crossing walk? Prints the missing pair, its
  * cells, the probed cells, the centroid adjacency, and the missing
  * neighbor's in/out edges in the xcell graph.
  */
object XcellDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id", "embedding")
    val truth = RecallBench.bruteOver(spark, base)
      .select("query_id", "vizinho").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = EmbeddingOps.annGraphXcell(spark, sfDir)
      .select("query_id", "vizinho").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = truth -- served
    println(s"missing pairs: $missing")
    val cells = EmbeddingOps.kmeansCells(spark, sfDir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("cell").intValue()).toMap
    val cents = EmbeddingOps.kmeansCentroids(spark, sfDir)
    val cedges = EmbeddingOps.centroidEdgesOf(cents).collect()
      .map(r => (r.getAs[Number]("src").intValue(), r.getAs[Number]("dst").intValue()))
    println(s"centroid adjacency: ${cedges.sortBy(identity).mkString(" ")}")
    val asg = EmbeddingOps.kmeansCells(spark, sfDir)
      .join(base, Seq("vec_id")).select("vec_id", "embedding", "cell")
    val q = asg.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probes = EmbeddingOps.routeViaCentroidGraph(spark, q, cents,
      EmbeddingOps.entryCellOf(asg), EmbeddingOps.centroidEdgesOf(cents))
      .collect().map(r => (r.getLong(0), r.getAs[Number]("cell").intValue()))
    println(s"probed cells: ${probes.sortBy(_._1).mkString(" ")}")
    // the adjacency derivation (a blocked self-join over the corpus) is
    // the expensive part — derive once, cache, reuse per missing pair
    val xe = EmbeddingOps.graphEdgesXcellOf(spark, asg,
      EmbeddingOps.centroidEdgesOf(cents)).cache()
    for ((qid, v) <- missing) {
      println(s"query $qid cell=${cells(qid)}  missing neighbor $v cell=${cells(v)}")
      val inE = xe.filter(col("dst") === v).collect().map(_.getLong(0))
      val outE = xe.filter(col("src") === v).collect().map(_.getLong(1))
      println(s"  in-edges to $v: ${inE.length} from cells ${inE.map(cells).distinct.sorted.mkString(",")}")
      println(s"  out-edges of $v: ${outE.map(x => s"$x(c${cells(x)})").mkString(" ")}")
    }
    spark.stop()
  }
}
