package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for XcellScaleProfile's 0%-prunable result: the actual
  * geometry — per-cell unit-space radius, source-to-adjacent-centroid
  * distances, theta (R-th own-cell sim) quantiles — to confirm the
  * bound is vacuous rather than buggy.
  */
object XcellBoundDiag {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 25
    val work = s"/tmp/xsp_${reps}x"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val base = spark.read.parquet(s"$work/embeddings.parquet")
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id", "embedding")
    val n = base.count()
    val k = math.max(8, math.ceil(n.toDouble / 4000L).toInt)
    val cents = EmbeddingOps.kmeansCentroidsOf(base, k)
    val asg = graft.Checkpoint.barrier(EmbeddingOps.assignCells(spark, base, cents))
    val nrm = "sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x))"
    val unitAsg = asg.selectExpr("vec_id", "cell",
      s"transform(embedding, x -> CAST(x AS DOUBLE) / $nrm) AS u")
    val cnrm = "sqrt(aggregate(centroid, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x))"
    val unitCents = cents.selectExpr("cell",
      s"transform(centroid, x -> CAST(x AS DOUBLE) / $cnrm) AS cm")
    val dexpr = "sqrt(aggregate(zip_with(u, cm, (a, b) -> (a - b) * (a - b)), 0D, (a, x) -> a + x))"
    val memb = unitAsg.join(unitCents, Seq("cell"))
      .selectExpr("vec_id", "cell", s"$dexpr AS dc")
    println("[diag] per-cell OWN-centroid member distance + radius:")
    memb.groupBy("cell").agg(count(lit(1)).as("m"),
        expr("percentile(dc, 0.5)").as("med_dc"), max("dc").as("radius"))
      .orderBy("cell").collect()
      .foreach(r => println(f"[diag]   cell=${r.getInt(0)}%3d m=${r.getLong(1)}%6d med_dc=${r.getDouble(2)}%.3f radius=${r.getDouble(3)}%.3f"))
    // cross-centroid distances (source to ADJACENT cell centroid)
    val cedges = EmbeddingOps.centroidEdgesOf(cents)
    val srcU = unitAsg.select(col("cell").as("a_cell"), col("u"))
    val dB = "sqrt(aggregate(zip_with(u, cm, (a, b) -> (a - b) * (a - b)), 0D, (a, x) -> a + x))"
    val dcross = srcU.join(cedges.select(col("src").as("a_cell"), col("dst").as("b_cell")), Seq("a_cell"))
      .join(broadcast(unitCents.select(col("cell").as("b_cell"), col("cm"))), Seq("b_cell"))
      .selectExpr(s"$dB AS d")
    println("[diag] src->adjacent-centroid distance quantiles:")
    dcross.selectExpr("percentile(d, array(0.05, 0.5, 0.95)) AS q").collect()
      .foreach(r => println(s"[diag]   ${r.getSeq[Double](0).map(x => f"$x%.3f").mkString(", ")}"))
    spark.stop()
  }
}
