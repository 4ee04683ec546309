package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-width sweep over an EXISTING routed graph store — the
  * diagnosis tool for a recall residual at adaptive-K scale: serve the
  * same persisted store at increasing (P, B, H) and report recall@5
  * against brute truth. If recall climbs with P, the miss is a ROUTING
  * miss (truth pairs sit in unprobed cells — the step schedule needs
  * more width at this cell count); if it stays flat, the miss is walk-
  * or corpus-truth-bound and no probe width recovers it (the
  * XcellDiag-style verdict).
  *
  * Usage: `tools/run.sh graft.sim.RoutedProbeSweep <storeDir> <sfDir>`
  */
object RoutedProbeSweep {
  def main(args: Array[String]): Unit = {
    val storeDir = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.sessionShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val truth = EmbeddingOps.annBruteForce(spark, sfDir).cache()
    truth.count(): Unit
    val cents = spark.read.parquet(s"$storeDir/centroids")
    val k = cents.count()
    val st = EmbeddingOps.cgraphSteps(k)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    out("cells") = k.toDouble
    out("steps") = st.toDouble
    for (mult <- Seq(1, 2, 4, 8)) {
      val p = (EmbeddingOps.CGRAPH_P + st) * mult
      val b = EmbeddingOps.CGRAPH_B + st
      val h = EmbeddingOps.CGRAPH_H + st
      val t0 = System.nanoTime()
      val served = EmbeddingOps.annGraphRoutedIndexedAt(spark, sfDir,
        storeDir, p, b, h)
      out(s"recall_p$p") = RecallBench.recall(truth, served)
      out(s"sec_p$p") = (System.nanoTime() - t0) / 1e9
    }
    val qs = out.map { case (kk, v) => "\"" + kk + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"routed_probe_sweep","store":"$storeDir","rows":$qs}""")
    spark.stop()
  }
}
