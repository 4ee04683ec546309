package graft

import org.apache.spark.sql.SparkSession

/** Idle-box re-measure of BENCH-INTERNAL rows — the sibling of
  * [[QueryRemeasure]] for rows that are not `SparkEntry.queries`
  * entries (stagings, lifecycle mutations, probe composites), which
  * the r19 verdict flagged as unreachable by the flap protocol:
  * `dedup_substring_hot_removed` (7.3 → 11.7 s r18→r19) and
  * `bm25_zipf_stage` (19.6 → 29.9 s) drifted with no code change on
  * their paths and nothing could say context-vs-code by measurement.
  * Each registered row replicates the EXACT work its Bench row times
  * (same staging, same writes), runs reps× in a fresh JVM on an
  * otherwise idle box, and prints every rep.
  *
  * Usage: `tools/run.sh graft.BenchRemeasure row_a,row_b [reps]`
  */
object BenchRemeasure {

  /** name → (setup once per rep (untimed), timed body, teardown).
    * Registered rows mirror graft.Bench verbatim — a drift adjudicated
    * here is adjudicated for the artifact row itself.
    */
  private def rows(spark: SparkSession,
      sfDir: String): Map[String, () => Unit] = Map(
    "bm25_zipf_stage" -> { () =>
      // the Bench row times the whole staging: corpus synthesis +
      // index build + query derivation (Bench.scala `once("bm25_zipf_stage")`)
      // — but NOT the scratch-dir teardown, which Bench runs outside its
      // timed window; the inner-window publish keeps the replica honest
      // (r20 ADVICE: the wall-to-wall form read systematically high)
      val zdir = s"/tmp/graft_remeasure_zipf_${System.nanoTime()}"
      try {
        val (n0, l, v) = graft.text.RetrievalOps.ZipfBench
        val n = sys.env.getOrElse("SPARK_GRAFT_ZIPF_DOCS", n0.toString).toInt
        val t0 = System.nanoTime()
        graft.text.RetrievalOps.buildBm25ZipfIndex(spark, n, l, v, zdir)
        graft.text.RetrievalOps.zipfQueriesOfDf(
          spark.read.parquet(s"$zdir/termmeta").select("term", "df"))
          .coalesce(1).write.mode("overwrite").parquet(s"$zdir/queries")
        lastInnerSec = Some((System.nanoTime() - t0) / 1e9)
      } finally rmTree(zdir)
    },
    "dedup_substring_hot_removed" -> { () =>
      // Bench stages the hot corpus UNTIMED and times only the removal
      // write; mirror that split — the staging cost lands outside the
      // measured window here exactly as there
      import org.apache.spark.sql.functions.{col, concat, lit}
      val hotDir = s"/tmp/graft_remeasure_substrhot_${System.nanoTime()}"
      try {
        val boiler = (1 to 32).map(i => s"hotskew$i").mkString(" ")
        Tables.documents(spark, sfDir)
          .withColumn("text",
            concat(lit(boiler + " " + boiler + " "), col("text")))
          .write.mode("overwrite").parquet(s"$hotDir/documents.parquet")
        val t0 = System.nanoTime()
        graft.text.TextOps.substringRemovedHot(spark, hotDir)
          .write.mode("overwrite").parquet(s"$hotDir/out")
        lastInnerSec = Some((System.nanoTime() - t0) / 1e9)
      } finally rmTree(hotDir)
    })

  /** Rows whose registry closure times an inner window itself (staging
    * excluded) publish it here; rows without it are timed wall-to-wall.
    */
  private var lastInnerSec: Option[Double] = None

  private def rmTree(p: String): Unit = {
    val d = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse {
        System.err.println("usage: BenchRemeasure row_a,row_b [reps]")
        sys.exit(2)
      }
    val reps = if (args.length > 1) args(1).toInt.max(1) else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Tuning.sessionShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tuning.applyProductionIo(spark) // no-op unless SPARK_GRAFT_PARQUET_CODEC set
    spark.sparkContext.setLogLevel("ERROR")
    val registry = rows(spark, sfDir)
    val unknown = names.filterNot(registry.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown bench-internal row(s): ${unknown.mkString(", ")} — " +
          s"registered: ${registry.keySet.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val out = names.map { n =>
      val runs = (1 to reps).map { _ =>
        lastInnerSec = None
        val t0 = System.nanoTime()
        registry(n)()
        val dt = lastInnerSec.getOrElse((System.nanoTime() - t0) / 1e9)
        Checkpoint.releaseAll() // between-reps hygiene, matching Bench
        dt
      }
      s""""$n":{"runs":${runs.map("%.3f".format(_)).mkString("[", ",", "]")},"min":${runs.min}}"""
    }
    println(s"""{"metric":"bench_remeasure","sf":"$sfDir","rows":${out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
