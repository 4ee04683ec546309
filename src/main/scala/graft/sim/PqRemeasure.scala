package graft.sim

import org.apache.spark.sql.SparkSession

/** Idle-box adjudication of the r17→r18 PQ drift (`ann_pq_index_build`
  * 0.97 → 3.47 s, `q_ann_pq_indexed` 0.39 → 0.97 s in the driver
  * artifacts, `gc_ms=0`, NO code change on the PQ path in the r18
  * diff) — r18 verdict "What's wrong" #1, settled by the r16 protocol:
  * re-measure the identical pair reps× on an otherwise-idle box and
  * compare against both rounds' artifacts. If idle reproduces the r17
  * band, the r18 row was machine load; if it reproduces r18, something
  * environmental on the path changed and needs a bisect.
  *
  * Prints one JSON line with per-rep timings (not just the min — the
  * rep spread IS the load evidence).
  * Reproduce: `tools/run.sh graft.sim.PqRemeasure`.
  */
object PqRemeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt.max(1)
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

    def rmTree(p: String): Unit = {
      val d = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(d)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }

    val pairs = (1 to reps).map { _ =>
      val dir = s"/tmp/graft_pq_remeasure_${System.nanoTime()}"
      val t0 = System.nanoTime()
      EmbeddingOps.buildPqIndex(spark, sfDir, dir)
      val build = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      EmbeddingOps.annPqIndexed(spark, sfDir, dir).count(): Unit
      val serve = (System.nanoTime() - t1) / 1e9
      rmTree(dir)
      (build, serve)
    }
    def arr(xs: Seq[Double]) = xs.map("%.3f".format(_)).mkString("[", ",", "]")
    println(s"""{"metric":"pq_remeasure","sf":"$sfDir","reps":$reps,""" +
      s""""build_runs":${arr(pairs.map(_._1))},""" +
      s""""build_min":${pairs.map(_._1).min},""" +
      s""""serve_runs":${arr(pairs.map(_._2))},""" +
      s""""serve_min":${pairs.map(_._2).min}}""")
    spark.stop()
  }
}
