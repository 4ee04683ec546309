package graft

import org.apache.spark.sql.SparkSession

/** Idle-box re-measure of arbitrary `SparkEntry.queries` rows — the
  * r16 load-vs-code adjudication protocol, generalized: per-round
  * artifacts occasionally show a row 2–4× off its band with no code
  * change on its path (r3 kpi5/6/7, r15 funnel/phash, r18 PQ); this
  * main re-runs the named rows reps× in a fresh JVM on an otherwise
  * idle box and prints every rep, so band-vs-artifact is settled by
  * data instead of argument.
  *
  * Usage: `tools/run.sh graft.QueryRemeasure q_a,q_b [reps]`
  */
object QueryRemeasure {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse {
        System.err.println("usage: QueryRemeasure q_a,q_b [reps]"); sys.exit(2)
      }
    val reps = if (args.length > 1) args(1).toInt.max(1) else 5
    // validate BEFORE the session exists: a typo in a multi-name
    // invocation must not lose the timings of rows already measured
    // (r19 ADVICE) — unknown names get the usage error with the names
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown query row(s): ${unknown.mkString(", ")} — " +
          "names must be SparkEntry.queries keys")
      sys.exit(2)
    }
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
    val out = names.map { n =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count(): Unit
        val dt = (System.nanoTime() - t0) / 1e9
        Checkpoint.releaseAll() // between-reps hygiene, matching Bench
        dt
      }
      s""""$n":{"runs":${runs.map("%.3f".format(_)).mkString("[", ",", "]")},"min":${runs.min}}"""
    }
    println(s"""{"metric":"query_remeasure","sf":"$sfDir","rows":${out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
