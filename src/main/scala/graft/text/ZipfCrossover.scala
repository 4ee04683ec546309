package graft.text

import org.apache.spark.sql.SparkSession

/** One-off WAND crossover measurement at a chosen Zipf-staging size —
  * the per-round bench keeps its 400k-doc row inside the bench budget;
  * this main answers the scale question directly: at what corpus size
  * does the pruned serve's postings saving overtake its fixed plan
  * overhead? Interleaved A/B reps off the same persisted index (the
  * bench's load-drift discipline), evaluation counts beside wall-clock.
  *
  * `SPARK_GRAFT_ZIPF_DOCS=4000000 sbt "runMain graft.text.ZipfCrossover"`
  */
object ZipfCrossover {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_ZIPF_DOCS", "4000000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (_, l, v) = RetrievalOps.ZipfBench
    val zdir = s"/tmp/graft_zipf_xover_${System.nanoTime()}"
    val t0 = System.nanoTime()
    RetrievalOps.buildBm25IndexOn(spark,
      RetrievalOps.zipfDocs(spark, docs, l, v), zdir)
    RetrievalOps.zipfQueriesOf(
      spark.read.parquet(s"$zdir/postings").drop("tb", "batch"))
      .coalesce(1).write.mode("overwrite").parquet(s"$zdir/queries")
    val stageSec = (System.nanoTime() - t0) / 1e9

    def rep(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val runs = (1 to reps).map { _ =>
      (rep(RetrievalOps.bm25ZipfServed(spark, zdir).count(): Unit),
        rep(RetrievalOps.bm25ZipfWandServed(spark, zdir).count(): Unit))
    }
    // the EXPENSIVE-scorer pair off the same index: per-posting cost at
    // a learned-re-ranker profile (depth-ExpensiveDepth md5 chain) —
    // the regime where the postings saving IS the wall-clock saving
    val eruns = (1 to reps).map { _ =>
      (rep(RetrievalOps.bm25ZipfExpensiveServed(spark, zdir).count(): Unit),
        rep(RetrievalOps.bm25ZipfExpensiveWandServed(spark, zdir).count(): Unit))
    }
    val (ex, pr) = RetrievalOps.bm25ZipfCounts(spark, zdir)
    println(s"""{"metric":"zipf_crossover","docs":$docs,"stage_sec":$stageSec,""" +
      s""""exhaustive_sec":${runs.map(_._1).min},"wand_sec":${runs.map(_._2).min},""" +
      s""""expensive_exhaustive_sec":${eruns.map(_._1).min},""" +
      s""""expensive_wand_sec":${eruns.map(_._2).min},""" +
      s""""expensive_depth":${RetrievalOps.ExpensiveDepth},""" +
      s""""exhaustive_postings":$ex,"wand_postings":$pr,"reps":$reps}""")

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(zdir))
    spark.stop()
  }
}
