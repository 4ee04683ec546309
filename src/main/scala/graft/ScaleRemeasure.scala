package graft

import org.apache.spark.sql.SparkSession

/** Idle-box re-measure of the three 10×-scale bench rows the r13 closing
  * artifact recorded above their historical bands
  * (`etl_star_build_shuffled_10x` 15.04 s vs band 7.2–8.3,
  * `etl_star_build_bucketed_10x` 7.29 s vs 4.3–5.6, `kpi_suite_sf1`
  * 7.68 s vs 5.4–7.7) — r13 VERDICT "Next round" item 1. The hypothesis
  * is machine load (the artifact of record ran right after the heavy sf1
  * verify session), not a plan flip; this main settles it with data:
  *
  *  - the IDENTICAL build/KPI code path as Bench phase 6 (both call
  *    [[StarBench]] — shared since r14, so a divergent copy can't skew);
  *  - reps = 3 per row, A/B INTERLEAVED for bucketed-vs-shuffled (drift
  *    hits both sides alike, direction is load-invariant), min reported;
  *  - a PLAN FINGERPRINT of both 10× fact builds (Exchange count + join
  *    strategy read off the executed plan) so "no plan flip" is asserted
  *    from the plan itself, not inferred from timings.
  *
  * Prints one JSON line (same shape as Bench) plus the fingerprint
  * lines; run it on an otherwise-idle box.
  */
object ScaleRemeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val wh = s"/tmp/graft_remeasure_wh_${System.nanoTime()}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.sessionShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tuning.applyProductionIo(spark) // no-op unless SPARK_GRAFT_PARQUET_CODEC set
    spark.sparkContext.setLogLevel("ERROR")

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def rep(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      Checkpoint.releaseAll() // between-reps hygiene, matching Bench
      dt
    }
    def rmTree(p: String): Unit = {
      val d = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(d)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }

    val sf1Dir = s"/tmp/graft_remeasure_sf1_${System.nanoTime()}"
    val dw1 = s"/tmp/graft_remeasure_dw1_${System.nanoTime()}"
    // saved OUTSIDE the try so the finally can restore it even when a
    // measurement mid-A/B throws (a leaked -1 threshold or a stray
    // bucketed table would skew every later run in this JVM)
    var abtSaved: Option[String] = None
    val curOut = s"/tmp/graft_remeasure_cur_${System.nanoTime()}"
    try {
      // r16: the two non-star rows the r15 driver run flagged out of band
      // (curate_run_funnel 17.26 s vs idle 12.45; q_multimodal_phash_dedup
      // 5.13 s vs idle 1.46) — reps× each on the idle box, min reported,
      // measured FIRST so the heavy 10× staging below can't warm or load
      // them
      val funnelRuns = (1 to reps).map { _ =>
        rmTree(curOut); rep(CurateRun.run(spark, sfDir, curOut): Unit)
      }
      times("curate_run_funnel") = funnelRuns.min
      times("curate_run_funnel_cold") = funnelRuns.head
      val phashRuns = (1 to reps).map { _ =>
        rep(SparkEntry.queries("q_multimodal_phash_dedup")(spark, sfDir)
          .collect(): Unit)
      }
      times("q_multimodal_phash_dedup") = phashRuns.min
      times("q_multimodal_phash_dedup_cold") = phashRuns.head

      StarBench.stage10x(spark, sfDir, sf1Dir)

      // etl_star_build_sf1 + the KPI suite it feeds — reps× each (Bench
      // records these once(); the re-measure wants a noise floor)
      val buildRuns = (1 to reps).map { _ =>
        rmTree(dw1); rep(StarBench.starBuildTo(spark, sf1Dir, dw1))
      }
      times("etl_star_build_sf1") = buildRuns.min
      times("etl_star_build_sf1_cold") = buildRuns.head
      val kpiRuns = (1 to reps).map { _ =>
        rep(StarBench.kpiSuite(spark, dw1).foreach { case (_, q) =>
          q().collect(): Unit
        })
      }
      times("kpi_suite_sf1") = kpiRuns.min
      times("kpi_suite_sf1_cold") = kpiRuns.head

      // bucketed vs shuffled, same discipline as Bench phase 6
      abtSaved = Some(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      times("etl_bucket_tables_build_10x") =
        rep(StarBench.bucket10x(spark, sf1Dir, cpus.toInt))

      // plan fingerprint BEFORE timing: Exchange count and join strategy
      // of the two fact builds — the "no plan flip" assertion
      def fingerprint(name: String,
          df: org.apache.spark.sql.DataFrame): Unit = {
        val plan = df.queryExecution.executedPlan.toString
        val exchanges = "(?m)^.*Exchange hashpartitioning".r
          .findAllIn(plan).size
        val smj = plan.contains("SortMergeJoin")
        val bhj = plan.contains("BroadcastHashJoin")
        println(s"PLAN $name: exchanges=$exchanges sortMergeJoin=$smj " +
          s"broadcastHashJoin=$bhj")
      }
      def bucketedFato() = graft.etl.Star.fatoVendasFrom(spark, sf1Dir,
        spark.table("orders_bkt10"), spark.table("lineitem_bkt10"))
      def shuffledFato() = graft.etl.Star.fatoVendas(spark, sf1Dir)
      fingerprint("bucketed_10x", bucketedFato())
      fingerprint("shuffled_10x", shuffledFato())

      // interleaved a, b, a, b, … so load drift hits both sides alike
      val ab = (1 to reps).map { i =>
        val a = rep(graft.sink.Sink.parquet(bucketedFato(),
          s"$dw1/fato_vendas_bkt"))
        val b = rep(graft.sink.Sink.parquet(shuffledFato(),
          s"$dw1/fato_vendas_shf"))
        println(s"rep $i: bucketed=$a shuffled=$b")
        (a, b)
      }
      times("etl_star_build_bucketed_10x") = ab.map(_._1).min
      times("etl_star_build_shuffled_10x") = ab.map(_._2).min
    } finally {
      // conf restore + table drops live HERE, with the dir cleanup: an
      // exception mid-measure must not leak the -1 broadcast threshold,
      // the bucketed-scan conf, or the bucketed tables
      abtSaved.foreach(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS orders_bkt10")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt10")
      rmTree(sf1Dir); rmTree(dw1); rmTree(wh); rmTree(curOut)
    }

    val qs = times.map { case (k, v) => "\"" + k + "\":" + v.toString }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_remeasure","unit":"sec","reps":$reps,"queries":$qs}""")
    spark.stop()
  }
}
