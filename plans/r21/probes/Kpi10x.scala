package graft
import org.apache.spark.sql.SparkSession
// Replicates Bench phase 6's stage + build + kpi_suite_sf1 row to validate
// and time the concurrent KPI suite. args: none.
object Kpi10x {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        Tuning.sessionShufflePartitions(sfDir, 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rm(p: String): Unit = { def r(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(r); f.delete(): Unit }; r(new java.io.File(p)) }
    val sf1 = s"/tmp/probe_sf1_${System.nanoTime()}"
    val dw1 = s"/tmp/probe_dw1_${System.nanoTime()}"
    try {
      StarBench.stage10x(spark, sfDir, sf1)
      StarBench.starBuildTo(spark, sf1, dw1)
      def seqRun(): Double = {
        val t0 = System.nanoTime()
        StarBench.kpiSuite(spark, dw1).foreach { case (_, q) => q().collect(): Unit }
        (System.nanoTime() - t0) / 1e9
      }
      def concRun(): Double = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        val t0 = System.nanoTime()
        val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(StarBench.kpiSuite(spark, dw1).map {
          case (_, q) => Future(q().collect(): Unit) }), Duration.Inf): Unit
        finally pool.shutdown()
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 2).foreach { r =>
        println(f"[kpi10x] rep$r seq=${seqRun()}%.2f s conc=${concRun()}%.2f s")
      }
    } finally { rm(sf1); rm(dw1) }
    spark.stop()
  }
}
