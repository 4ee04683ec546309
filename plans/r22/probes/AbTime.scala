package graft.sim
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
// args: <sfDir> <q1,q2,...> — noop-sink timing (full compute, no pruning)
// with job/stage/task counts and summed task time (load-invariant-ish).
object AbTime {
  class L extends SparkListener {
    val jobs = new AtomicInteger(0); val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0); val taskMs = new AtomicLong(0)
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration) }
    def snap: (Int, Int, Int, Long) = (jobs.get, stages.get, tasks.get, taskMs.get)
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.sessionShufflePartitions(sfDir, 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val l = new L; spark.sparkContext.addSparkListener(l)
    def m(name: String)(f: => Unit): Unit = {
      val (j0, s0, t0, ms0) = l.snap; val w0 = System.nanoTime()
      f
      Thread.sleep(300)
      val (j1, s1, t1, ms1) = l.snap
      println(f"[ab] $name%-34s wall=${(System.nanoTime() - w0) / 1e9}%7.2f s jobs=${j1 - j0}%4d stages=${s1 - s0}%4d tasks=${t1 - t0}%6d taskTime=${(ms1 - ms0) / 1000.0}%8.1f s")
    }
    def noop(n: String): Unit =
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    m("warmup") { noop("q_agg_stats") }
    names.foreach { n => (1 to 2).foreach { r => m(s"$n rep$r") { noop(n) } } }
    spark.stop()
  }
}
