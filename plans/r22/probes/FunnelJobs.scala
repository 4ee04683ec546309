package graft
// Probe (r22 verdict #6): where does curate_run_funnel's interior go?
// Runs CurateRun.run once and prints every job (duration, task count,
// summed task time) plus the top stages by task time, so the dominant
// re-read / pass is identified by data before anything is changed.
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

object FunnelJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    case class J(var start: Long = 0, var end: Long = 0,
      var tasks: Int = 0, var taskMs: Long = 0, var desc: String = "")
    val jobs = TrieMap.empty[Int, J]
    val stageJob = TrieMap.empty[Int, Int]
    val stageMs = TrieMap.empty[Int, (String, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J())
        j.start = e.time
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        e.stageIds.foreach(s => stageJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageMs(si.stageId) = (si.name.takeWhile(_ != '\n').take(80), 0L)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        stageJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks += 1
          if (e.taskInfo != null) j.taskMs += e.taskInfo.duration
        }
        if (e.taskInfo != null) {
          val (n, ms) = stageMs.getOrElse(e.stageId, ("?", 0L))
          stageMs(e.stageId) = (n, ms + e.taskInfo.duration)
        }
      }
    })
    val out = s"/tmp/probe_funnel_${System.nanoTime()}"
    val w0 = System.nanoTime()
    val funnel = CurateRun.run(spark, sfDir, out)
    Thread.sleep(500)
    println(f"[funnel] total wall=${(System.nanoTime() - w0) / 1e9}%.2f s; " +
      s"stages: ${funnel.mkString(", ")}")
    jobs.toSeq.sortBy(_._1).foreach { case (id, j) =>
      println(f"[job] $id%4d wall=${(j.end - j.start) / 1000.0}%7.2f s " +
        f"tasks=${j.tasks}%5d taskTime=${j.taskMs / 1000.0}%8.1f s ${j.desc}")
    }
    println("[stages by taskTime]")
    stageMs.toSeq.sortBy(-_._2._2).take(20).foreach { case (id, (n, ms)) =>
      println(f"[stage] $id%5d taskTime=${ms / 1000.0}%8.1f s  $n")
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(out))
    spark.stop()
  }
}
