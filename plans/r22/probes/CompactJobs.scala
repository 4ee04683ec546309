package graft
// Probe (r22 verdict #6): what does bm25_update_compact_cold (3.1 s in
// the r21 artifact) actually spend its jobs on? Replicates the Bench
// lifecycle (build index, tombstone victims, compact) with a job
// listener, printing each compact-phase job's wall/taskTime.
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

object CompactJobs {
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
    import org.apache.spark.sql.functions.col
    case class J(var start: Long = 0, var end: Long = 0, var tasks: Int = 0,
      var taskMs: Long = 0, var site: String = "")
    val jobs = TrieMap.empty[Int, J]
    val stageJob = TrieMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J())
        j.start = e.time
        j.site = e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n').take(70)).getOrElse("")
        e.stageIds.foreach(s => stageJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stageJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks += 1
          if (e.taskInfo != null) j.taskMs += e.taskInfo.duration
        }
    })
    val dir = s"/tmp/probe_compact_${System.nanoTime()}"
    graft.text.RetrievalOps.buildBm25Index(spark, sfDir, dir)
    val victims = Tables.documents(spark, sfDir)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text")
      .filter(col("doc_id") % 7 === 3)
    graft.text.RetrievalOps.deleteBm25Docs(spark,
      victims.select("doc_id"), dir, batchId = 0L)
    Checkpoint.releaseAll()
    Thread.sleep(300)
    val j0 = jobs.keys.max
    val w0 = System.nanoTime()
    graft.text.RetrievalOps.compactBm25Index(spark, dir)
    Thread.sleep(400)
    println(f"[compact] wall=${(System.nanoTime() - w0) / 1e9}%.2f s")
    jobs.toSeq.filter(_._1 > j0).sortBy(_._1).foreach { case (id, j) =>
      println(f"[job] $id%4d wall=${(j.end - j.start) / 1000.0}%6.2f s " +
        f"tasks=${j.tasks}%4d taskTime=${j.taskMs / 1000.0}%7.2f s  ${j.site}")
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
    spark.stop()
  }
}
