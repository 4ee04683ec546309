package graft

import org.apache.spark.sql.DataFrame

/** Materialization barrier with a deployment switch.
  *
  * Default: eager `localCheckpoint` — blocks live on executors, no
  * fault-tolerant write, the right trade at local[N] and on
  * static-allocation clusters (this is what every barrier in the engine
  * used unconditionally before the switch existed).
  *
  * With `graft.checkpoint.dir` set in the Spark conf: eager RELIABLE
  * `checkpoint()` to that directory. Local checkpoint blocks are
  * unrecoverable after executor loss — on a dynamic-allocation cluster or
  * under spot-instance kills, a lost executor aborts every job whose plan
  * hangs off the barrier. Reliable checkpoints pay a write+read through
  * the fault-tolerant filesystem and survive any executor churn, which is
  * the correct trade for long multi-tenant runs at 100 TB.
  *
  * The first reliable barrier of a session pins the SparkContext
  * checkpoint directory (Spark supports only one per context); later
  * changes to the conf value do not re-point it.
  *
  * Cleanup: Spark deletes reliable checkpoint data only when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a STARTUP
  * conf read by the ContextCleaner — it cannot be flipped mid-session,
  * so this object cannot set it for you). Long-running deployments that
  * enable `graft.checkpoint.dir` should set that cleaner conf at submit
  * time, or point the directory at storage with a TTL/lifecycle policy;
  * otherwise every barrier leaves its materialized copy behind for the
  * life of the application.
  */
object Checkpoint {
  val DirConf = "graft.checkpoint.dir"

  def barrier(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Chained form: `df.transform(...).barrier()`. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(): DataFrame = Checkpoint.barrier(df)
  }
}
