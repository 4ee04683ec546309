package graft

import java.io.File
import graft.text.TextOps

/** The graft.checkpoint.dir deployment switch: barriers default to local
  * checkpoints (executor-resident blocks — fine at local[N], fatal after
  * executor loss on a dynamic-allocation cluster), and swap to reliable
  * checkpoint() into the configured directory when the conf is set. The
  * result must be identical either way; only the materialization
  * mechanism changes.
  */
class CheckpointSpec extends SparkSpec {

  private def filesUnder(f: File): Seq[File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(filesUnder)
    else Seq(f)

  test("dedupClusters result is identical under reliable checkpointing and the dir is populated") {
    // default path first (local checkpoints), before the conf is set
    val baseline = TextOps.dedupClusters(spark, tiny).collect()
    assert(baseline.nonEmpty)

    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    spark.conf.set(Checkpoint.DirConf, dir.getAbsolutePath)
    try {
      val reliable = TextOps.dedupClusters(spark, tiny).collect()
      assert(reliable === baseline)
      assert(spark.sparkContext.getCheckpointDir.nonEmpty,
        "reliable barrier must pin the SparkContext checkpoint dir")
      assert(filesUnder(dir).nonEmpty,
        s"expected reliable checkpoint files under $dir")
    } finally {
      spark.conf.unset(Checkpoint.DirConf)
    }
  }

  test("denseDistributed surrogate keys are stable under reliable checkpointing") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"$tiny/part.parquet")
    val default = graft.etl.SurrogateKeys
      .dense(df, "sk", Seq(col("p_partkey"))).select("sk", "p_partkey").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toFile
    spark.conf.set(Checkpoint.DirConf, dir.getAbsolutePath)
    try {
      val reliable = graft.etl.SurrogateKeys
        .denseDistributed(df, "sk", Seq(col("p_partkey")))
        .select("sk", "p_partkey").orderBy("sk").collect()
      assert(reliable === default.sortBy(_.getInt(0)))
    } finally {
      spark.conf.unset(Checkpoint.DirConf)
    }
  }
}
