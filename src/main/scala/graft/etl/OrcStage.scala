package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC interop as a GATED source, not just a plan-pinned spec: the
  * documents table staged as multi-shard ORC under the
  * content-fingerprinted cache, read back through Spark's native ORC
  * source, and hash-compared against the parquet original by the
  * DuckDB oracle — a meet proves the columnar round trip (integer
  * widths, nullability, unicode text) lossless. ORC is the other
  * columnar lakehouse format a user migrating onto this engine may
  * already hold data in; predicate pushdown and column pruning on the
  * ORC scan are plan-pinned separately in OrcSpec.
  */
object OrcStage {

  /** >1 shard so the staged layout (and its read parallelism) is real
    * even at tiny scale factors — same posture as JsonlStage.
    */
  private[graft] val NShards = 4

  def stage(s: SparkSession, srcDir: String): String = {
    // fingerprint-keyed location from StageCache, but published through
    // the ATOMIC temp-build + rename device (StorePublish) instead of
    // the build-then-marker pattern: a concurrent JVM can never read a
    // half-staged ORC tree (the streamed twin would ingest partial
    // shards) and two JVMs never write the same staging dir
    val (dir, _) = StageCache.resolve(srcDir,
      s"orc|shards=$NShards", "graft_orc_stage")
    graft.StorePublish.publishOnce(dir) { tmp =>
      graft.Tables.documents(s, srcDir)
        .repartition(NShards, col("doc_id"))
        .write.mode("overwrite").orc(s"$tmp/documents.orc")
    }
  }

  def ingestQuery(s: SparkSession, d: String): DataFrame =
    s.read.orc(s"${stage(s, d)}/documents.orc")
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text", "lang",
        "source", "CAST(n_chars AS BIGINT) AS n_chars")
      .orderBy("doc_id")
}
