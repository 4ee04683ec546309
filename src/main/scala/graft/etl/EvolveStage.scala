package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema evolution across parquet shard generations — the 100 TB fact
  * of life the single-schema gates don't touch: a long-lived corpus is
  * written by MANY producer versions, and early shards simply lack the
  * columns later ones added. The reader must present one unified schema
  * with the missing columns null — without corrupting, dropping, or
  * re-writing the old shards.
  *
  * Two read paths exist and the difference is the scale story:
  *  - `mergeSchema=true` asks Spark to UNION the schemas by reading every
  *    part file's footer — a whole-corpus metadata sweep before the first
  *    row. Fine for discovery/debugging; wrong as the steady-state read
  *    at 10⁶ files.
  *  - an EXPLICIT unified schema (from the table's catalog/contract)
  *    skips the sweep entirely; parquet's by-name column resolution
  *    null-fills the absent columns per row group. This is the deployed
  *    path and the one the oracle gates; a spec pins that both paths
  *    agree so the contract schema can be trusted.
  */
object EvolveStage {

  /** The unified (latest-generation) schema — the reader's contract. */
  private[graft] val UnifiedDdl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** Stage the documents as two parquet generations: even doc_ids as a
    * gen1 writer (before `source`/`n_chars` existed), odd doc_ids as the
    * full gen2 schema. Dir names carry no `=` so partition discovery
    * cannot reinterpret them as partition columns. Content-fingerprinted
    * like the other stages.
    */
  def stage(s: SparkSession, srcDir: String): String = {
    val (dir, marker) = StageCache.resolve(srcDir, UnifiedDdl,
      "graft_evolve_stage")
    if (!marker.exists()) {
      val docs = graft.Tables.documents(s, srcDir)
        .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text", "lang",
          "source", "CAST(n_chars AS BIGINT) AS n_chars")
      docs.filter("doc_id % 2 = 0").select("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$dir/gen1")
      docs.filter("doc_id % 2 <> 0")
        .write.mode("overwrite").parquet(s"$dir/gen2")
      marker.createNewFile(): Unit
    }
    dir
  }

  /** The deployed read: contract schema applied over BOTH generations in
    * one scan — no footer sweep, absent columns null-filled by parquet's
    * by-name resolution.
    */
  def readEvolved(s: SparkSession, dir: String): DataFrame =
    s.read.schema(UnifiedDdl).parquet(s"$dir/gen1", s"$dir/gen2")

  /** The discovery read — `mergeSchema=true`, the footer-sweep path.
    * Kept for the spec that pins both paths agree; not the gated path.
    */
  private[graft] def readMerged(s: SparkSession, dir: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(s"$dir/gen1", s"$dir/gen2")
      .selectExpr("doc_id", "text", "lang", "source", "n_chars")

  /** The gate: old-generation rows surface with their never-written
    * columns null, new-generation rows complete — against an oracle that
    * re-derives the generation split from the clean parquet.
    */
  def evolveQuery(s: SparkSession, d: String): DataFrame =
    readEvolved(s, stage(s, d)).orderBy("doc_id")
}
