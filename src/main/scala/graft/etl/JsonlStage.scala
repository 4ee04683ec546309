package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL staging for the corpus table — the interchange format LLM
  * training data actually ships in (Common-Crawl-derived dumps, RedPajama,
  * Dolma, FineWeb: gzipped JSON-lines shards with nested metadata).
  *
  * The graft testdata ships `documents` as parquet; this stage round-trips
  * it through real `.jsonl.gz` shards — one JSON object per line, the
  * scalar metadata NESTED under a `meta` struct (the shape those corpora
  * use), gzip per part file — so corpus ingestion can be oracle-gated END
  * TO END over JSONL input: the engine reads the staged shards, the
  * DuckDB oracle reads the original parquet, and the hashes must meet.
  *
  * Exactness and scale notes:
  *  - the schema is WRITTEN alongside the shards and applied on read.
  *    Schema inference over JSON is a FULL EXTRA PASS over the data (and
  *    samples nondeterministically under `samplingRatio`) — at 100 TB the
  *    reader must never infer;
  *  - JSON string escaping is lossless (unlike CSV's null-token clash,
  *    [[CsvStage.assertNoNullToken]]) — embedded newlines, quotes, and
  *    unicode round-trip exactly, so no stage-time content refusal is
  *    needed; `documents` carries no floating-point column, so there is
  *    no shortest-round-trip concern either;
  *  - compression is gzip PER PART FILE: a single .gz is unsplittable,
  *    but a sharded layout keeps file-level parallelism — exactly how
  *    real corpora ship (thousands of ~100 MB .jsonl.gz shards). The
  *    stage writes [[NShards]] doc_id-hashed shards to pin that layout
  *    even at test scale; a production drop would target shard size
  *    instead (or zstd for splittable-ish larger shards).
  */
object JsonlStage {

  /** Shards written by [[stage]] — >1 so the staged layout (and the read
    * parallelism question it carries) is real even at tiny scale factors.
    */
  private[graft] val NShards = 8

  /** The nested on-wire schema: scalar doc fields at the top level, the
    * provenance metadata under `meta` — the shape the readers flatten.
    */
  private[graft] val WireDdl =
    "doc_id BIGINT, text STRING, meta STRUCT<lang: STRING, source: STRING, n_chars: BIGINT>"

  /** Stage `srcDir`'s documents as gzipped JSONL shards under a
    * content-fingerprinted temp dir (same idempotence device as
    * [[CsvStage.stage]]: re-staging is skipped while the source parquet
    * files and the wire format are unchanged).
    */
  def stage(s: SparkSession, srcDir: String): String = {
    val (dir, marker) = StageCache.resolve(srcDir,
      WireDdl + s"|shards=$NShards", "graft_jsonl_stage")
    if (!marker.exists()) {
      graft.Tables.documents(s, srcDir)
        .selectExpr("doc_id", "text",
          "named_struct('lang', lang, 'source', source, 'n_chars', n_chars) AS meta")
        .repartition(NShards, col("doc_id"))
        .write.mode("overwrite").option("compression", "gzip")
        .json(s"$dir/documents.jsonl")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/documents.schema"),
        WireDdl.getBytes("UTF-8")): Unit
      marker.createNewFile(): Unit
    }
    dir
  }

  /** The wire→table projection — ONE spelling shared by the batch read
    * and the streamed twin, so flatten semantics cannot drift.
    */
  private[graft] def flatten(df: DataFrame): DataFrame =
    df.selectExpr("doc_id", "text", "meta.lang AS lang",
      "meta.source AS source", "meta.n_chars AS n_chars")

  /** The staged schema sidecar, as written by [[stage]]. */
  private[graft] def stagedDdl(dir: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/documents.schema")), "UTF-8")

  /** Schema-directed read of the staged shards, flattened back to the
    * `documents` column set. No inference pass, no option defaults left
    * to chance.
    */
  def readJsonl(s: SparkSession, dir: String): DataFrame =
    flatten(s.read.schema(stagedDdl(dir)).json(s"$dir/documents.jsonl"))

  // ------------------------------------------------------ dirty ingest

  /** Malformed lines [[stageDirty]] injects — the audit's expected reject
    * count. Each is malformed in exactly one way a real crawl dump is.
    */
  private[graft] val NCorrupt = 6

  /** Stage the documents, then append [[NCorrupt]] deterministic corrupt
    * lines as an extra (uncompressed) shard: real JSONL dumps carry
    * truncated objects, type drift, and stray non-JSON lines. Every
    * injected line must be REJECTED by the schema-directed PERMISSIVE
    * read — a line that merely null-fills would add a phantom row and
    * break the survivors hash, so the set below sticks to record-level
    * malformations (not-JSON, truncation, top-level type mismatches),
    * which Spark's JSON parser treats as corrupt records.
    */
  def stageDirty(s: SparkSession, srcDir: String): String = {
    val clean = stage(s, srcDir)
    val dir = clean + "_dirty"
    val marker = new java.io.File(s"$dir/_STAGED")
    if (!marker.exists()) {
      StageCache.copyTree(clean, dir)
      val corrupt = Seq(
        // a stray non-JSON line (a crawl artifact, a log line)
        "this is not json",
        // a truncated object (a killed writer mid-shard)
        """{"doc_id": 9000000001, "text": "trunca""",
        // a JSON value that is not an object
        "[1, 2, 3]",
        // type drift: string where the schema says BIGINT
        """{"doc_id": "not-a-number", "text": "x", "meta": {"lang": "pt", "source": "web", "n_chars": 1}}""",
        // type drift in the nested struct: scalar where struct expected
        """{"doc_id": 9000000002, "text": "x", "meta": "not-a-struct"}""",
        // BIGINT overflow (an unsigned-64 id from another system)
        """{"doc_id": 99999999999999999999999999, "text": "x", "meta": {"lang": "pt", "source": "web", "n_chars": 1}}""")
      require(corrupt.size == NCorrupt)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "documents.jsonl", "zzz-corrupt.json"),
        corrupt.mkString("\n").getBytes("UTF-8")): Unit
      marker.createNewFile(): Unit
    }
    dir
  }

  /** PERMISSIVE read of a (possibly corrupted) staging: the staged schema
    * plus a `_corrupt` capture column. NOT flattened — the caller decides
    * what to do with rejects before projecting.
    */
  def readJsonlDirty(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType.fromDDL(new String(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$dir/documents.schema")), "UTF-8"))
      .add("_corrupt", StringType)
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(s"$dir/documents.jsonl")
  }

  /** The clean-ingest gate: staged JSONL → flat documents, ordered. The
    * oracle reads the original parquet — a hash match proves the nested
    * gzipped JSONL round trip is lossless end to end.
    */
  def ingestQuery(s: SparkSession, d: String): DataFrame =
    readJsonl(s, stage(s, d)).orderBy("doc_id")

  /** The dirty-ingest gate: survivors of the PERMISSIVE read over the
    * corrupted staging, flattened and ordered. The barrier is
    * CORRECTNESS, not tuning — same hazard as
    * [[CsvStage.dirtyFatoQuery]]: JSON `_corrupt` is judged against the
    * scan's REQUIRED columns only, so a downstream projection that drops
    * `meta` would let the nested-type-drift line through as a clean row.
    * Materializing the full-width parse forces every column through the
    * parser BEFORE Catalyst prunes.
    */
  def dirtyIngestQuery(s: SparkSession, d: String): DataFrame =
    flatten(graft.Checkpoint.barrier(
        readJsonlDirty(s, stageDirty(s, d))
          .filter(col("_corrupt").isNull).drop("_corrupt")))
      .orderBy("doc_id")

  /** The reject-audit gate: corrupt vs surviving counts from one
    * PERMISSIVE read (cached — Spark disallows a raw-JSON query whose
    * only referenced column is the corrupt-record capture; a 100 TB
    * ingest routes rejects to `badRecordsPath` instead of auditing
    * inline).
    */
  def dirtyAuditQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = readJsonlDirty(s, stageDirty(s, d)).cache()
    try {
      val corrupt = raw.filter(col("_corrupt").isNotNull).count()
      val good = raw.filter(col("_corrupt").isNull).count()
      Seq(("documents", corrupt, good))
        .toDF("tabela", "corrotas", "sobreviventes")
    } finally raw.unpersist(): Unit
  }
}
