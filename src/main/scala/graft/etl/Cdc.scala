package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic CDC changelog apply — the maintenance primitive the SCD family
  * doesn't cover: a log of (op ∈ I/U/D, seq, key, attrs) rows collapses
  * to current state by "latest seq wins; a latest D erases the key".
  * This is the Debezium/log-compaction contract: upstream OLTP emits a
  * changelog, the lake materializes it.
  *
  * The changelog is synthesized deterministically from `orders` (the
  * testdata carries no real log): every order INSERTs at seq 1; keys
  * ≡0 (mod 10) then UPDATE their status to 'X' at seq 2; keys ≡1
  * (mod 10) DELETE at seq 2 — so the applied state must show 1/10 of
  * keys mutated, 1/10 gone, 8/10 untouched, which the oracle recomputes
  * from the same synthesis.
  *
  * Scale shape: the apply is ONE shuffle on the key (per-key max-seq
  * window over the log, bounded by log depth per key), never a
  * self-join; the streamed twin appends each micro-batch's rows into a
  * keyed store and resolves latest-wins AT READ, so arrivals are O(batch)
  * appends (StoreCommit exactly-once) and tombstones survive in state —
  * resolution, not compaction, guarantees replay-safety; a compaction
  * that kept only live rows would break if a D arrived before its I.
  */
object Cdc {

  /** The synthesized changelog: (op, seq, o_orderkey, o_custkey,
    * o_orderstatus, o_totalprice).
    */
  private[graft] def changelog(s: SparkSession, d: String): DataFrame = {
    val base = graft.Tables.orders(s, d)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val ins = base.selectExpr("'I' AS op", "CAST(1 AS INT) AS seq",
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val upd = base.filter(col("o_orderkey") % 10 === 0)
      .selectExpr("'U' AS op", "CAST(2 AS INT) AS seq",
        "o_orderkey", "o_custkey", "'X' AS o_orderstatus", "o_totalprice")
    val del = base.filter(col("o_orderkey") % 10 === 1)
      .selectExpr("'D' AS op", "CAST(2 AS INT) AS seq",
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    ins.unionByName(upd).unionByName(del)
  }

  /** Latest-seq-wins resolution over any changelog slice — shared by the
    * batch apply and the streamed store's read, so the two forms cannot
    * drift. One per-key window; D rows erase.
    */
  private[graft] def resolve(log: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderkey").orderBy(desc("seq"))
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** One-shot apply: synthesize → resolve. */
  def cdcApply(s: SparkSession, d: String): DataFrame =
    resolve(changelog(s, d))

  /** One streamed micro-batch of changelog ingestion, EXACTLY-ONCE:
    * APPEND the batch's rows onto the committed log (no read-modify-
    * write — resolution happens at read), advance the pointer atomically.
    */
  private[graft] def cdcApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit = {
    val prior = StoreCommit.committed(stateDir)
    if (prior.exists(_._2 >= batchId)) return // replay of a committed batch
    val merged = prior match {
      case Some((dir, _)) => batch.unionByName(s.read.parquet(s"$stateDir/$dir"))
      case None => batch
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/log_b$batchId")
    StoreCommit.commit(stateDir, s"log_b$batchId", batchId)
    StoreCommit.cleanupStale(stateDir, "log_b")
  }

  /** Log COMPACTION — the maintenance the append-only store needs so the
    * log doesn't grow with change volume forever: keep only each key's
    * latest row, INCLUDING delete tombstones (a compaction that dropped
    * D rows would resurrect a key if its I replayed later or arrived
    * late), staged + committed under the SAME batch watermark so a
    * crashed compaction leaves the uncompacted log live and replays
    * still dedup correctly. State goes from O(changes) to O(keys);
    * served resolution is unchanged — latest-wins over a latest-only
    * log is the identity.
    */
  private[graft] def cdcCompact(s: SparkSession, stateDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val (dir, last) = StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"cdc state not initialized: $stateDir"))
    val w = Window.partitionBy("o_orderkey").orderBy(desc("seq"))
    s.read.parquet(s"$stateDir/$dir")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .write.mode("overwrite").parquet(s"$stateDir/log_compact$last")
    StoreCommit.commit(stateDir, s"log_compact$last", last)
    StoreCommit.cleanupStale(stateDir, "log_")
  }

  /** Read-time resolution of the maintained log. */
  private[graft] def cdcReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"cdc state not initialized: $stateDir"))
    resolve(s.read.parquet(s"$stateDir/$dir"))
  }

  private def cdcOracle: String =
    """WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
log AS (
  SELECT 'I' AS op, 1 AS seq, o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM base
  UNION ALL
  SELECT 'U', 2, o_orderkey, o_custkey, 'X', o_totalprice FROM base WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT 'D', 2, o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM base WHERE o_orderkey % 10 = 1),
resolved AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
  FROM log)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM resolved WHERE rn = 1 AND op <> 'D'
ORDER BY o_orderkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // changelog apply: latest-seq-wins with delete tombstones
    "q_cdc_apply" -> (cdcApply _),
    // the log maintained under arrivals (append-only, resolve at read)
    "q_cdc_apply_stream" -> (graft.streaming.Streams.cdcStreamed _))

  val oracle: Map[String, String] = Map(
    "q_cdc_apply" -> cdcOracle,
    "q_cdc_apply_stream" -> cdcOracle)
}
