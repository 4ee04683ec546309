package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — the capability extension over the
  * reference's batch-only truncate-and-reload (SURVEY.md §2.7): the same
  * logical transforms, applied incrementally.
  *
  * Each job is written against a plain DataFrame so the identical code
  * path serves batch (for the oracle gate) and streaming (readStream /
  * MemoryStream in the specs): watermarked windowed rollups, stream⨝static
  * fact append, and stateful gap sessionization.
  */
object Streams {

  /** Hourly windowed rollup of events — streaming twin of
    * RelationalOps.eventsHourly. On a stream, the 1-hour tumbling window +
    * 10-minute watermark bound state; late rows beyond the watermark drop.
    */
  def hourlyRollup(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "10 minutes")
              else events
    src.groupBy(window(col("ts"), "1 hour").as("janela"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("soma_valor"))
      .select(col("janela.start").as("hora"), col("event_type"), col("n"),
        col("soma_valor"))
  }

  /** Incremental fact append: a stream of order lines joined against the
    * (static, broadcast) dimension tables — replaces the reference's full
    * truncate-reload (S5) with append-only ingestion. Stream⨝static joins
    * need no watermark and never shuffle the static side.
    */
  def factAppend(lines: DataFrame, dimProduto: DataFrame): DataFrame =
    lines
      .join(broadcast(dimProduto.select("sk_produto", "id_produto_original")),
        lines("product_id") === col("id_produto_original"), "left")
      .select(col("line_id"), col("sk_produto"),
        col("qty").cast("decimal(9,0)").as("qtd_vendida"),
        (col("price").cast("decimal(18,2)") * col("qty").cast("decimal(9,0)"))
          .cast("decimal(18,2)").as("valor_total"))

  /** Streaming exact dedup: drop replayed events by id within the
    * watermark horizon — the incremental form of the batch exact-dedup
    * operator (at-least-once sources → exactly-once facts). State is
    * bounded by the watermark: ids older than the horizon are evicted.
    */
  def dedupStream(events: DataFrame): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", "1 hour")
              else events
    src.dropDuplicates("event_id", "ts")
  }

  /** Stream-stream interval join: attribute each purchase to clicks by the
    * same user within the preceding hour. Both sides are watermarked so
    * Spark can bound the join state — click state is kept only as long as
    * a matching purchase could still arrive (the event-time constraint +
    * watermark give the eviction rule). The batch/as-of twin is
    * RelationalOps.asofAttribution.
    */
  def attributionStream(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val p = purchases.withWatermark("ts", "10 minutes").alias("p")
    val c = clicks.withWatermark("ts", "70 minutes").alias("c")
    p.join(c, expr(
      """p.user_id = c.user_id AND
        |c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin))
      .select(col("p.event_id").as("purchase_id"),
        col("p.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.ts").as("ts_compra"), col("c.ts").as("ts_click"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Int,
                                  inicio: java.sql.Timestamp,
                                  fim: java.sql.Timestamp, valor: Double)
  /** Internal per-key session state (public: Catalyst's generated code
    * must be able to construct it).
    */
  final case class SessionState(n: Int, start: Long, last: Long, total: Double)

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): a session SUMMARY is emitted when a later
    * event for the same user arrives more than `gapMinutes` after the
    * previous one, OR when the event-time watermark passes the session's
    * idle deadline (last event + gap) — so a user's FINAL session flushes
    * without needing a successor event. State per key is O(1) — counts and
    * bounds, not buffered events — and every key carries an event-time
    * timer, so state for idle users is emitted and removed instead of
    * accreting forever.
    *
    * Remaining scope limit (the batch twin, RelationalOps.sessionizeBatch,
    * has none): events are time-ordered only within a micro-batch — a
    * cross-batch late event (within the watermark) is appended to the
    * current session rather than its true one.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    val streaming = events.isStreaming
    // EventTimeTimeout needs a watermark; batch runs have neither (state
    // and timers don't exist there — each group is processed exactly once)
    val src = if (streaming) events.withWatermark("ts", watermarkDelay)
              else events
    val timeout = if (streaming) GroupStateTimeout.EventTimeTimeout
                  else GroupStateTimeout.NoTimeout
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, timeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (streaming && state.hasTimedOut) {
            // idle flush: the watermark passed last+gap, so no event that
            // could extend this session can still arrive — it is final.
            val st = state.get
            state.remove()
            Iterator.single(SessionSummary(uid, st.n,
              new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.last),
              st.total))
          } else {
            // Sort this micro-batch's events; close sessions on gaps.
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0, -1L, -1L, 0.0))
            val out = Seq.newBuilder[SessionSummary]
            evs.foreach { e =>
              val t = e.ts.getTime
              if (st.n > 0 && t - st.last > gapMs) {
                out += SessionSummary(uid, st.n, new java.sql.Timestamp(st.start),
                  new java.sql.Timestamp(st.last), st.total)
                st = SessionState(0, -1L, -1L, 0.0)
              }
              st = if (st.n == 0) SessionState(1, t, t, e.value)
                   else SessionState(st.n + 1, st.start, t, st.total + e.value)
            }
            state.update(st)
            if (streaming)
              // fire when the watermark passes the idle deadline (the
              // max() keeps the timer legal if the deadline already lies
              // behind the watermark — it then fires on the next batch)
              state.setTimeoutTimestamp(math.max(st.last + gapMs,
                state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
