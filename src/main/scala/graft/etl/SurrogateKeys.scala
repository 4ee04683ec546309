package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.Row

/** Surrogate-key assignment (replaces the reference's Postgres SERIAL,
  * e.g. create_dw_tables.sql:15 `sk_produto SERIAL`).
  *
  * Two strategies:
  *
  *  - [[dense]]: `row_number() OVER (ORDER BY businessKey)` — contiguous
  *    from 1, deterministic, matches SERIAL-by-insert-order semantics when
  *    the insert order is the business-key order. Requires a single-
  *    partition window, so use it only for dimension-sized inputs
  *    (all reference dims are ≤ 20k rows).
  *
  *  - [[denseDistributed]]: sort → per-partition count → prefix-sum offsets
  *    broadcast back. Same contiguous, deterministic numbering but computed
  *    with a range-partitioned sort + one tiny driver-side prefix sum over
  *    partition COUNTS (not rows) — this is the 100 TB path: no single
  *    reducer ever sees the whole table.
  *
  * Both produce identical output (asserted in SurrogateKeySpec), so the
  * DuckDB oracle (`row_number() over (order by k)`) validates either.
  */
object SurrogateKeys {

  /** Single-partition window row_number. Dimension-sized inputs only. */
  def dense(df: DataFrame, skName: String, orderBy: Seq[Column]): DataFrame =
    df.withColumn(skName, row_number().over(Window.orderBy(orderBy: _*)))

  /** Size-routed SK assignment — what the production dim builders call:
    * [[dense]] for dimension-sized inputs, [[denseDistributed]] once the
    * optimizer's sizeInBytes ESTIMATE (no job runs to decide) crosses
    * `graft.sk.windowMaxBytes` (default 64 MiB — far below what a single
    * window reducer can absorb, far above every reference dim). Both
    * routes produce identical values (EngineSpec), so the DuckDB oracle's
    * row_number() validates either; the sk column is INT in both routes,
    * matching the reference's SERIAL (create_dw_tables.sql:15) — a dim
    * beyond 2³¹ contiguous keys would outgrow the reference's own schema.
    */
  def auto(df: DataFrame, skName: String, orderBy: Seq[Column]): DataFrame = {
    val maxBytes = df.sparkSession.conf
      .getOption("graft.sk.windowMaxBytes").map(_.toLong).getOrElse(64L << 20)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBytes) dense(df, skName, orderBy)
    else denseDistributed(df, skName, orderBy)
      // guard the Long→INT narrowing: with ANSI off a >2³¹-row dim would
      // silently wrap to negative/duplicate keys — fail loudly instead
      // (the distributed route exists precisely for huge dims).
      .withColumn(skName,
        when(col(skName) <= lit(Int.MaxValue.toLong), col(skName).cast("int"))
          .otherwise(raise_error(concat(
            lit(s"$skName exceeds INT range (reference schema is SERIAL): "),
            col(skName).cast("string")))))
  }

  /** Deterministic keyed dedup: keep exactly one row per key — the one
    * that sorts first over the remaining columns. Replaces bare
    * dropDuplicates (which keeps an ARBITRARY, partition-dependent row)
    * wherever the engine promises reproducible output. Matches pandas
    * keep-first whenever keys are unique (asserted by the parity tests);
    * with true duplicates it is still deterministic, unlike both.
    */
  def dedupKeepSmallest(df: DataFrame, key: String): DataFrame = {
    val rest = df.columns.filter(_ != key).map(org.apache.spark.sql.functions.col)
    val w = Window.partitionBy(key).orderBy(rest: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(org.apache.spark.sql.functions.col("__rn") === 1)
      .drop("__rn")
  }

  /** Scale-out contiguous id: range-partitioned sort, then zipWithIndex
    * (a partition-count job + a prefix-sum-offset map — the driver only
    * ever handles O(numPartitions) longs, never rows).
    *
    * The sorted RDD is cached first: zipWithIndex internally runs TWO jobs
    * over it, and without pinning the evaluation the second job could
    * recompute the sort over differently-ordered upstream output (task
    * retries, nondeterministic shuffle order), mis-aligning offsets.
    */
  def denseDistributed(df: DataFrame, skName: String, orderBy: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(orderBy: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(skName, LongType, nullable = false))
    val rdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withId = rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L)) // sk starts at 1
    }
    df.sparkSession.createDataFrame(withId, schema)
  }
}
