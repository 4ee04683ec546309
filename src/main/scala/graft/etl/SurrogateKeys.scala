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

  /** Scale-out contiguous id: range-partitioned sort, then add each
    * partition's start offset (prefix sum over per-partition counts).
    * Deterministic for a deterministic sort key.
    */
  def denseDistributed(df: DataFrame, skName: String, orderBy: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(orderBy: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(skName, LongType, nullable = false))
    val rdd = sorted.rdd
    // One pass over partition sizes (cheap count job), prefix-sum on driver:
    // the driver handles O(numPartitions) longs, never row data.
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(1L)(_ + _) // sk starts at 1
    val withId = rdd.mapPartitionsWithIndex { case (i, it) =>
      var k = offsets(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
    }
    df.sparkSession.createDataFrame(withId, schema)
  }
}
