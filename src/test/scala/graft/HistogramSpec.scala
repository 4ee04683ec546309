package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Equi-width histogram sketch: mergeability (cells from corpus splits
  * add to the whole-corpus cells) and the quantile-estimation error
  * bound (≤ one bin width) — the accuracy half the hash gate can't see.
  */
class HistogramSpec extends SparkSpec {

  test("histogram cells merge additively across corpus splits") {
    val whole = RelationalOps.histogramCells(spark, tiny).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("c")).toMap
    // split the fact by parity and histogram each half against the SAME
    // bounds (min/max must come from the union for cells to align — the
    // production contract: bounds are part of the sketch's config)
    val li = Tables.lineitem(spark, tiny).select(col("l_extendedprice").as("x"))
    val mm = li.agg(min("x").as("mn"), max("x").as("mx"))
    def cells(part: org.apache.spark.sql.DataFrame) =
      part.crossJoin(broadcast(mm))
        .selectExpr(
          "least(CAST(floor((x - mn) * CAST(64 AS DOUBLE) / (mx - mn)) AS INT), 63) AS bin")
        .groupBy("bin").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("c")).toMap
    val a = cells(li.withColumn("rid", monotonically_increasing_id())
      .filter(col("rid") % 2 === 0).drop("rid"))
    val b = cells(li.withColumn("rid", monotonically_increasing_id())
      .filter(col("rid") % 2 === 1).drop("rid"))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("cumulative-walk quantile estimate lands within one bin width of exact") {
    val cells = RelationalOps.histogramCells(spark, tiny).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("c")).sortBy(_._1)
    val Array(mn, mx) = Tables.lineitem(spark, tiny)
      .agg(min("l_extendedprice"), max("l_extendedprice")).collect()
      .head.toSeq.map(_.asInstanceOf[Double]).toArray
    val width = (mx - mn) / 64.0
    val n = cells.map(_._2).sum
    def estimate(q: Double): Double = {
      val target = q * n
      var cum = 0L
      for ((bin, c) <- cells) {
        cum += c
        if (cum >= target) return mn + (bin + 1) * width
      }
      mx
    }
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val exact = Tables.lineitem(spark, tiny)
        .selectExpr(s"percentile(l_extendedprice, $q) AS p").collect()
        .head.getAs[Double]("p")
      val est = estimate(q)
      assert(math.abs(est - exact) <= width + 1e-9,
        s"q=$q est=$est exact=$exact width=$width")
    }
  }
}
