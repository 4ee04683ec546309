package graft

import graft.sim.EmbeddingOps

/** The k-means coarse quantizer (fixed Lloyd rounds, exact-integer
  * centroid means): deterministic, total, and usable as an IVF cell
  * structure. Bit-exactness vs DuckDB is gated by q_kmeans_cells /
  * q_kmeans_centroids / q_ann_ivf_kmeans; this spec pins the structural
  * invariants.
  */
class KmeansSpec extends SparkSpec {

  test("every vector is assigned exactly once, to a real trained cell") {
    val cells = EmbeddingOps.kmeansCells(spark, tiny).collect()
    val corpus = spark.read.parquet(s"$tiny/embeddings.parquet").count()
    assert(cells.length === corpus)
    assert(cells.map(_.getLong(0)).distinct.length === corpus)
    val used = cells.map(_.getInt(1)).distinct
    assert(used.forall(c => c >= 0 && c < 8))
    assert(used.length >= 2, "quantizer must actually partition the space")
    assert(cells.forall(_.getDouble(2) >= 0.0), "L2 squared is non-negative")
  }

  test("trained centroids: one 64-dim vector per surviving cell") {
    val flat = EmbeddingOps.kmeansCentroidsFlat(spark, tiny).collect()
    val perCell = flat.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ === 64))
    assert(perCell.size >= 2 && perCell.size <= 8)
  }

  test("kmeans training is deterministic across invocations") {
    val a = EmbeddingOps.kmeansCells(spark, tiny).collect()
    val b = EmbeddingOps.kmeansCells(spark, tiny).collect()
    assert(a === b)
  }

  test("diversity sample: per-cell quota of nearest prototypes, via the bounded aggregator") {
    import org.apache.spark.sql.functions._
    val df = EmbeddingOps.sampleDiverse(spark, tiny)
    val rows = df.collect()
    val byCell = rows.groupBy(_.getInt(0))
    // quota respected, positions contiguous from 1, dists ascending
    byCell.foreach { case (cell, rs) =>
      assert(rs.length <= 25, s"cell $cell over quota")
      val pos = rs.map(_.getInt(3)).sorted
      assert(pos.toSeq === (1 to rs.length), s"cell $cell positions")
      val dists = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b }, s"cell $cell order")
    }
    // every non-empty assignment cell keeps representation — coverage is
    // the whole point of balancing on learned structure
    val asgCells = EmbeddingOps.kmeansCells(spark, tiny)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(byCell.keySet === asgCells, "a semantic region lost all representation")
    // the selection must be exactly the quota nearest per cell
    val truth = EmbeddingOps.kmeansCells(spark, tiny).collect()
      .groupBy(_.getInt(1)).map { case (c, rs) =>
        c -> rs.sortBy(r => (r.getDouble(2), r.getLong(0))).take(25)
          .map(_.getLong(0)).toSet
      }
    byCell.foreach { case (c, rs) =>
      assert(rs.map(_.getLong(1)).toSet === truth(c), s"cell $c selection")
    }
    // scale posture: selection is the O(Q)-state aggregator, never a
    // per-cell sort window
    val hasWindow = allNodes(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(!hasWindow, "diversity quota planned a sort window")
  }

  test("index-served diversity sample is bit-identical to the self-contained form") {
    assert(EmbeddingOps.sampleDiverseIndexedAuto(spark, tiny).collect()
      === EmbeddingOps.sampleDiverse(spark, tiny).collect())
  }

  test("the kmeans-quantized probe ranks within the query's own cell") {
    val rows = EmbeddingOps.annIvfKmeans(spark, tiny).collect()
    assert(rows.length === 40) // 8 queries x top-5
    assert(rows.forall { r =>
      val sim = r.getDouble(r.fieldIndex("sim")); sim >= -1.0 && sim <= 1.0
    })
    val cellOf = EmbeddingOps.kmeansCells(spark, tiny).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r =>
      r.getInt(r.fieldIndex("cell")) === cellOf(r.getLong(r.fieldIndex("query_id")))))
  }
}
