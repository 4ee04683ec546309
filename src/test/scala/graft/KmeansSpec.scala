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
