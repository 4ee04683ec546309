package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The 10³-batch maintenance-predicate probe (r17 "What's wrong" #1):
  * the xcell/graph maintenance paths select their rewrite scope with
  * [[EmbeddingOps.partitionPairPredicate]] — ONE membership test over a
  * derived `cell#batch` key instead of the r17 OR-chain that grew an
  * expression-tree node per pair. This main evidences the two claims
  * that fix rests on, on a store with 10³+ real (cell, batch)
  * partitions:
  *
  *   1. FLAT PLANNING — analyze→optimize→physical-plan wall time is
  *      ~constant as the selected pair count grows 8 → 1024 (the
  *      optimizer folds the big literal list into one InSet node;
  *      an OR-chain re-planned per node and fell over near 10⁵).
  *   2. LIVE PRUNING — the scan's partitions-read metric equals the
  *      pair count exactly: a derived-key predicate over partition
  *      columns still prunes statically (deterministic expression on
  *      partition attrs), so maintenance I/O stays O(touched), never
  *      O(store).
  *
  * Usage: runMain graft.sim.PartitionProbe [cells] [batches] [workDir]
  * Prints one JSON line: planning ms + partitions read per pair count.
  */
object PartitionProbe {
  def main(args: Array[String]): Unit = {
    val cells = if (args.length > 0) args(0).toInt else 32
    val batches = if (args.length > 1) args(1).toInt else 32
    val work =
      if (args.length > 2) args(2) else "/tmp/graft_partition_probe"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off so the executed plan IS the FileSourceScanExec whose
      // partitions-read metric the probe asserts on (the maintenance
      // paths run with AQE; pruning happens in either mode — this is
      // observability plumbing, not a behavior switch)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // a store shaped like the graph index's vectors table: (cell, batch)
    // dynamic partitions, a few rows each — 10³+ leaf directories
    spark.range(cells.toLong * batches * 4)
      .select(
        col("id").as("vec_id"),
        (col("id") % cells).cast("int").as("cell"),
        ((col("id") / cells) % batches).cast("long").as("batch"))
      .write.mode("overwrite").partitionBy("cell", "batch")
      .parquet(s"$work/vectors")

    val vecs = spark.read.parquet(s"$work/vectors")
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    // clamp to the grid size, then dedup: on small grids the clamped
    // values collide and duplicate keys would silently overwrite each
    // other in the output map with pair counts diverging from the label
    for (n <- Seq(8, 64, 512, 1024).map(math.min(_, cells * batches))
           .distinct) {
      // pairs enumerate the (cell, batch) grid bijectively
      val pairs = (0 until n).map(i =>
        (i % cells, (i / cells).toLong % batches)).distinct
      val t0 = System.nanoTime()
      val df = vecs.filter(EmbeddingOps.partitionPairPredicate(pairs))
      val plan = df.queryExecution.executedPlan // full analyze→physical
      out(s"plan_ms_$n") = (System.nanoTime() - t0) / 1e6
      // execute THIS queryExecution (an action like count() would plan
      // a fresh one and leave the captured scan's metrics untouched)
      df.queryExecution.toRdd.count()
      val read = plan.collectLeaves().collectFirst {
        case f: FileSourceScanExec =>
          f.metrics.get("numPartitions").orElse(f.metrics.get("numFiles"))
            .map(_.value.toDouble)
      }.flatten.getOrElse(-1.0)
      out(s"partitions_read_$n") = read
      out(s"pairs_$n") = pairs.size.toDouble
    }
    val js = out.map { case (k, v) => s""""$k":${f"$v%.1f"}""" }.mkString(",")
    println(s"""{"metric":"partition_predicate_probe","cells":$cells,"batches":$batches,$js}""")
    spark.stop()
  }
}
