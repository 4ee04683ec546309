package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-miss classification over an EXISTING routed graph store — the
  * r20 sequel to [[RoutedProbeSweep]]: the 2M residual sat at 0.875
  * flat in probe width (r19) AND flat in adjacency degree R=8→14
  * (r20), so the remaining hypotheses are (a) the truth neighbor's
  * cell is never in the descent's probe set at any width — a
  * routing/quantizer miss; (b) the cell IS probed but the in-cell
  * walk never reaches the neighbor — walk/topology; (c) quantizer
  * skew (a few giant cells the bounded walk cannot cover). This main
  * serves the store once at the scaled knobs, then for every missing
  * truth pair prints which class it falls in, plus the store's
  * cell-population skew.
  *
  * Usage: `tools/run.sh graft.sim.RoutedMissDiag <storeDir> <sfDir>`
  */
object RoutedMissDiag {
  def main(args: Array[String]): Unit = {
    val storeDir = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.sessionShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val truth = EmbeddingOps.annBruteForce(spark, sfDir)
      .select("query_id", "vizinho").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val cents = spark.read.parquet(s"$storeDir/centroids")
    val k = cents.count()
    val st = EmbeddingOps.cgraphSteps(k)
    val (p, b, h) = (EmbeddingOps.CGRAPH_P + st, EmbeddingOps.CGRAPH_B + st,
      EmbeddingOps.CGRAPH_H + st)
    println(s"cells=$k steps=$st knobs=(p=$p,b=$b,h=$h)")

    // cell-population skew of the stored quantizer
    val pops = spark.read.parquet(s"$storeDir/vectors")
      .groupBy("cell").count().select("count").collect().map(_.getLong(0))
      .sorted
    def pct(q: Double) = pops((q * (pops.length - 1)).toInt)
    println(s"cell pops: n=${pops.length} min=${pops.head} " +
      s"p50=${pct(0.5)} p90=${pct(0.9)} p99=${pct(0.99)} max=${pops.last}")

    val served = EmbeddingOps.annGraphRoutedIndexedAt(spark, sfDir,
      storeDir, p, b, h)
      .select("query_id", "vizinho").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = (truth -- served).toSeq.sorted
    println(s"recall@5=${1.0 - missing.size.toDouble / truth.size} " +
      s"missing=${missing.size}/${truth.size}")
    if (missing.isEmpty) { spark.stop(); return }

    // where is each missing neighbor, and did the route visit its cell?
    val missIds = missing.map(_._2).distinct
    val missCells = spark.read.parquet(s"$storeDir/vectors")
      .filter(col("vec_id").isin(missIds: _*))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("cell").intValue()).toMap
    val q = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id", "embedding")
      .filter(col("vec_id") < EmbeddingOps.N_QUERIES)
      .toDF("query_id", "q_emb")
    val qCells = q.crossJoin(broadcast(cents))
      .withColumn("dist",
        graft.functions.GraftFunctions.l2_sq(col("q_emb"), col("centroid")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") === 1)
      .select("query_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("cell").intValue()).toMap
    // the descent's full VISITED cell set per query (not just top-p):
    // a neighbor cell outside even this set can never be probed at any
    // p — the routing-vs-walk discriminator
    val visited = EmbeddingOps.routeVisitedCells(spark, q, cents,
      spark.read.parquet(s"$storeDir/entrycell"),
      spark.read.parquet(s"$storeDir/cedges"), b, h)
      .select("query_id", "cell").collect()
      .map(r => (r.getLong(0), r.getAs[Number]("cell").intValue()))
      .groupBy(_._1).map { case (kk, v) => kk -> v.map(_._2).toSet }
    val probes = EmbeddingOps.routeVisitedCells(spark, q, cents,
      spark.read.parquet(s"$storeDir/entrycell"),
      spark.read.parquet(s"$storeDir/cedges"), b, h)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") <= p)
      .select("query_id", "cell").collect()
      .map(r => (r.getLong(0), r.getAs[Number]("cell").intValue()))
      .groupBy(_._1).map { case (kk, v) => kk -> v.map(_._2).toSet }
    var (own, probedMiss, visitedNotProbed, neverVisited) = (0, 0, 0, 0)
    for ((qid, v) <- missing) {
      val vc = missCells.getOrElse(v, -1)
      val cls =
        if (vc == qCells.getOrElse(qid, -2)) { own += 1; "OWN-CELL walk miss" }
        else if (probes.getOrElse(qid, Set.empty).contains(vc)) {
          probedMiss += 1; "PROBED-cell walk miss"
        } else if (visited.getOrElse(qid, Set.empty).contains(vc)) {
          visitedNotProbed += 1; "visited-NOT-probed (rank beyond p)"
        } else { neverVisited += 1; "cell NEVER visited by descent" }
      println(s"query $qid (cell ${qCells.getOrElse(qid, -2)}) missing " +
        s"neighbor $v (cell $vc): $cls")
    }
    println(s"classes: own=$own probed=$probedMiss " +
      s"visitedNotProbed=$visitedNotProbed neverVisited=$neverVisited")
    spark.stop()
  }
}
