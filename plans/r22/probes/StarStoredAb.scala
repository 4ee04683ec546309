package graft
// Probe (r22 verdict #4): etl_star_build stored-dims variant, adjudicated
// with an INTERLEAVED A-B-A-B pair at the 10x (sf1-staged) scale point,
// with job/task/GC telemetry per rep — the r21 attempt measured jobs
// 38→12 but saw inconsistent wall on a loaded box and deferred.
// A = shipped starBuildTo (fact re-derives dims in-plan)
// B = stored-dims variant (fact joins the just-written dims read back)
// Also proves the fact bytes identical via exceptAll both ways.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

object StarStoredAb {
  class L extends SparkListener {
    val jobs = new AtomicInteger(0); val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0)
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
    }
    def snap: (Int, Int, Long) = (jobs.get, tasks.get, taskMs.get)
  }
  def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  // B: identical dim build+sink, then the fact joins the STORED dims
  // (read back from the DW, (sk, business key) projections) instead of
  // re-deriving them in-plan — the reference's own SK-map read-back.
  def starBuildToStored(spark: SparkSession, srcDir: String, dwDir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    import graft.etl.Star
    val dims = Seq(
      "dim_produto" -> (() => Star.dimProduto(spark, srcDir)),
      "dim_cliente" -> (() => Star.dimCliente(spark, srcDir)),
      "dim_vendedor" -> (() => Star.dimVendedor(spark, srcDir)),
      "dim_localidade" -> (() => Star.dimLocalidade(spark, srcDir)),
      "dim_tempo" -> (() => Star.dimTempo(spark)))
    Await.result(Future.sequence(dims.map { case (name, build) =>
      Future(graft.sink.Sink.parquet(build(), s"$dwDir/$name"))
    }), Duration.Inf)
    def rd(t: String, sk: String, bk: String) =
      spark.read.parquet(s"$dwDir/$t").select(sk, bk)
    val ano = (org.apache.spark.sql.functions.col("sk_tempo") / 10000).cast("int")
    graft.sink.Sink.parquet(
      Star.fatoVendasFromDims(
        Tables.orders(spark, srcDir), Tables.lineitem(spark, srcDir),
        rd("dim_produto", "sk_produto", "id_produto_original"),
        rd("dim_cliente", "sk_cliente", "id_cliente_original"),
        rd("dim_vendedor", "sk_vendedor", "id_vendedor_original"),
        rd("dim_localidade", "sk_localidade", "id_localidade_original"))
        .withColumn("ano", ano),
      s"$dwDir/fato_vendas", partitionBy = Seq("ano"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        Tuning.sessionShufflePartitions(sfDir, 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val l = new L; spark.sparkContext.addSparkListener(l)
    def rmTree(p: String): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(p))
    }
    def m(name: String)(f: => Unit): Unit = {
      val (j0, t0, ms0) = l.snap; val g0 = gcMs(); val w0 = System.nanoTime()
      f
      Thread.sleep(300)
      val (j1, t1, ms1) = l.snap
      println(f"[ab] $name%-14s wall=${(System.nanoTime() - w0) / 1e9}%7.2f s " +
        f"jobs=${j1 - j0}%4d tasks=${t1 - t0}%6d " +
        f"taskTime=${(ms1 - ms0) / 1000.0}%8.1f s gc_ms=${gcMs() - g0}%5d")
      Checkpoint.releaseAll()
    }
    // 10x staging (the etl_star_build_sf1 construction)
    val sf1 = s"/tmp/probe_star_sf1_${System.nanoTime()}"
    StarBench.stage10x(spark, sfDir, sf1)
    val dwA = s"/tmp/probe_star_dwA_${System.nanoTime()}"
    val dwB = s"/tmp/probe_star_dwB_${System.nanoTime()}"
    try {
      (1 to reps).foreach { r =>
        m(s"shipped r$r") { StarBench.starBuildTo(spark, sf1, dwA) }
        m(s"stored  r$r") { starBuildToStored(spark, sf1, dwB) }
      }
      // bit-equivalence of the fact both ways
      val a = spark.read.parquet(s"$dwA/fato_vendas")
      val b = spark.read.parquet(s"$dwB/fato_vendas")
      println(s"[ab] fact symdiff: a-b=${a.exceptAll(b).count()} " +
        s"b-a=${b.exceptAll(a).count()} (expect 0 0), rows a=${a.count()}")
    } finally { rmTree(sf1); rmTree(dwA); rmTree(dwB) }
    spark.stop()
  }
}
