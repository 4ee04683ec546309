package graft
// Dumps the star-build FACT frame's formatted plan for plans/r22:
// before = in-plan dim re-derivation (Star.fatoVendas), after = the
// shipped stored-dims form (fatoVendasFromDims over read-back dims).
import org.apache.spark.sql.SparkSession

object StarPlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0); val sfDir = args(1)
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
    import graft.etl.Star
    val dw = s"/tmp/probe_starplan_${System.nanoTime()}"
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$name.txt"),
        s"========== $name ==========\n" + plan)
      println(s"[plan] wrote $name.txt")
    }
    dump("etl_star_build_fact_before", Star.fatoVendas(spark, sfDir))
    // write the dims once (exactly what starBuildTo does first)
    Seq(
      "dim_produto" -> Star.dimProduto(spark, sfDir),
      "dim_cliente" -> Star.dimCliente(spark, sfDir),
      "dim_vendedor" -> Star.dimVendedor(spark, sfDir),
      "dim_localidade" -> Star.dimLocalidade(spark, sfDir),
      "dim_tempo" -> Star.dimTempo(spark)).foreach { case (n, df) =>
      graft.sink.Sink.parquet(df, s"$dw/$n")
    }
    def rd(t: String, sk: String, bk: String) =
      spark.read.parquet(s"$dw/$t").select(sk, bk)
    dump("etl_star_build_fact_after",
      Star.fatoVendasFromDims(
        Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
        rd("dim_produto", "sk_produto", "id_produto_original"),
        rd("dim_cliente", "sk_cliente", "id_cliente_original"),
        rd("dim_vendedor", "sk_vendedor", "id_vendedor_original"),
        rd("dim_localidade", "sk_localidade", "id_localidade_original")))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(dw))
    spark.stop()
  }
}
