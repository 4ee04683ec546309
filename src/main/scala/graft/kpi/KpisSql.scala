package graft.kpi

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.Star

/** The 10 KPIs in spark.sql TEXT form (SURVEY §7.1: each KPI exists in
  * both DataFrame-API and SQL form) — same semantics as graft.kpi.Kpis,
  * executed through the SQL frontend over temp views of the Spark-built
  * star. KpiDualFormSpec asserts both forms return identical rows.
  */
object KpisSql {

  /** Register the star as temp views for the SQL forms. */
  def registerStar(spark: SparkSession, dir: String): Unit = {
    Star.fatoVendas(spark, dir).createOrReplaceTempView("fato_vendas")
    Star.dimProduto(spark, dir).createOrReplaceTempView("dim_produto")
    Star.dimCliente(spark, dir).createOrReplaceTempView("dim_cliente")
    Star.dimLocalidade(spark, dir).createOrReplaceTempView("dim_localidade")
    Star.dimVendedor(spark, dir).createOrReplaceTempView("dim_vendedor")
    Star.dimTempo(spark).createOrReplaceTempView("dim_tempo")
  }

  private val sumTotal =
    "CAST(SUM(CAST(valor_total AS DECIMAL(18,4))) AS DOUBLE)"

  /** KPI name → Spark SQL text (KPIs.sql:1-83 re-expressed). */
  val sql: Map[String, String] = Map(
    "kpi1_faturamento_bruto" ->
      "SELECT CAST(SUM(CAST(valor_bruto AS DECIMAL(18,4))) AS DOUBLE) AS faturamento_bruto FROM fato_vendas",
    "kpi2_faturamento_liquido" ->
      s"SELECT $sumTotal AS faturamento_liquido FROM fato_vendas",
    "kpi3_total_descontos" ->
      "SELECT CAST(SUM(CAST(valor_desconto AS DECIMAL(18,4))) AS DOUBLE) AS total_descontos FROM fato_vendas",
    "kpi4_itens_vendidos" ->
      "SELECT SUM(CAST(qtd_vendida AS BIGINT)) AS total_itens_vendidos FROM fato_vendas",
    "kpi5_top_produtos" ->
      s"""SELECT p.nome_produto, $sumTotal AS total_vendas
FROM fato_vendas f JOIN dim_produto p ON f.sk_produto = p.sk_produto
GROUP BY p.nome_produto
ORDER BY total_vendas DESC, nome_produto
LIMIT 5""",
    "kpi6_vendas_categoria" ->
      s"""SELECT p.categoria, $sumTotal AS total_vendas, COUNT(1) AS quantidade_vendas
FROM fato_vendas f JOIN dim_produto p ON f.sk_produto = p.sk_produto
GROUP BY p.categoria
ORDER BY total_vendas DESC, categoria""",
    "kpi7_vendas_pais" ->
      s"""SELECT l.pais, $sumTotal AS total_vendas
FROM fato_vendas f JOIN dim_localidade l ON f.sk_localidade = l.sk_localidade
GROUP BY l.pais
ORDER BY total_vendas DESC, pais""",
    "kpi7_vendas_nacao" ->
      s"""SELECT c.nacao, $sumTotal AS total_vendas
FROM fato_vendas f JOIN dim_cliente c ON f.sk_cliente = c.sk_cliente
GROUP BY c.nacao
ORDER BY total_vendas DESC, nacao""",
    "kpi8_sazonalidade" ->
      s"""SELECT t.ano, t.mes, t.nome_mes, $sumTotal AS total_vendas
FROM fato_vendas f JOIN dim_tempo t ON f.sk_tempo = t.sk_tempo
GROUP BY t.ano, t.mes, t.nome_mes
ORDER BY t.ano, t.mes""",
    "kpi9_ranking_vendedores" ->
      s"""SELECT v.nome_vendedor, $sumTotal AS total_gerado
FROM fato_vendas f JOIN dim_vendedor v ON f.sk_vendedor = v.sk_vendedor
WHERE v.nome_vendedor IS NOT NULL
GROUP BY v.nome_vendedor
ORDER BY total_gerado DESC, nome_vendedor
LIMIT 10""",
    "kpi10_ticket_medio" ->
      s"SELECT $sumTotal / CAST(COUNT(1) AS DOUBLE) AS ticket_medio_item FROM fato_vendas")

  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerStar(spark, dir)
    spark.sql(sql(name))
  }
}
