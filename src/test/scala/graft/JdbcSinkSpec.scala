package graft

import graft.etl.Star

/** The reference-compatible JDBC path (SURVEY §2.1 S2/S4/S5) against a
  * real embedded Derby database: truncate+append sink, then the
  * reference's exact read-back pattern — a projected SELECT of the SK↔
  * business-key map (dags/etl_fato_vendas.py:21-24).
  */
class JdbcSinkSpec extends SparkSpec {

  test("JDBC round-trip: truncate+append sink, projected scan back") {
    val db = java.nio.file.Files.createTempDirectory("graft_derby")
      .resolve("dw").toString
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties()
    val dim = Star.dimProduto(spark, tiny)
      .select("sk_produto", "id_produto_original", "nome_produto")

    // first write creates the table; second exercises truncate-reload (S5)
    graft.sink.Sink.jdbc(dim, url, "dim_produto", props)
    graft.sink.Sink.jdbc(dim, url, "dim_produto", props)

    // S2: projected scan back — only the SK map columns
    // (Derby upper-cases unquoted identifiers; Spark created the columns
    // quoted-lowercase, so the projection must quote them)
    val back = spark.read.jdbc(url,
      "(SELECT \"sk_produto\", \"id_produto_original\" FROM dim_produto) t",
      props)
    assert(back.count() === dim.count()) // truncate prevented duplication
    val diff = back
      .except(dim.select("sk_produto", "id_produto_original"))
    assert(diff.count() === 0)
  }
}
