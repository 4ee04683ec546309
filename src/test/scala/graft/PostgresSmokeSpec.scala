package graft

import org.apache.spark.sql.functions._
import graft.etl.Star

/** Live Postgres wire smoke — the ONE component of the reference's
  * deployment (docker-compose.yaml:90-91, a Postgres DW) this sandbox
  * cannot exercise. Audited r13: the sandbox DOES ship Postgres 15
  * server binaries (initdb/pg_ctl/postgres), but no Postgres JDBC
  * driver jar exists anywhere on the box (/opt/spark/jars, the offline
  * coursier cache, system java dirs) and zero egress forbids resolving
  * one — so Spark has no way to speak the wire protocol even to a local
  * server, and build.sbt may not grow dependencies. The mechanics are
  * proven on embedded Derby (JdbcSinkSpec), Spark's PostgresDialect
  * SQL is pinned (PostgresDialectSpec), and since r14 the SERVER-side
  * semantics (reference DDL, COPY load, NUMERIC rounding, aggregate
  * parity) run against a real local Postgres 15 in PostgresServerSpec;
  * this spec closes the last sliver — the literal JDBC wire — the day
  * an environment provides the pgjdbc jar.
  *
  * Set GRAFT_PG_URL to a Spark-style JDBC URL, e.g.
  *   GRAFT_PG_URL='jdbc:postgresql://host:5432/dw?user=u&password=p'
  * and the full truncate+append round-trip runs against the live wire;
  * unset, the tests CANCEL (reported as canceled, never as passed — a
  * skipped smoke must not look like evidence).
  */
class PostgresSmokeSpec extends SparkSpec {

  private def pgUrl: String = {
    assume(sys.env.contains("GRAFT_PG_URL"),
      "GRAFT_PG_URL not set — no Postgres server in this environment")
    sys.env("GRAFT_PG_URL")
  }

  test("live Postgres: truncate+append dim sink and projected read-back") {
    val url = pgUrl
    val props = new java.util.Properties()
    val dim = Star.dimProduto(spark, tiny)
      .select("sk_produto", "id_produto_original", "nome_produto")
    // first write creates, second exercises the reference's
    // TRUNCATE-preserving reload (Sink.jdbc sets truncate=true)
    graft.sink.Sink.jdbc(dim, url, "graft_smoke_dim_produto", props)
    graft.sink.Sink.jdbc(dim, url, "graft_smoke_dim_produto", props)
    val back = spark.read.jdbc(url,
      "(SELECT sk_produto, id_produto_original FROM graft_smoke_dim_produto) t",
      props)
    assert(back.count() === dim.count())
    assert(back.except(dim.select("sk_produto", "id_produto_original")).count() === 0)
  }

  test("live Postgres: NUMERIC(18,2) money survives the wire bit-exactly") {
    val url = pgUrl
    val props = new java.util.Properties()
    val fato = spark.range(1, 101).select(
      col("id").cast("int").as("id_pedido"),
      ((col("id") * 997 + 5).cast("decimal(18,0)") / 100)
        .cast("decimal(18,2)").as("valor_total"))
    graft.sink.Sink.jdbc(fato, url, "graft_smoke_fato_money", props)
    graft.sink.Sink.jdbc(fato, url, "graft_smoke_fato_money", props)
    val back = spark.read.jdbc(url, "graft_smoke_fato_money", props)
    assert(back.schema("valor_total").dataType ===
      org.apache.spark.sql.types.DecimalType(18, 2))
    assert(back.count() === 100)
    assert(back.except(fato).count() === 0)
  }
}
