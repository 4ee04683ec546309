package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** The reference's actual sink is Postgres 16 (docker-compose.yaml:90-91)
  * with NUMERIC(18,2) money columns (create_dw_tables.sql:62-64) and
  * TRUNCATE-before-load idempotence. No Postgres server exists in this
  * container, so these specs pin the DIALECT layer Spark uses for that
  * target — the exact SQL/type mapping `Sink.jdbc` relies on when pointed
  * at a postgresql:// URL — while JdbcSinkSpec keeps the physical
  * round-trip against embedded Derby.
  */
class PostgresDialectSpec extends SparkSpec {

  private val pg = JdbcDialects.get("jdbc:postgresql://dw-host:5432/dw")

  test("postgresql:// URLs resolve to the Postgres dialect") {
    assert(pg.getClass.getSimpleName.startsWith("PostgresDialect"))
  }

  test("money columns map to NUMERIC(18,2) — the reference's DDL type") {
    // write side: the sink's DecimalType(18,2) must create NUMERIC(18,2),
    // not a rounded/padded variant — scale drift here silently changes
    // money rounding at insert (SURVEY §2 F10-F12)
    val t = pg.getJDBCType(DecimalType(18, 2))
    assert(t.isDefined)
    assert(t.get.databaseTypeDefinition.toUpperCase.replace(" ", "")
      === "NUMERIC(18,2)")
    assert(t.get.jdbcNullType === java.sql.Types.NUMERIC)
  }

  test("remaining DW column types map to the expected Postgres DDL") {
    def ddl(dt: DataType): String =
      pg.getJDBCType(dt).map(_.databaseTypeDefinition.toUpperCase)
        .getOrElse(sys.error(s"no mapping for $dt"))
    assert(ddl(StringType) === "TEXT")        // nome_*, categoria, nacao
    assert(ddl(DoubleType) === "FLOAT8")      // valor_* as double surface
    assert(ddl(FloatType) === "FLOAT4")
    assert(ddl(BinaryType) === "BYTEA")       // multimodal payloads
    assert(ddl(BooleanType) === "BOOLEAN")
    assert(ddl(ByteType) === "SMALLINT")      // Postgres has no TINYINT
  }

  test("truncate=true issues Postgres TRUNCATE ONLY; cascade is explicit") {
    // Sink.jdbc(truncate=true) delegates to the dialect's truncate SQL:
    // ONLY (not the whole inheritance tree), and CASCADE exactly when
    // asked — the reference's TRUNCATE ... CASCADE is the cascade=Some(true)
    // form, and Spark only honors truncate-in-place because the dialect
    // reports non-cascading as its default
    assert(pg.getTruncateQuery("dw.fato_vendas")
      === "TRUNCATE TABLE ONLY dw.fato_vendas")
    assert(pg.getTruncateQuery("dw.fato_vendas", Some(true))
      === "TRUNCATE TABLE ONLY dw.fato_vendas CASCADE")
    assert(pg.isCascadingTruncateTable().contains(false))
  }

  test("identifier quoting protects the lowercase reference column names") {
    // Postgres folds unquoted identifiers to lowercase; the dialect must
    // quote so `sk_produto`-style names survive verbatim
    assert(pg.quoteIdentifier("sk_produto") === "\"sk_produto\"")
  }
}
