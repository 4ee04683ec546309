package graft

import scala.sys.process._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.Star

/** The reference's DW loaded into a REAL PostgreSQL server — server-side
  * semantics closed without the JDBC wire.
  *
  * r13 audit result: the sandbox ships Postgres 15 server binaries but
  * no pgjdbc jar (and zero egress forbids resolving one), so Spark
  * cannot speak the wire protocol — that half stays pinned by
  * JdbcSinkSpec (Derby mechanics) + PostgresDialectSpec (the SQL Spark
  * would emit) + PostgresSmokeSpec (runs when an env provides the jar).
  * THIS spec exercises the other half, which needs no driver: a real
  * `initdb`/`pg_ctl` server on a unix socket, the reference's DDL
  * (create_dw_tables.sql:1-67 — SERIAL SKs, VARCHAR dims,
  * NUMERIC(18,2) money, FK-indexed fact), the engine's star output
  * loaded through COPY csv, aggregates read back via psql and compared
  * EXACTLY against Spark's DECIMAL arithmetic.
  *
  * Notably closes the NUMERIC insert-rounding millimeter open since
  * r12: literals beyond scale 2 round HALF-AWAY-FROM-ZERO in Postgres
  * NUMERIC(18,2) — the same rule as Spark's Decimal HALF_UP cast —
  * asserted value-by-value on adversarial midpoints.
  *
  * Cancels (never fake-passes) when the binaries or the `postgres`
  * system user are unavailable.
  */
class PostgresServerSpec extends SparkSpec {

  private def sh(cmd: String): String = Seq("sh", "-c", cmd).!!

  /** Run as the unprivileged postgres user (initdb refuses root). */
  private def asPg(cmd: String): Int =
    Seq("su", "postgres", "-c", s"cd /tmp && $cmd").!

  private lazy val serverAvailable: Boolean =
    Seq("sh", "-c", "command -v initdb && command -v pg_ctl && id postgres")
      .! == 0

  private lazy val sock: String = {
    val dir = s"/tmp/graft_pg_${System.nanoTime()}"
    sh(s"mkdir -p $dir && chown postgres:postgres $dir")
    require(asPg(s"initdb -D $dir/data -U graft --no-sync -A trust " +
      s"> $dir/initdb.log 2>&1") == 0, "initdb failed")
    require(asPg(s"pg_ctl -D $dir/data -o \"-k $dir -c listen_addresses=''\" " +
      s"-l $dir/server.log start") == 0, "pg_ctl start failed")
    sys.addShutdownHook {
      asPg(s"pg_ctl -D $dir/data -m immediate stop"): Unit
      sh(s"rm -rf $dir"): Unit
    }
    dir
  }

  private def psql(sql: String): String =
    Seq("psql", "-h", sock, "-U", "graft", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1", "-qAt", "-c", sql).!!.trim

  /** Stage a DataFrame as ONE csv file and COPY it into `table(cols)`.
    * `\N` as the null token keeps NULL and '' distinct (the same
    * convention CsvStage pins for the ingest direction).
    */
  private def copyIn(df: DataFrame, table: String, cols: Seq[String]): Unit = {
    val stage = s"$sock/stage_$table"
    df.select(cols.map(col): _*).coalesce(1).write.mode("overwrite")
      .option("header", "false").option("nullValue", "\\N").csv(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val r = Seq("psql", "-h", sock, "-U", "graft", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1", "-c",
      s"\\copy public.$table(${cols.mkString(",")}) FROM '${part.getPath}' " +
        "WITH (FORMAT csv, NULL '\\N')").!
    assert(r == 0, s"COPY into $table failed")
  }

  private def requireServer(): Unit =
    assume(serverAvailable,
      "no Postgres server binaries / postgres user in this environment")

  test("real Postgres 15: the reference DDL accepts the engine's full star via COPY") {
    requireServer()
    // the reference's own type surface (create_dw_tables.sql), with the
    // engine fact's grain columns (id_pedido, numero_linha, valor_bruto)
    // in place of the SERIAL id_venda/valor_unitario — the money/SK/text
    // types under test are verbatim
    psql("""
      DROP TABLE IF EXISTS public.fato_vendas, public.dim_produto,
        public.dim_cliente, public.dim_vendedor, public.dim_localidade,
        public.dim_tempo;
      CREATE TABLE public.dim_tempo (
        sk_tempo INT PRIMARY KEY, data_completa DATE NOT NULL,
        ano INT NOT NULL, mes INT NOT NULL, nome_mes VARCHAR(20) NOT NULL,
        trimestre INT NOT NULL, semestre INT NOT NULL);
      CREATE TABLE public.dim_produto (
        sk_produto BIGINT PRIMARY KEY, id_produto_original BIGINT,
        nome_produto VARCHAR(255), marca VARCHAR(100),
        categoria VARCHAR(100), tamanho INT);
      CREATE TABLE public.dim_cliente (
        sk_cliente BIGINT PRIMARY KEY, id_cliente_original BIGINT,
        nome_cliente VARCHAR(255), tipo_cliente VARCHAR(50),
        nacao VARCHAR(100), regiao VARCHAR(100), segmento VARCHAR(50));
      CREATE TABLE public.dim_localidade (
        sk_localidade BIGINT PRIMARY KEY, id_localidade_original BIGINT,
        pais VARCHAR(100), regiao VARCHAR(100));
      CREATE TABLE public.dim_vendedor (
        sk_vendedor BIGINT PRIMARY KEY, id_vendedor_original BIGINT,
        nome_vendedor VARCHAR(255), nacao VARCHAR(100));
      CREATE TABLE public.fato_vendas (
        id_pedido BIGINT, numero_linha INT,
        sk_produto BIGINT REFERENCES public.dim_produto(sk_produto),
        sk_cliente BIGINT REFERENCES public.dim_cliente(sk_cliente),
        sk_tempo INT REFERENCES public.dim_tempo(sk_tempo),
        sk_localidade BIGINT REFERENCES public.dim_localidade(sk_localidade),
        sk_vendedor BIGINT REFERENCES public.dim_vendedor(sk_vendedor),
        qtd_vendida INT,
        valor_bruto NUMERIC(18,2), valor_desconto NUMERIC(18,2),
        valor_total NUMERIC(18,2));
      CREATE INDEX idx_fato_tempo ON public.fato_vendas(sk_tempo);
      CREATE INDEX idx_fato_produto ON public.fato_vendas(sk_produto);""")

    copyIn(Star.dimTempo(spark), "dim_tempo",
      Seq("sk_tempo", "data_completa", "ano", "mes", "nome_mes",
        "trimestre", "semestre"))
    copyIn(Star.dimProduto(spark, tiny), "dim_produto",
      Seq("sk_produto", "id_produto_original", "nome_produto", "marca",
        "categoria", "tamanho"))
    copyIn(Star.dimCliente(spark, tiny), "dim_cliente",
      Seq("sk_cliente", "id_cliente_original", "nome_cliente",
        "tipo_cliente", "nacao", "regiao", "segmento"))
    copyIn(Star.dimLocalidade(spark, tiny), "dim_localidade",
      Seq("sk_localidade", "id_localidade_original", "pais", "regiao"))
    copyIn(Star.dimVendedor(spark, tiny), "dim_vendedor",
      Seq("sk_vendedor", "id_vendedor_original", "nome_vendedor", "nacao"))
    val fato = Star.fatoVendas(spark, tiny)
    copyIn(fato, "fato_vendas",
      Seq("id_pedido", "numero_linha", "sk_produto", "sk_cliente",
        "sk_tempo", "sk_localidade", "sk_vendedor", "qtd_vendida",
        "valor_bruto", "valor_desconto", "valor_total"))

    // the server enforced every FK + NOT NULL on the way in; now the
    // aggregates must agree EXACTLY with Spark's DECIMAL arithmetic
    assert(psql("SELECT COUNT(*) FROM public.fato_vendas").toLong ===
      fato.count())
    val sparkSums = fato.agg(
      sum("valor_bruto"), sum("valor_desconto"), sum("valor_total"))
      .head()
    val pgSums = psql("SELECT SUM(valor_bruto) || '|' || " +
      "SUM(valor_desconto) || '|' || SUM(valor_total) " +
      "FROM public.fato_vendas").split('|')
    assert(pgSums(0) === sparkSums.getDecimal(0).toPlainString)
    assert(pgSums(1) === sparkSums.getDecimal(1).toPlainString)
    assert(pgSums(2) === sparkSums.getDecimal(2).toPlainString)
    // and the reference's KPI1 (SUM(valor_bruto), KPIs.sql) agrees with
    // the engine's kpi1 run on the same star — kpi1 casts the exact
    // decimal sum to DOUBLE at the very end (oracle parity), so compare
    // after the same final cast on the Postgres side
    val kpi1 = graft.kpi.Kpis.kpi1FaturamentoBruto(fato).head().getDouble(0)
    val pgKpi1 = psql(
      "SELECT CAST(SUM(valor_bruto) AS DOUBLE PRECISION) " +
        "FROM public.fato_vendas").toDouble
    assert(pgKpi1 === kpi1, "KPI1 over the real-Postgres DW diverged")
  }

  test("real Postgres 15: NUMERIC(18,2) insert rounding == Spark Decimal HALF_UP") {
    requireServer()
    // the millimeter open since r12: what does the SERVER do to a money
    // value with more than 2 decimals on INSERT? Answer (asserted):
    // half-away-from-zero — identical to Spark's HALF_UP Decimal cast,
    // so a deployment sinking DOUBLE into NUMERIC gets the same cents
    // whichever side rounds
    val adversarial = Seq("2.675", "2.665", "-2.675", "-2.665", "0.005",
      "-0.005", "1.0049999", "1.005", "999999999999999.995")
    psql("DROP TABLE IF EXISTS public.t_round; " +
      "CREATE TABLE public.t_round(i INT, v NUMERIC(18,2));")
    adversarial.zipWithIndex.foreach { case (v, i) =>
      psql(s"INSERT INTO public.t_round VALUES ($i, $v)"): Unit
    }
    val pg = psql("SELECT v FROM public.t_round ORDER BY i")
      .split('\n').map(_.trim)
    val sparkSide = adversarial.map { v =>
      new java.math.BigDecimal(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).toPlainString
    }
    // Spark's cast honors the same rule as its Decimal.set (HALF_UP) —
    // pin the engine expression too, not just the JDK box
    import spark.implicits._
    val viaCast = adversarial.toDF("s")
      .select(col("s").cast("decimal(18,2)").as("v"))
      .collect().map(_.getDecimal(0).toPlainString)
    assert(pg.toSeq === sparkSide, "Postgres NUMERIC rounding diverged")
    assert(viaCast.toSeq === sparkSide, "Spark cast rounding diverged")
  }
}
