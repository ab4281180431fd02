package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{GraftArrow, GraftHttpServers, HttpEndpoint}

/** Oracle-checked entries for the graft-arrow DSv2 source (SURVEY.md §2
  * A1–A6): the same rows must come back through endpoint → Arrow IPC →
  * bridge as a plain SQL scan of the parquet file produces. The oracle
  * is deliberately the *plain* query — pushdown must be semantically
  * invisible. */
object ArrowOps {

  /** A1–A3: projected + filtered scan through the endpoint. */
  def scan(spark: SparkSession, dir: String): DataFrame =
    GraftArrow.read(spark, dir, "lineitem")
      .filter(col("l_quantity") < 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val scanSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem WHERE l_quantity < 3""".stripMargin

  /** A4: pushed COUNT/SUM/MIN/MAX partials merged by Spark. */
  def aggPushdown(spark: SparkSession, dir: String): DataFrame =
    GraftArrow.read(spark, dir, "lineitem")
      .filter(col("l_discount") > 0.02)
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))

  val aggPushdownSql: String =
    """SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
      |FROM lineitem WHERE l_discount > 0.02""".stripMargin

  /** A4+ (r8): GROUPED aggregation pushdown — one partial row per
    * (split, group) crosses the wire instead of the raw data. This
    * EXCEEDS the reference optimizer's contract (it falls back local on
    * any GROUP BY — aggregation_pushdown.cpp); divergence recorded in
    * SURVEY §2/A4. sum(l_quantity) is exact (integer-valued doubles,
    * < 2⁵³), so partial merge order cannot perturb the hash. */
  def aggGroupBy(spark: SparkSession, dir: String): DataFrame =
    GraftArrow.read(spark, dir, "lineitem")
      .filter(col("l_discount") > 0.02)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))
      .orderBy(col("l_returnflag"))

  val aggGroupBySql: String =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
      |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
      |FROM lineitem WHERE l_discount > 0.02
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** A6: the split plan itself. One packed split at test SFs (row groups
    * are ≤1M rows), so the oracle is the full row count. */
  def splits(spark: SparkSession, dir: String): DataFrame =
    GraftArrow.splits(spark, dir, "lineitem", splitSize = Long.MaxValue / 4)
      .select(col("split_id"), col("split_rows"))

  val splitsSql: String =
    "SELECT CAST(0 AS BIGINT) AS split_id, CAST(count(*) AS BIGINT) AS split_rows FROM lineitem"

  /** SQL-through-catalog: the reference's `SELECT … FROM
    * dd_read_arrow(…)` usage, as `SELECT … FROM graft.<table>`. */
  def sqlCatalog(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.dir", dir)
    spark.sql(
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM graft.lineitem
        |WHERE l_discount > 0.05
        |GROUP BY l_returnflag""".stripMargin)
  }

  val sqlCatalogSql: String =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem WHERE l_discount > 0.05
      |GROUP BY l_returnflag""".stripMargin

  /** A1 `sql :=` mode (reference read_arrow_dd.cpp:313-345): a
    * free-form server-side join + aggregate executed by the endpoint's
    * engine; the client scans its result set through parallel splits.
    * The oracle is the IDENTICAL query text run by DuckDB, so the text
    * must be engine-neutral (decimal-cast sum for order-independent
    * money totals — see Olap). */
  val sqlQueryText: String =
    """SELECT n.n_name AS nation, count(*) AS n_suppliers,
      |  CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY n.n_name""".stripMargin

  def sqlQuery(spark: SparkSession, dir: String): DataFrame =
    GraftArrow.readSql(spark, dir, sqlQueryText)

  /** A1 over REAL HTTP (r13): the full reference transport in one
    * gated entry — POST /v1/login mints the JWT (dd_login.cpp), every
    * subsequent request carries `Authorization: Bearer` past the
    * server's auth check, /v1/plan hands back the JSON split plan, and
    * each split streams back as a genuine
    * application/vnd.apache.arrow.stream over a loopback socket
    * (arrow_http_client.cpp). Oracle = the plain query: the transport
    * must be semantically invisible, exactly like pushdown. */
  def httpScan(spark: SparkSession, dir: String): DataFrame = {
    val url = GraftHttpServers.shared(dir)
    val token = HttpEndpoint.login(url, "admin", "admin",
      claims = Seq("database" -> "graft"))
    GraftArrow.readHttp(spark, url, "lineitem", Some(token))
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
  }

  val httpScanSql: String =
    """SELECT l_orderkey, l_partkey, l_quantity
      |FROM lineitem WHERE l_quantity >= 45""".stripMargin

  /** A4 over REAL HTTP: grouped aggregation pushdown where the
    * per-(split, group) PARTIAL rows cross the socket as Arrow batches
    * and Spark's final aggregation merges them — the
    * data-never-moves shape at its most valuable (a 100 TB remote
    * table answers a GROUP BY with kilobytes on the wire).
    * sum(l_quantity) is exact (integer-valued doubles < 2⁵³), so
    * partial merge order cannot perturb the hash. */
  def httpAgg(spark: SparkSession, dir: String): DataFrame = {
    val url = GraftHttpServers.shared(dir)
    val token = HttpEndpoint.login(url, "admin", "admin")
    GraftArrow.readHttp(spark, url, "lineitem", Some(token))
      .filter(col("l_quantity") > 25)
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_linestatus"))
  }

  val httpAggSql: String =
    """SELECT l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty,
      |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
      |FROM lineitem WHERE l_quantity > 25
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** The reference's `sql :=` mode over REAL HTTP: the server's
    * engine executes the free-form query and the client scans the
    * RESULT's splits — same oracle as the in-process `arrow_sql_query`
    * (transport invisible, engine identical). */
  def httpSqlQuery(spark: SparkSession, dir: String): DataFrame = {
    val url = GraftHttpServers.shared(dir)
    val token = HttpEndpoint.login(url, "admin", "admin")
    GraftArrow.readHttpSql(spark, url, sqlQueryText, Some(token))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "arrow_scan" -> scan _,
    "arrow_agg_pushdown" -> aggPushdown _,
    "arrow_agg_groupby" -> aggGroupBy _,
    "arrow_splits" -> splits _,
    "arrow_sql_catalog" -> sqlCatalog _,
    "arrow_sql_query" -> sqlQuery _,
    "arrow_http_scan" -> httpScan _,
    "arrow_http_agg" -> httpAgg _,
    "arrow_http_sql_query" -> httpSqlQuery _)

  val oracles: Map[String, String] = Map(
    "arrow_scan" -> scanSql,
    "arrow_agg_pushdown" -> aggPushdownSql,
    "arrow_agg_groupby" -> aggGroupBySql,
    "arrow_splits" -> splitsSql,
    "arrow_sql_catalog" -> sqlCatalogSql,
    "arrow_sql_query" -> sqlQueryText,
    "arrow_http_scan" -> httpScanSql,
    "arrow_http_agg" -> httpAggSql,
    "arrow_http_sql_query" -> sqlQueryText)
}
