package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core OLAP query surface (SURVEY.md §2 B1–B10): the scan / filter /
  * project / aggregate / join / window / sort / top-k capability the
  * reference engine (DuckDB + dazzleduck) provides, re-expressed with the
  * declarative DataFrame API so Catalyst handles pushdown, pruning, join
  * strategy and AQE.
  *
  * Oracle-parity discipline: money aggregates are computed in exact
  * DECIMAL arithmetic (the inputs have ≤2 decimal digits, so the casts are
  * lossless) and only the final value is cast to DOUBLE. This makes the
  * result independent of partial-aggregation order and bit-identical to
  * DuckDB's DECIMAL arithmetic — a raw double SUM would drift by summation
  * order and flap the driver's hash compare. Ratios divide two exact
  * values in IEEE double, which is also deterministic.
  *
  * Scale notes (100 TB): every query shuffles each fact table at most
  * once, on its aggregation/join key; true dimension tables (region/
  * nation/supplier/part) are broadcast — `broadcast()` hints keep that
  * explicit rather than relying on size estimates surviving a filter.
  * Customer is fact-scale at TPC-H ratios (sf×150k rows) and is NEVER
  * force-broadcast; AQE converts those joins to broadcast at small sf
  * and keeps them as shuffles at scale. Top-k uses orderBy+limit, which
  * Spark executes as TakeOrderedAndProject (per-partition partial
  * top-k, no global sort).
  */
object Olap {

  /** Lossless exact cast for the ≤2-decimal test data. */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def pct(c: Column): Column = c.cast(DecimalType(4, 2))
  /** extendedprice * (1 - discount), exact. */
  private def discPrice(ext: Column, disc: Column): Column =
    dec2(ext) * (lit(1).cast(DecimalType(4, 2)) - pct(disc))

  // ---------------------------------------------------------------- B1
  /** TPC-H Q1 pricing summary: full-scan groupBy aggregate. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")) *
            (lit(1).cast(DecimalType(4, 2)) + pct(col("l_tax"))))
          .cast("double").as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(pct(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- B2
  /** TPC-H Q6-style selective filter + global aggregate. The filter is
    * pushed to the parquet scan (verify: PushedFilters in explain). */
  def q2RevenueFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec2(col("l_extendedprice")) * pct(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q2Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- B3
  /** TPC-H Q3 shipping priority: 3-way join + agg + top-k. Customer is
    * fact-scale at TPC-H ratios, so no broadcast hint — AQE picks the
    * join strategy from runtime sizes (broadcast locally, shuffle at
    * 100 TB). Top-10 via TakeOrderedAndProject, not a global sort. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").cast("string").as("orderdate"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- B4
  /** TPC-H Q4-style order-priority check with an EXISTS (left-semi join):
    * orders having at least one line shipped >30 days after order date. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- B5
  /** TPC-H Q5-style local-supplier revenue: 5-way star join. True dims
    * (supplier/nation/region) broadcast; customer is fact-scale so it
    * joins un-hinted (AQE chooses; shuffle-hash at 100 TB). */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
    val supp = Tables(spark, dir, "supplier")
    val nat = Tables(spark, dir, "nation")
    val reg = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- B6
  /** Conditional aggregation (CASE WHEN inside SUM): PROMO revenue share
    * per month, TPC-H Q14 flavor. */
  def q6PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    val dp = discPrice(col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", dp)
          .otherwise(lit(0).cast(DecimalType(4, 2)))).cast("double").as("promo_revenue"),
        sum(dp).cast("double").as("total_revenue"))
      .orderBy(col("ship_month"))
  }

  val q6Sql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |        ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY strftime(l_shipdate, '%Y-%m')
      |ORDER BY ship_month""".stripMargin

  // ---------------------------------------------------------------- B7
  /** Window functions: per-supplier first shipment (row_number over a
    * fully-deterministic order) with a running quantity sum. Window
    * shuffles once on l_suppkey. */
  def q7WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    // rank FIRST, filter IMMEDIATELY, running-sum on the survivors: the
    // running sum at rank k only reads ranks ≤ k, so filtering between
    // the two windows changes nothing semantically — but it puts the
    // rn<=3 predicate directly above the rank Window, which lets
    // InferWindowGroupLimit plant a partial top-3-per-key below the
    // shuffle (WindowGroupLimit Partial→Final). At scale that shuffles
    // ~3 rows per key per map partition instead of the whole fact
    // table; the second Window then sorts only the filtered survivors.
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .withColumn("running_qty",
        sum(dec2(col("l_quantity")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        col("l_suppkey"), col("rn"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").cast("string").as("ship_day"),
        col("running_qty").cast("double").as("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val q7Sql: String =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, ship_day,
      |       CAST(running_qty AS DOUBLE) AS running_qty
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
      |      PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |  FROM lineitem)
      |WHERE rn <= 3
      |ORDER BY l_suppkey, rn""".stripMargin

  // ---------------------------------------------------------------- B8
  /** Exact distinct counts per group. (Approx distinct is spec-tested,
    * not oracled — HLL algorithms differ across engines by design.) */
  def q8Distinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))
  }

  val q8Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- B9
  /** groupBy + HAVING + top-k: suppliers above mean-ish revenue cut. */
  def q9TopSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val supp = Tables(spark, dir, "supplier")
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("total_revenue"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("total_revenue") > 100000.0)
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("total_revenue").desc, col("s_suppkey"))
      .limit(10)
  }

  val q9Sql: String =
    """SELECT s_suppkey, s_name, total_revenue
      |FROM (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue > 100000.0
      |ORDER BY total_revenue DESC, s_suppkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- B10
  /** TPC-H Q10-style returned-items report: join + filter + agg + top-k
    * by revenue. Customer joins the post-aggregation (custkey-grouped)
    * side un-hinted — both sides are custkey-scale, AQE decides. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val cust = Tables(spark, dir, "customer")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, revenue
      |FROM (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  GROUP BY o_custkey)
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- B11
  /** Ordered-set aggregates: exact interpolated quantiles + a
    * deterministic variance. Quantiles are DYADIC (.25/.5/.75) over the
    * integer-valued quantity column, so the interpolation
    * `lo + g·(hi−lo)` is exact in both engines regardless of formula
    * shape (g and the values are dyadic — no rounding anywhere);
    * variance comes from exact decimal Σx/Σx² so it is
    * partial-order-independent, unlike a streaming Welford stddev.
    *
    * Scale note: EXACT percentile buffers each group's values (fine
    * here — 3 group keys × bounded-cardinality ints, and Spark's
    * buffer is a value→count map so it is O(distinct), not O(rows));
    * for high-cardinality value domains at 100 TB the right tool is
    * approx_percentile (t-digest), which this entry deliberately does
    * not oracle because sketch algorithms differ across engines. */
  def q11Quantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qs"),
        count(lit(1)).as("n"),
        sum(dec2(col("l_quantity"))).cast("double").as("sx"),
        sum(dec2(col("l_quantity")) * dec2(col("l_quantity"))).cast("double").as("sxx"))
      .select(
        col("l_returnflag"),
        element_at(col("qs"), 1).as("q25"),
        element_at(col("qs"), 2).as("median"),
        element_at(col("qs"), 3).as("q75"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }

  val q11Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS median,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |   - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |  / (COUNT(*) - 1) AS var_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- B12
  /** Multi-dimensional aggregation: ROLLUP over (returnflag,
    * linestatus) — subtotal and grand-total rows with NULL group
    * markers, matching SQL ROLLUP on both engines. */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("total_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val q12Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- B12b
  /** CUBE over (returnflag, linestatus) — all four grouping sets, with
    * GROUPING() markers carried as columns so marker-NULLs are
    * distinguishable from data NULLs (the standard disambiguator; both
    * engines implement the SQL-standard semantics). Completes the
    * multi-dimensional surface next to B12's ROLLUP — DuckDB under the
    * reference extension serves CUBE/GROUPING SETS too. */
  def q12bCube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("total_price"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val q12bSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS — the general form CUBE/ROLLUP sugar over:
    * per-flag totals and per-status totals in one pass, no cross
    * combination. SQL-text surface (the DataFrame API spells it
    * `GROUP BY GROUPING SETS` too — Spark plans one Expand over the
    * scan, not two scans). */
  def q12cGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("graft_li_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM graft_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  val q12cSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** queries + oracles for SparkEntry registration. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q2_revenue_filter" -> q2RevenueFilter _,
    "q3_top_orders" -> q3TopOrders _,
    "q4_order_priority" -> q4OrderPriority _,
    "q5_nation_revenue" -> q5NationRevenue _,
    "q6_promo_share" -> q6PromoShare _,
    "q7_window_rank" -> q7WindowRank _,
    "q8_distinct" -> q8Distinct _,
    "q9_top_suppliers" -> q9TopSuppliers _,
    "q10_returned_items" -> q10ReturnedItems _,
    "q11_quantiles" -> q11Quantiles _,
    "q12_rollup" -> q12Rollup _,
    "q12b_cube" -> q12bCube _,
    "q12c_grouping_sets" -> q12cGroupingSets _)

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_revenue_filter" -> q2Sql,
    "q3_top_orders" -> q3Sql,
    "q4_order_priority" -> q4Sql,
    "q5_nation_revenue" -> q5Sql,
    "q6_promo_share" -> q6Sql,
    "q7_window_rank" -> q7Sql,
    "q8_distinct" -> q8Sql,
    "q9_top_suppliers" -> q9Sql,
    "q10_returned_items" -> q10Sql,
    "q11_quantiles" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q12b_cube" -> q12bSql,
    "q12c_grouping_sets" -> q12cSql)
}
