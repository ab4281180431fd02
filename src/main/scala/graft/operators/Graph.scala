package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph / link-analysis operators (SURVEY.md §2 C50) — the iterative
  * message-passing family (the batch-trainer cousins are C37/C38):
  * rank flows along edges for a FIXED number of rounds, each round one
  * shuffle, all arithmetic exact-integer so DuckDB replays it.
  */
object Graph {

  /** PageRank iterations — fixed, like C38's Lloyd rounds: the gated
    * artifact pins every round via the unrolled-CTE oracle; production
    * runs to a convergence test instead, changing only the loop bound. */
  private val PrIters = 3
  private val PrTopK = 20

  /** Integer fixed-point PageRank (C50; Brin & Page 1998) over the
    * customer↔supplier trade graph — an edge per DISTINCT
    * (customer, supplier) pair that traded (through orders×lineitem),
    * symmetrized so the walk is well-defined on the bipartite graph
    * and no node dangles. Ranks are ppm fixed-point longs seeded at
    * 10⁶; one round is
    * `r'(v) = 150000 + (850000 · Σ_{(u,v)∈E} (r(u) div deg(u))) div 10⁶`
    * — the 0.85-damped update with EVERY operation an integer floor
    * op, identical in Spark (`div`) and DuckDB (`//`), so the gated
    * output (top-[[PrTopK]] nodes by rank after [[PrIters]] rounds,
    * ties by node id) hash-matches the unrolled-CTE oracle exactly
    * (the C38 discipline; floor-div mass leakage is deterministic and
    * identical on both engines, which is what the gate needs).
    *
    * Scale shape: the edge frame is DISTINCT pairs (dedup'd once,
    * map-side combinable) and appears in every round as an IDENTICAL
    * subplan over the same DataFrame object, so ReuseExchange
    * materializes its shuffle once per action (the C5/r11 discipline
    * — no persist, nothing to leak); each round is one
    * broadcast-or-shuffle join of the (node, rank) frame
    * (NODE-bounded, not edge-bounded) into the edges plus one
    * map-side-combined sum per destination — the Pregel superstep
    * as two exchanges, T rounds = T linear passes. Rank values are
    * long-safe far past any test SF: a hub's rank is bounded by
    * 10⁶·|V| and the update multiplies by 85·10⁴ — overflow needs
    * |V| > 10⁷·10⁶/85, ~10¹⁰ nodes.
    *
    * Node ids: customers at custkey·2, suppliers at suppkey·2+1 —
    * disjoint by parity; the output decodes (node_type, key). */
  def pagerank(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val e0 = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"),
        (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("d"))
    var rank = deg.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to PrIters) {
      val contrib = rank.join(deg, "node")
        .select(col("node"), expr("r div d").as("c"))
      rank = edges.join(contrib, edges("u") === contrib("node"))
        .groupBy(col("v").as("node"))
        .agg(expr("150000 + (850000 * sum(c)) div 1000000").as("r"))
    }
    rank
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node div 2").as("key"),
        col("r").as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("node_type"), col("key"))
      .limit(PrTopK)
  }

  def pagerank(spark: SparkSession, dir: String): DataFrame =
    pagerank(Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"))

  val pagerankSql: String = {
    val stages = (1 to PrIters).map { t =>
      s"""r$t AS MATERIALIZED (
         |  SELECT e.v AS node,
         |    150000 + (850000 * CAST(sum(p.r // deg.d) AS BIGINT))
         |      // 1000000 AS r
         |  FROM e JOIN r${t - 1} p ON e.u = p.node
         |    JOIN deg ON e.u = deg.node
         |  GROUP BY e.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS MATERIALIZED (
       |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |deg AS MATERIALIZED (
       |  SELECT u AS node, count(*) AS d FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
       |$stages
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  node // 2 AS key, r AS rank_ppm
       |FROM r$PrIters
       |ORDER BY rank_ppm DESC, node_type, key
       |LIMIT $PrTopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank(_, _)))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql)
}
