package graft.operators

import graft.SparkSpec

/** Plan-shape assertions for the OLAP suite: pushdown reaches the
  * parquet scan, no fact-scale forced broadcasts, top-k avoids global
  * sorts. These encode the 100 TB scale contract, not just correctness. */
class OlapPlanSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def executed(name: String): String =
    Olap.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q2 filter is pushed to the parquet scan") {
    val plan = executed("q2_revenue_filter")
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("l_shipdate"), "shipdate range should reach the scan")
  }

  test("q1 scan prunes to referenced columns only") {
    val plan = executed("q1_pricing_summary")
    assert(!plan.contains("l_comment"), "unreferenced wide column must be pruned")
    assert(plan.contains("ReadSchema"))
  }

  test("q3/q5/q10 have no forced fact-scale broadcast of customer") {
    // AQE may choose broadcast at tiny SF; what must NOT appear is a
    // planner-forced broadcast hint surviving on the customer relation.
    Seq("q3_top_orders", "q5_nation_revenue", "q10_returned_items").foreach { q =>
      val logical = Olap.queries(q)(spark, dir).queryExecution.optimizedPlan.toString
      val forced = logical.linesIterator.filter(_.contains("ResolvedHint"))
        .filter(_.toLowerCase.contains("broadcast")).toSeq
      // hints on dims (supplier/nation/region/part) are fine; customer not
      assert(!forced.exists(_.contains("c_custkey")),
        s"$q: forced broadcast on customer:\n$logical")
    }
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    Seq("q3_top_orders", "q9_top_suppliers", "q10_returned_items").foreach { q =>
      val plan = executed(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q should be partial top-k")
    }
  }

  test("q1 aggregates partially before the shuffle (map-side combine)") {
    val plan = executed("q1_pricing_summary")
    assert(plan.contains("partial_"), "HashAggregate partial mode expected")
  }

  test("q5 star join broadcasts its dimension side") {
    // nation/region (and at this SF customer/supplier too) must come in
    // as broadcast hash joins — a shuffle join on a dim is the classic
    // star-schema scale bug
    val plan = executed("q5_nation_revenue")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dims:\n$plan")
    // Spark renders the node as `SortMergeJoin [leftKeys], [rightKeys]`
    // — scan each SMJ line for a nation join key on EITHER side (the
    // earlier `SortMergeJoin(n_` substring could never match)
    val smjOnNation = plan.linesIterator
      .filter(_.contains("SortMergeJoin"))
      .filter(l => l.contains("n_nationkey") || l.contains("n_regionkey"))
      .toSeq
    assert(smjOnNation.isEmpty,
      s"nation must never shuffle:\n${smjOnNation.mkString("\n")}")
  }
}
