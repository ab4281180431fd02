package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C50 PageRank specs: a fully hand-computed 3-node fixture (every
  * round's integer arithmetic checked), hub ordering on the real
  * corpus, and layout invariance. */
class GraphSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("pagerank: hand-computed 3-node bipartite fixture, all rounds exact") {
    import spark.implicits._
    // customers 1, 2 both trade with supplier 1 (one duplicated pair
    // exercises the DISTINCT): nodes c1=2, c2=4, s1=3; edges
    // symmetric. By hand (ppm, floor division at every step):
    //   r1: s1 = 150000 + 850000·(1e6+1e6)//1e6      = 1,850,000
    //       c  = 150000 + 850000·(1e6//2)//1e6       =   575,000
    //   r2: s1 = 150000 + (850000·1,150,000)//1e6    = 1,127,500
    //       c  = 150000 + (850000·(1,850,000//2))//1e6 =  936,250
    //   r3: s1 = 150000 + (850000·1,872,500)//1e6    = 1,741,625
    //       c  = 150000 + (850000·(1,127,500//2))//1e6 = 629,187
    val orders = Seq((10L, 1L), (11L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L), (11L, 1L), (10L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    val res = Graph.pagerank(orders, lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(res === List(
      ("supplier", 1L, 1741625L),
      ("customer", 1L, 629187L),
      ("customer", 2L, 629187L)))
  }

  test("pagerank on the corpus: damping floor holds, top node is a supplier hub") {
    val res = corpusRanks()
    assert(res.length === 20)
    // every rank carries at least the teleport mass
    assert(res.forall(_._3 >= 150000L))
    // the bipartite trade graph is customer-heavy (150 customers, 10
    // suppliers at sf0.001), so rank concentrates on supplier hubs
    assert(res.head._1 === "supplier")
    // total order: (rank desc, type, key) strictly sorted
    val keys = res.map(r => (-r._3, r._1, r._2))
    assert(keys === keys.sorted)
  }

  private def corpusRanks() =
    Graph.pagerank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList

  test("pagerank is layout-invariant") {
    import graft.Tables
    val base = Graph.pagerank(spark, dir).collect().toSeq
    val shuffled = Graph.pagerank(
      Tables(spark, dir, "orders").repartition(7),
      Tables(spark, dir, "lineitem").repartition(5)).collect().toSeq
    assert(base === shuffled)
  }
}
