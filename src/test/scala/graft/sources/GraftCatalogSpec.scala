package graft.sources

import graft.SparkSpec

/** SQL surface through the graft catalog: `SELECT … FROM graft.<table>`
  * resolves to the pushdown-capable arrow source. */
class GraftCatalogSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_test", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_test.dir", dir)
  }

  test("SQL reads a catalog table with pushdown intact") {
    val df = spark.sql(
      "SELECT l_orderkey, l_quantity FROM graft_test.lineitem WHERE l_quantity < 5")
    val expected = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_quantity < 5").count()
    assert(df.count() === expected)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-arrow") && plan.contains("l_quantity < 5.0"),
      s"filter should reach the endpoint:\n$plan")
  }

  test("catalog lists the endpoint tables; missing table errors cleanly") {
    val tables = spark.sql("SHOW TABLES IN graft_test")
      .collect().map(_.getString(1)).toSet
    assert(tables.contains("lineitem") && tables.contains("documents"))
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_test.nope").collect()
    }
    assert(err.getMessage.toLowerCase.contains("table"))
  }

  test("joins and aggregates work across catalog tables") {
    val df = spark.sql(
      """SELECT n_name, count(*) AS n
        |FROM graft_test.customer c JOIN graft_test.nation n
        |  ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin)
    assert(df.count() === 3)
  }
}
