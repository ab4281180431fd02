package graft.functions

import org.apache.spark.sql.Row

import graft.SparkSpec

/** SQL-surface spec for the registered dd_* functions, mirroring the
  * reference's sqllogictests: test/sql/bloom_filter.test,
  * test/sql/array_contains_all.test, test/sql/dd_search.test. */
class DdFunctionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)

  test("GraftExtensions injects the full function surface at session build") {
    val names = org.apache.spark.sql.graft.ExtensionProbe
      .injectedFunctionNames(new graft.GraftExtensions)
    assert(GraftFunctions.builders.map(_._1).toSet.subsetOf(names))
  }

  // ------------------------------------------------- bloom_filter.test
  test("bloom create returns non-empty blob") {
    assert(one("octet_length(dd_bloom_filter_create(array('a','b','c'))) > 0") === true)
  }

  test("bloom contains: element exists / does not exist") {
    assert(one("dd_bloom_filter_contains(dd_bloom_filter_create(array('apple','banana','cherry')), 'banana')") === true)
    assert(one("dd_bloom_filter_contains(dd_bloom_filter_create(array('apple','banana','cherry')), 'orange')") === false)
  }

  test("bloom contains_all: subset true / miss false / empty needle true") {
    assert(one("dd_bloom_filter_contains_all(dd_bloom_filter_create(array('a','b','c','d','e')), array('a','b','c'))") === true)
    assert(one("dd_bloom_filter_contains_all(dd_bloom_filter_create(array('a','b','c')), array('a','x'))") === false)
    assert(one("dd_bloom_filter_contains_all(dd_bloom_filter_create(array('a','b','c')), array())") === true)
  }

  test("bloom custom bits_per_element and num_hash args") {
    assert(one("dd_bloom_filter_contains(dd_bloom_filter_create(array('hello','world'), 20), 'hello')") === true)
    assert(one("dd_bloom_filter_contains(dd_bloom_filter_create(array('hello','world'), 15, 5), 'world')") === true)
  }

  test("bloom null semantics") {
    assert(one("dd_bloom_filter_create(CAST(NULL AS ARRAY<STRING>))") === null)
    assert(one("dd_bloom_filter_contains(CAST(NULL AS BINARY), 'test')") === null)
    assert(one("dd_bloom_filter_contains(dd_bloom_filter_create(array('a','b')), CAST(NULL AS STRING))") === null)
  }

  test("bloom over column references") {
    val rows = spark.sql(
      """SELECT dd_bloom_filter_contains(dd_bloom_filter_create(arr), 'a')
        |FROM VALUES (array('a','b','c')), (array('x','y','z')) AS t(arr)""".stripMargin)
      .collect().map(_.get(0)).toSeq
    assert(rows === Seq(true, false))
  }

  test("bloom larger array membership") {
    assert(one("dd_bloom_filter_contains(dd_bloom_filter_create(transform(sequence(1,100), x -> concat('item_', x))), 'item_50')") === true)
    assert(one("dd_bloom_filter_contains(dd_bloom_filter_create(transform(sequence(1,100), x -> concat('item_', x))), 'item_999')") === false)
  }

  // ------------------------------------------- array_contains_all.test
  test("array_contains_all basics") {
    assert(one("dd_array_contains_all(array('a','b','c','d','e'), array('a','b','c'))") === true)
    assert(one("dd_array_contains_all(array('a','b','c'), array('a','x'))") === false)
    assert(one("dd_array_contains_all(array('a','b','c'), array())") === true)
    assert(one("dd_array_contains_all(array(), array('a','b'))") === false)
    assert(one("dd_array_contains_all(array(), array())") === true)
    assert(one("dd_array_contains_all(array('a','b','c'), array('a','a','b'))") === true)
    assert(one("dd_array_contains_all(array('Apple','Banana'), array('apple'))") === false)
  }

  test("array_contains_all null semantics") {
    assert(one("dd_array_contains_all(CAST(NULL AS ARRAY<STRING>), array('a'))") === null)
    assert(one("dd_array_contains_all(array('a'), CAST(NULL AS ARRAY<STRING>))") === null)
  }

  test("array_contains_all column references") {
    val rows = spark.sql(
      """SELECT dd_array_contains_all(arr, array('a','b'))
        |FROM VALUES (array('a','b','c')), (array('a','x','y')), (array('b','c','d')) AS t(arr)""".stripMargin)
      .collect().map(_.get(0)).toSeq
    assert(rows === Seq(true, false, false))
  }

  test("array_contains_all boolean mode flag is result-neutral (reference overload)") {
    assert(one("dd_array_contains_all(array('a','b','c'), array('a','b'), true)") === true)
    assert(one("dd_array_contains_all(array('a','b','c'), array('a','b'), false)") === true)
    assert(one("dd_array_contains_all(array('a','b','c'), array('a','x'), true)") === false)
  }

  test("array_contains_all bloom prefilter matches exact result") {
    assert(one(
      """dd_array_contains_all(array('a','b','c'), array('a','b'),
        | dd_bloom_filter_create(array('a','b','c')))""".stripMargin) === true)
    assert(one(
      """dd_array_contains_all(array('a','b','c'), array('a','zz'),
        | dd_bloom_filter_create(array('a','b','c')))""".stripMargin) === false)
  }

  // ------------------------------------------------------ dd_search.test
  test("dd_search is always true (pushdown marker)") {
    assert(one("dd_search('hello', array('a','b','c'))") === true)
    assert(one("dd_search(CAST(NULL AS STRING), array('x'))") === true)
    val rows = spark.sql(
      "SELECT x FROM VALUES (1), (2), (3) AS t(x) WHERE dd_search(x, array(1, 2))")
      .collect().map(_.getInt(0)).toSeq
    assert(rows === Seq(1, 2, 3))
  }

  // ------------------------------------------------------------ version
  test("dd_version returns the library version") {
    assert(one("dd_version()") === GraftFunctions.Version)
  }

  // ----------------------------------------------------- Column surface
  test("Column API mirrors the SQL surface") {
    import org.apache.spark.sql.functions.{array, lit}
    val df = spark.range(1).select(
      GraftFunctions.dd_array_contains_all(
        array(lit("a"), lit("b")), array(lit("a"))).as("r"),
      GraftFunctions.dd_bloom_filter_contains(
        GraftFunctions.dd_bloom_filter_create(array(lit("x"), lit("y"))), lit("x")).as("b"))
    assert(df.head() === Row(true, true))
  }
}
