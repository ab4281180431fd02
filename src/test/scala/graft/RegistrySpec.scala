package graft

/** Driver-contract integrity: the gates only bind if the registries
  * stay aligned. A `queries` entry without an `oracleSql` twin silently
  * downgrades to a rows-only check on the driver — this spec makes that
  * downgrade a loud local failure instead. */
class RegistrySpec extends SparkSpec {

  test("every query entry has an oracle (no silent rows-only downgrades)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"entries with no oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty,
      s"oracles with no entry: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("the flagship entry returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL texts are non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.trim.stripSuffix(";").contains(";"),
        s"$name: oracle must be a single statement")
    }
  }
}
