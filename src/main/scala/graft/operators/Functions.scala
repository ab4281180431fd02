package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Oracle-checked query entries for the reference's scalar-function
  * surface (SURVEY.md §2 A7–A13), exercised over the documents table.
  *
  * Oracle strategy (SURVEY.md §5): `dd_array_contains_all` maps exactly
  * to DuckDB's `list_has_all`; bloom queries use the prefilter + exact
  * re-verification shape, which is result-identical to the exact
  * predicate by construction (a bloom "maybe" is always re-checked, a
  * bloom "no" is always correct) — so the same `list_has_all` oracle
  * applies. `dd_search` is an always-true marker, so its oracle is the
  * unfiltered scan. `dd_login` is pinned to a fixed clock, making the
  * minted token a pure function of its inputs; the oracle asserts the
  * decoded claims. */
object Functions {

  private val Needles = Seq("data", "the")
  private val MissingNeedles = Seq("data", "zzz_never_present")

  private def docsWithToks(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
  }

  private def arr(ss: Seq[String]) = array(ss.map(lit(_)): _*)
  private def sqlList(ss: Seq[String]) = ss.map("'" + _ + "'").mkString("[", ",", "]")

  // ------------------------------------------------------------ A9
  def arrayContainsAll(spark: SparkSession, dir: String): DataFrame =
    docsWithToks(spark, dir).select(
      col("doc_id"),
      GraftFunctions.dd_array_contains_all(col("toks"), arr(Needles)).as("has_all"),
      GraftFunctions.dd_array_contains_all(col("toks"), arr(MissingNeedles)).as("has_missing"))

  val arrayContainsAllSql: String =
    s"""SELECT doc_id,
       |  list_has_all(string_split(text, ' '), ${sqlList(Needles)}) AS has_all,
       |  list_has_all(string_split(text, ' '), ${sqlList(MissingNeedles)}) AS has_missing
       |FROM documents""".stripMargin

  // ------------------------------------------------------- A10–A12
  /** Bloom prefilter + exact re-verify: result-identical to exact
    * membership, exercising create/contains/contains_all end-to-end on a
    * per-row blob over the token array. */
  def bloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    val d = docsWithToks(spark, dir)
      .withColumn("bloom", GraftFunctions.dd_bloom_filter_create(col("toks")))
    d.select(
      col("doc_id"),
      GraftFunctions.dd_array_contains_all(col("toks"), arr(Needles), col("bloom")).as("has_all"),
      GraftFunctions.dd_array_contains_all(col("toks"), arr(MissingNeedles), col("bloom")).as("has_missing"))
  }

  val bloomPrefilterSql: String = arrayContainsAllSql

  // ------------------------------------------------------------ A8
  /** dd_search filters nothing locally (always-true pushdown marker). */
  def search(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val d = Tables(spark, dir, "documents")
    d.filter(GraftFunctions.dd_search(col("lang"), arr(Seq("en", "fr"))))
      .select(col("doc_id"), col("lang"))
  }

  val searchSql: String = "SELECT doc_id, lang FROM documents"

  // ------------------------------------------------------------ A13
  def version(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    spark.sql("SELECT dd_version() AS version")
  }

  val versionSql: String = s"SELECT '${GraftFunctions.Version}' AS version"

  // ------------------------------------------------------------- A7
  /** dd_login with the mint time pinned via the URL's `clock` query
    * parameter (scoped to this call — no process-global clock mutation,
    * and it holds at execution time no matter when the lazy plan runs);
    * the minted JWT is decoded back with pure SQL (base64url → JSON) so
    * the whole pipeline stays declarative and the claims are
    * oracle-checkable constants. */
  def login(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val tok = spark.sql(
      """SELECT dd_login('local://auth?clock=1700000000', 'admin', 'admin',
        |  '{"database":"demo_catalog","schema":"main","table":"transaction"}') AS token""".stripMargin)
    val payloadB64 = element_at(split(col("token"), "\\."), 2)
    val padded = concat(translate(payloadB64, "-_", "+/"),
      expr("repeat('=', (4 - length(split_part(token, '.', 2)) % 4) % 4)"))
    val payload = decode(unbase64(padded), "UTF-8")
    tok.select(
      substring(col("token"), 1, 2).as("token_prefix"),
      get_json_object(payload, "$.sub").as("sub"),
      get_json_object(payload, "$.claims.database").as("db"),
      get_json_object(payload, "$.claims.table").as("tbl"),
      get_json_object(payload, "$.exp").cast("long").as("exp"))
  }

  val loginSql: String =
    """SELECT 'ey' AS token_prefix, 'admin' AS sub, 'demo_catalog' AS db,
      |       'transaction' AS tbl, CAST(1700003600 AS BIGINT) AS exp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_array_contains_all" -> arrayContainsAll _,
    "fn_bloom_prefilter" -> bloomPrefilter _,
    "fn_search" -> search _,
    "fn_version" -> version _,
    "fn_login" -> login _)

  val oracles: Map[String, String] = Map(
    "fn_array_contains_all" -> arrayContainsAllSql,
    "fn_bloom_prefilter" -> bloomPrefilterSql,
    "fn_search" -> searchSql,
    "fn_version" -> versionSql,
    "fn_login" -> loginSql)
}
