package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft._

/** Public function surface (Column API + SQL registration) mirroring the
  * reference extension's scalar functions
  * (/root/reference/src/scalar_function). Use `GraftFunctions.register`
  * to expose the `dd_*` names to `spark.sql`.
  */
object GraftFunctions {
  final val Version = "graft-0.1.0"

  import Bridge.{column => toCol, expression => ex}

  def dd_bloom_filter_create(arr: Column): Column =
    toCol(new BloomFilterCreate(ex(arr)))
  def dd_bloom_filter_create(arr: Column, bitsPerElement: Column, numHashFuncs: Column): Column =
    toCol(BloomFilterCreate(ex(arr), ex(bitsPerElement), ex(numHashFuncs)))
  def dd_bloom_filter_contains(blob: Column, value: Column): Column =
    toCol(BloomFilterContains(ex(blob), ex(value)))
  def dd_bloom_filter_contains_all(blob: Column, values: Column): Column =
    toCol(BloomFilterContainsAll(ex(blob), ex(values)))
  def dd_array_contains_all(haystack: Column, needle: Column): Column =
    toCol(new ArrayContainsAll(ex(haystack), ex(needle)))
  def dd_array_contains_all(haystack: Column, needle: Column, bloom: Column): Column =
    toCol(ArrayContainsAll(ex(haystack), ex(needle), ex(bloom)))
  def dd_search(column: Column, values: Column): Column =
    toCol(DdSearch(ex(column), ex(values)))
  def dd_login(url: Column, user: Column, pass: Column): Column =
    toCol(new DdLogin(ex(url), ex(user), ex(pass)))
  def dd_login(url: Column, user: Column, pass: Column, claims: Column): Column =
    toCol(DdLogin(ex(url), ex(user), ex(pass), ex(claims)))
  def dd_version(): Column = lit(Version)

  /** name → expression builder — ONE table shared by per-session
    * registration ([[register]]) and cluster-wide injection
    * ([[graft.GraftExtensions]] via spark.sql.extensions). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dd_bloom_filter_create" -> {
      case Seq(a) => new BloomFilterCreate(a)
      case Seq(a, b) => new BloomFilterCreate(a, b)
      case Seq(a, b, c) => BloomFilterCreate(a, b, c)
      case args => throw new IllegalArgumentException(
        s"dd_bloom_filter_create expects 1-3 args, got ${args.size}")
    },
    "dd_bloom_filter_contains" ->
      { args => BloomFilterContains(args(0), args(1)) },
    "dd_bloom_filter_contains_all" ->
      { args => BloomFilterContainsAll(args(0), args(1)) },
    "dd_array_contains_all" -> {
      case Seq(h, n) => new ArrayContainsAll(h, n)
      case Seq(h, n, b) => ArrayContainsAll(h, n, b)
      case args => throw new IllegalArgumentException(
        s"dd_array_contains_all expects 2-3 args, got ${args.size}")
    },
    "dd_search" -> { args => DdSearch(args(0), args(1)) },
    "dd_login" -> {
      case Seq(u, usr, pw) => new DdLogin(u, usr, pw)
      case Seq(u, usr, pw, c) => DdLogin(u, usr, pw, c)
      case args => throw new IllegalArgumentException(
        s"dd_login expects 3-4 args, got ${args.size}")
    },
    "dd_version" ->
      { _ => Literal(org.apache.spark.unsafe.types.UTF8String.fromString(Version)) },
    // graft-native additions beyond the reference surface
    "graft_poly_fingerprint" -> {
      case Seq(a) => new PolyFingerprint(a)
      case args => throw new IllegalArgumentException(
        s"graft_poly_fingerprint expects 1 arg, got ${args.size}")
    })

  /** Register the dd_* functions in the session's FunctionRegistry so they
    * are callable from SQL, matching the reference's SQL surface. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
