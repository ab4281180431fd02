package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** User-facing surface of the arrow-endpoint source. */
object GraftArrow {
  val Format = "graft.sources.GraftArrowTableProvider"

  /** `dd_read_arrow` equivalent: scan `table` through the endpoint.
    * `split` defaults to TRUE here (parallel row-group-aligned splits —
    * the right Spark contract) even though the raw `split` option and
    * the reference's named parameter default false (single stream per
    * file, read_arrow_dd.cpp:318); pass `split = false` for the
    * reference's non-split scan. */
  def read(spark: SparkSession, dir: String, table: String,
           splitSize: Long = 128L * 1024 * 1024,
           split: Boolean = true): DataFrame =
    spark.read.format(Format)
      .option("dir", dir)
      .option("table", table)
      .option("split_size", splitSize)
      .option("split", split)
      .load()

  /** `dd_read_arrow(url, sql := '…')` equivalent: ship a free-form query
    * to the endpoint's engine, scan its result set in parallel splits
    * (reference read_arrow_dd.cpp:313-345). */
  def readSql(spark: SparkSession, dir: String, sql: String,
              splitSize: Long = 128L * 1024 * 1024,
              split: Boolean = true): DataFrame =
    spark.read.format(Format)
      .option("dir", dir)
      .option("sql", sql)
      .option("split_size", splitSize)
      .option("split", split)
      .load()

  /** `dd_read_arrow(url, table, auth_token := …)` over real HTTP (r13):
    * scan `table` through a [[GraftHttpServer]]-protocol endpoint at
    * `url` — plan fetch, per-split Arrow-IPC streams, Bearer auth, the
    * reference transport end-to-end (arrow_http_client.cpp). */
  def readHttp(spark: SparkSession, url: String, table: String,
               token: Option[String] = None,
               splitSize: Long = 128L * 1024 * 1024,
               split: Boolean = true): DataFrame = {
    val r = spark.read.format(Format)
      .option("url", url)
      .option("table", table)
      .option("split_size", splitSize)
      .option("split", split)
    token.foreach(t => r.option("token", t))
    r.load()
  }

  /** `dd_read_arrow(url, sql := '…', auth_token := …)` over real HTTP:
    * the server executes the query in ITS engine and serves the
    * result's splits. */
  def readHttpSql(spark: SparkSession, url: String, sql: String,
                  token: Option[String] = None,
                  splitSize: Long = 128L * 1024 * 1024,
                  split: Boolean = true): DataFrame = {
    val r = spark.read.format(Format)
      .option("url", url)
      .option("sql", sql)
      .option("split_size", splitSize)
      .option("split", split)
    token.foreach(t => r.option("token", t))
    r.load()
  }

  /** `dd_splits` equivalent (SURVEY.md §2 A6; reference
    * /root/reference/src/table_function/dd_splits.cpp:1-170): expose the
    * split plan the endpoint would hand to a scan — endpoints, query id,
    * serialized query, producer, split size and checksum, plus the
    * row-group range/row count of each split. Driver-side metadata (the
    * reference's table function is too), so a plain createDataFrame. */
  def splits(spark: SparkSession, dir: String, table: String,
             splitSize: Long = 128L * 1024 * 1024,
             columns: Seq[String] = Nil): DataFrame = {
    val endpoint = new LocalParquetEndpoint(dir)
    val cols = if (columns.isEmpty) endpoint.schema(table).fieldNames.toSeq else columns
    splitPlanDf(spark, endpoint.plan(table,
      QuerySpec(table, cols.toArray, Array.empty), splitSize), splitSize)
  }

  /** `dd_splits(url, sql := '…')` (the reference accepts sql here too —
    * dd_splits.cpp:39-63): the split plan over a server-executed query's
    * result set. */
  def splitsSql(spark: SparkSession, dir: String, sql: String,
                splitSize: Long = 128L * 1024 * 1024): DataFrame = {
    val endpoint = new SqlEndpoint(dir, sql)
    val cols = endpoint.schema(null).fieldNames
    splitPlanDf(spark, endpoint.plan(null,
      QuerySpec(s"($sql)", cols, Array.empty), splitSize), splitSize)
  }

  private def splitPlanDf(spark: SparkSession, plan: Seq[SplitInfo],
                          splitSize: Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("endpoints", StringType, nullable = false),
      StructField("query_id", LongType, nullable = false),
      StructField("query", StringType, nullable = false),
      StructField("producer_id", StringType, nullable = false),
      StructField("split_size", LongType, nullable = false),
      StructField("query_checksum", StringType, nullable = false),
      StructField("split_id", LongType, nullable = false),
      StructField("split_rows", LongType, nullable = false)))
    val rows = plan.map(s => Row(s.endpoint, s.queryId, s.query, s.producerId,
      splitSize, s.queryChecksum, s.splitId.toLong, s.rowCount))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
