package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Free-form `sql :=` mode of the graft-arrow source (SURVEY.md §2 A1;
  * reference /root/reference/src/scanner/read_arrow_dd.cpp:313-345:
  * `dd_read_arrow(url, sql := '…')` ships an arbitrary query to the
  * server, which executes it and streams the result — the client scans
  * the server's result set, not a named table).
  *
  * In-process analogue: the "server side" executes the query ONCE in an
  * isolated `SparkSession.newSession()` (its own temp-view namespace
  * over the endpoint directory's tables — the local stand-in for the
  * remote server's query engine) and materializes the result as parquet
  * under the JVM temp dir, keyed by md5(dir, sql). From there the whole
  * table machinery is inherited unchanged: row-group-aligned splits,
  * projection/filter/aggregation pushdown — i.e. the client scans the
  * server-held result in parallel splits, the remote contract.
  *
  * Scale posture: only driver-side schema()/plan() trigger the one-time
  * server execution; executors never do — scan()/scanAgg() resolve the
  * part file from SplitInfo.endpoint alone (inherited behavior). On a
  * real deployment the materialized result lives server-side and this
  * class is replaced by the HTTP endpoint speaking the same trait.
  */
class SqlEndpoint(dir: String, sqlQuery: String)
    extends LocalParquetEndpoint(SqlEndpoint.cacheRoot) {
  private val key = SqlEndpoint.key(dir, sqlQuery)

  override def schema(ignored: String): StructType = {
    SqlEndpoint.materialize(dir, sqlQuery)
    super.schema(key)
  }

  override def plan(ignored: String, query: QuerySpec,
                    splitSizeBytes: Long): Seq[SplitInfo] = {
    SqlEndpoint.materialize(dir, sqlQuery)
    super.plan(key, query, splitSizeBytes)
  }
}

object SqlEndpoint {
  /** Server-side result cache. Deterministic (not per-process random) so
    * repeated reads of the same (dir, sql) across sessions reuse the
    * materialized result instead of re-executing. */
  val cacheRoot: String =
    new java.io.File(System.getProperty("java.io.tmpdir"), "graft-sql-cache")
      .getAbsolutePath

  /** Key = md5(dir, sql, each table file's (name, length, mtime)): a
    * rewritten table invalidates the cached result instead of serving
    * stale rows - the reference server has no result cache to go stale
    * (it re-executes per request), so staleness here would be behavior
    * the contract doesn't allow. Directory tables hash the directory
    * entry's own length/mtime (updated on any part-file change). */
  def key(dir: String, sql: String): String = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(new Configuration())
    val state = fs.listStatus(dirPath)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName.toString)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest((dir + "\u0000" + sql + "\u0000" + state).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  // per-JVM single-flight: computeIfAbsent blocks concurrent readers of
  // the same (dir, sql) until the first materialization finishes
  private val done = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Execute `sql` against the directory's tables and persist the result
    * as `<cacheRoot>/<key>.parquet` (a directory of part files — the
    * layout [[LocalParquetEndpoint.partFiles]] already splits across).
    * Idempotent: a completed materialization (_SUCCESS marker) is never
    * re-run; a partial one (crash mid-write) is overwritten. */
  def materialize(dir: String, sql: String): Unit = {
    done.computeIfAbsent(key(dir, sql), k => {
      val out = new Path(s"$cacheRoot/$k.parquet")
      val fs = out.getFileSystem(new Configuration())
      if (!fs.exists(new Path(out, "_SUCCESS"))) {
        val server = SparkSession.active.newSession()
        // our endpoint reads INT64 timestamps only (no INT96)
        server.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        server.conf.set("spark.sql.session.timeZone", "UTC")
        // the reference server has its extension loaded, so shipped sql
        // may call dd_* functions — mirror that on the server session
        graft.functions.GraftFunctions.register(server)
        val dirPath = new Path(dir)
        val dfs = dirPath.getFileSystem(new Configuration())
        dfs.listStatus(dirPath).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") &&
            !p.getName.startsWith("_") && !p.getName.startsWith("."))
          .foreach { p =>
            // views go through the graft-arrow source, not
            // spark.read.parquet: the server reads its own tables with
            // its own scanner (which also handles TIMESTAMP(NANOS)
            // files Spark's native reader rejects), and the executed
            // query benefits from the same pushdown as a table scan
            GraftArrow.read(server, dir, p.getName.stripSuffix(".parquet"))
              .createOrReplaceTempView(p.getName.stripSuffix(".parquet"))
          }
        server.sql(sql).write.mode("overwrite").parquet(out.toString)
      }
      k
    })
    ()
  }
}
