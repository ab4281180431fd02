package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The arrow-endpoint contract (SURVEY.md §2 A1): the Spark-first
  * re-expression of the reference's remote Arrow-IPC server surface
  * (`dd_read_arrow(url, sql|table, …)` in
  * /root/reference/src/scanner/read_arrow_dd.cpp plus the `/plan` split
  * API in /root/reference/src/http/split_info.cpp).
  *
  * An endpoint can describe a table, plan a split set for a scan, and
  * stream each split back as Arrow IPC record-batch messages. The only
  * in-repo implementation is [[LocalParquetEndpoint]] (zero egress); an
  * HTTP implementation would speak the same trait over the reference's
  * REST protocol.
  */
trait Endpoint extends Serializable {
  /** Table schema, as Spark types. */
  def schema(table: String): StructType

  /** Plan the scan: one [[SplitInfo]] per parallel unit, row-group
    * aligned, each targeting ≤ splitSizeBytes of on-disk data (the
    * reference's `split_size` named parameter). */
  def plan(table: String, query: QuerySpec, splitSizeBytes: Long): Seq[SplitInfo]

  /** Stream one split as Arrow IPC record-batch message bytes. The
    * caller MUST close() the stream (Spark does, via
    * PartitionReader.close) — exhaustion also releases resources, but
    * early-terminated scans (limit/take/cancelled tasks) only release
    * through close(). */
  def scan(split: SplitInfo, query: QuerySpec): IpcStream

  /** Stream the partial-aggregate row for one split (aggregation
    * pushdown, reference optimizer/aggregation_pushdown.cpp: partials
    * are merged across splits by the caller — here, by Spark's final
    * aggregation). */
  def scanAgg(split: SplitInfo, query: QuerySpec, agg: AggSpec): IpcStream
}

/** Token-enforcing endpoint decorator — the server side of the
  * reference's `auth_token` named parameter (read_arrow_dd.cpp:309-363
  * sends the token with every HTTP request; the server rejects
  * missing/invalid/expired ones). Verification happens on EVERY request
  * — schema, plan, and each split scan — and on whichever node runs it:
  * the token and secret ship with the serialized endpoint exactly like
  * the reference attaches them to each split request. */
class AuthEndpoint(inner: Endpoint, secret: String,
                   token: Option[String]) extends Endpoint {
  private def check(): Unit =
    token.flatMap(t =>
      graft.functions.Jwt.verify(t, secret, System.currentTimeMillis() / 1000))
      .getOrElse(throw new SecurityException(
        "graft-arrow: missing, invalid, or expired auth token"))

  override def schema(table: String): StructType = { check(); inner.schema(table) }
  override def plan(table: String, query: QuerySpec, splitSizeBytes: Long): Seq[SplitInfo] = {
    check(); inner.plan(table, query, splitSizeBytes)
  }
  override def scan(split: SplitInfo, query: QuerySpec): IpcStream = {
    check(); inner.scan(split, query)
  }
  override def scanAgg(split: SplitInfo, query: QuerySpec, agg: AggSpec): IpcStream = {
    check(); inner.scanAgg(split, query, agg)
  }
}

/** An Arrow-IPC message stream that owns upstream resources (open
  * parquet readers here; an HTTP response there). close() is idempotent
  * and safe at any point of consumption. */
trait IpcStream extends Iterator[Array[Byte]] with AutoCloseable

object IpcStream {
  def apply(it: Iterator[Array[Byte]], onClose: () => Unit): IpcStream =
    new IpcStream {
      private val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
      override def hasNext: Boolean = it.hasNext
      override def next(): Array[Byte] = it.next()
      override def close(): Unit = if (closed.compareAndSet(false, true)) onClose()
    }
}

/** What the scan asks of the endpoint: projected columns + filters, both
  * structurally (for execution) and as ANSI SQL (the wire protocol the
  * reference sends to the server — surfaced by `dd_splits`). */
case class QuerySpec(table: String, requiredColumns: Array[String],
                     filters: Array[Filter]) {
  /** The SQL the reference would send over the wire. */
  def toSql: String = {
    val cols = if (requiredColumns.isEmpty) "*" else requiredColumns.mkString(", ")
    val where = FilterSql.toWhere(filters)
    s"SELECT $cols FROM $table$where"
  }
}

/** One pushed aggregate: op ∈ count_star|count|sum|min|max. */
case class AggCall(op: String, column: String)

/** A pushed aggregation: the aggregate calls plus (r8) optional GROUP
  * BY columns — the wire form is standard SQL either way. Grouped
  * pushdown EXCEEDS the reference optimizer's contract (it falls back
  * local on any GROUP BY, aggregation_pushdown.cpp) — divergence
  * recorded in SURVEY §2/A4: the server executes SQL anyway, so
  * declining grouped aggregates would ship raw rows for no reason.
  *
  * `maxGroupsPerSplit` (r9) bounds the endpoint-side hash map: past
  * that many distinct keys in one split, further NEW keys stream
  * through as per-row singleton partials instead of entering the map
  * (Spark's final aggregation merges partial rows for the same key
  * regardless of how many the split emitted, so the degradation is
  * pure perf — worst case the split ships ~one partial per input row,
  * the no-combine shape, with O(cap) endpoint memory). Conf
  * `spark.graft.arrow.maxGroupsPerSplit`. */
case class AggSpec(calls: Seq[AggCall], groupBy: Seq[String] = Nil,
                   maxGroupsPerSplit: Int = AggSpec.DefaultMaxGroupsPerSplit) {
  def toSql(table: String, filters: Array[Filter]): String = {
    val exprs = calls.map {
      case AggCall("count_star", _) => "count(*)"
      case AggCall(op, c) => s"$op($c)"
    }
    val select = (groupBy ++ exprs).mkString(", ")
    val group = if (groupBy.isEmpty) "" else s" GROUP BY ${groupBy.mkString(", ")}"
    s"SELECT $select FROM $table${FilterSql.toWhere(filters)}$group"
  }

  /** The partial-row schema this spec's scanAgg streams: group-by
    * columns first (original names/types), then one partial per
    * aggregate call — the contract Spark's final aggregation merges.
    * Shared by the scan builder and the HTTP server so the wire schema
    * can never drift from the plan's. */
  def outputSchema(fullSchema: StructType): StructType = {
    val byName = fullSchema.fields.map(f => f.name -> f).toMap
    val groupFields = groupBy.map(g =>
      StructField(g, byName(g).dataType, nullable = true))
    val outFields = calls.zipWithIndex.map { case (c, i) =>
      val colType = if (c.op == "count_star") LongType else byName(c.column).dataType
      StructField(s"${c.op}_$i", PartialAgg.outputType(c.op, colType), nullable = true)
    }
    StructType(groupFields ++ outFields)
  }
}

object AggSpec {
  /** ~tens of MB of Acc map at worst — far below a split's raw data,
    * and far above any GROUP BY that benefits from pushdown. */
  val DefaultMaxGroupsPerSplit: Int = 1 << 20
  val MaxGroupsConfKey = "spark.graft.arrow.maxGroupsPerSplit"
}

/** A planned split (reference split_info.cpp / dd_splits.cpp): an
  * endpoint locator plus the row-group range it covers.
  *
  * `file` (r13): when `endpoint` is a remote URL (the HTTP transport),
  * the server-side locator of the part file this split covers — an
  * OPAQUE token the client hands back verbatim with each split fetch,
  * like the reference's descriptor handle. Empty for local endpoints,
  * where `endpoint` itself is the file locator. */
case class SplitInfo(
    endpoint: String,       // locator ("local://<path>" here; URL remotely)
    queryId: Long,
    producerId: String,
    query: String,          // serialized SQL sent to the server
    queryChecksum: String,
    splitId: Int,
    rowGroups: Seq[Int],    // row-group ordinals this split covers
    startByte: Long,        // file range [startByte, endByte) — row-group aligned
    endByte: Long,
    rowCount: Long,
    file: String = "")

/** Spark DSv2 [[Filter]] → ANSI SQL serializer (SURVEY.md §2 A3): the
  * reference serializes pushed filters back to SQL and sends them to the
  * server (read_arrow_dd.cpp; expression-to-SQL also in
  * optimizer/aggregation_pushdown.cpp:44-127). Unsupported filters are
  * simply not serialized — the caller keeps them local. */
object FilterSql {
  def toWhere(filters: Array[Filter]): String = {
    val parts = filters.flatMap(toSql)
    if (parts.isEmpty) "" else parts.mkString(" WHERE ", " AND ", "")
  }

  def toSql(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => Some(s"$a = ${lit(v)}")
    case EqualNullSafe(a, v) => Some(s"$a IS NOT DISTINCT FROM ${lit(v)}")
    case GreaterThan(a, v) => Some(s"$a > ${lit(v)}")
    case GreaterThanOrEqual(a, v) => Some(s"$a >= ${lit(v)}")
    case LessThan(a, v) => Some(s"$a < ${lit(v)}")
    case LessThanOrEqual(a, v) => Some(s"$a <= ${lit(v)}")
    case In(a, vs) => Some(s"$a IN (${vs.map(lit).mkString(", ")})")
    case IsNull(a) => Some(s"$a IS NULL")
    case IsNotNull(a) => Some(s"$a IS NOT NULL")
    case StringStartsWith(a, v) => Some(s"$a LIKE ${lit(v + "%")}")
    case StringEndsWith(a, v) => Some(s"$a LIKE ${lit("%" + v)}")
    case StringContains(a, v) => Some(s"$a LIKE ${lit("%" + v + "%")}")
    case And(l, r) => for (ls <- toSql(l); rs <- toSql(r)) yield s"($ls AND $rs)"
    case Or(l, r) => for (ls <- toSql(l); rs <- toSql(r)) yield s"($ls OR $rs)"
    case Not(c) => toSql(c).map(s => s"(NOT $s)")
    case _ => None
  }

  private def lit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case s: org.apache.spark.unsafe.types.UTF8String => lit(s.toString)
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString.stripSuffix(".0")}'"
    case d: java.sql.Date => s"DATE '$d'"
    case i: java.time.Instant => s"TIMESTAMP '${i.toString.replace("T", " ").stripSuffix("Z")}'"
    case ld: java.time.LocalDate => s"DATE '$ld'"
    case ldt: java.time.LocalDateTime => s"TIMESTAMP '${ldt.toString.replace("T", " ")}'"
    case other => other.toString
  }
}
