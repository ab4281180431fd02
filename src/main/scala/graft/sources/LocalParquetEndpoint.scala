package graft.sources

import java.util.Locale

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ArrowBridge
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** The in-process Arrow endpoint over a directory of parquet tables —
  * the zero-egress stand-in for a DazzleDuck server (SURVEY.md §6): it
  * executes the pushed projection + filters against
  * `<dir>/<table>.parquet` and streams Arrow IPC record batches, just
  * like the reference server answers `dd_read_arrow`'s HTTP query.
  *
  * Pushdown is real, not cosmetic: the projection becomes the parquet
  * requested-schema (unread columns are never decoded), filters become
  * parquet FilterPredicates (row groups are skipped on statistics and
  * records filtered at read), and splits are row-group byte ranges so N
  * splits decode disjoint data — the same parallel-split contract as the
  * reference's `/plan` API (split_info.cpp).
  */
class LocalParquetEndpoint(dir: String) extends Endpoint {

  import LocalParquetEndpoint.CancelCheckRows

  private def tablePath(table: String) = new Path(s"$dir/$table.parquet")

  @transient private lazy val hadoopConf = new Configuration()

  /** A table is a single parquet file OR a directory of part files (the
    * realistic at-scale layout — a 100 TB table is tens of thousands of
    * part files, and splits parallelize across all of them). Part files
    * must share one schema, like any parquet table. Deterministic
    * name-sorted order so split ids are stable. */
  private def partFiles(table: String): Seq[Path] = {
    val p = tablePath(table)
    val fs = p.getFileSystem(hadoopConf)
    if (fs.getFileStatus(p).isDirectory) {
      val parts = fs.listStatus(p).toSeq.map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .sortBy(_.getName.toString)
      require(parts.nonEmpty,
        s"graft-arrow: table '$table' at $p is a directory with no part files" +
          " (aborted write?)")
      parts
    } else Seq(p)
  }

  private def footerOf(file: Path) = {
    val in = HadoopInputFile.fromPath(file, hadoopConf)
    val r = ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  private def fileSchema(file: Path): MessageType =
    footerOf(file).getFileMetaData.getSchema

  /** The table schema (from the first part file). */
  private def tableSchema(table: String): MessageType =
    fileSchema(partFiles(table).head)

  override def schema(table: String): StructType =
    ArrowBridge.parquetToSparkSchema(tableSchema(table), hadoopConf)

  // ------------------------------------------------------------- plan
  override def plan(table: String, query: QuerySpec,
                    splitSizeBytes: Long): Seq[SplitInfo] = {
    val sql = query.toSql
    val checksum = java.security.MessageDigest.getInstance("MD5")
      .digest(sql.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val queryId = java.util.UUID.nameUUIDFromBytes(sql.getBytes("UTF-8"))
      .getMostSignificantBits.abs
    var sid = 0
    partFiles(table).flatMap { file =>
      val blocks = footerOf(file).getBlocks.asScala.toSeq
      // greedily pack consecutive row groups into ≤ splitSizeBytes
      // splits; splits never span files (byte ranges are per-file)
      val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[Int]]
      var current = Vector.empty[Int]
      var currentBytes = 0L
      blocks.zipWithIndex.foreach { case (b, i) =>
        if (current.nonEmpty && currentBytes + b.getCompressedSize > splitSizeBytes) {
          groups += current; current = Vector.empty; currentBytes = 0L
        }
        current = current :+ i
        currentBytes += b.getCompressedSize
      }
      if (current.nonEmpty) groups += current
      groups.map { rgs =>
        val bs = rgs.map(blocks(_))
        sid += 1
        SplitInfo(
          endpoint = s"local://$file",
          queryId = queryId,
          producerId = "graft-local",
          query = sql,
          queryChecksum = checksum,
          splitId = sid - 1,
          rowGroups = rgs,
          startByte = bs.map(_.getStartingPos).min,
          endByte = bs.map(b => b.getStartingPos + b.getCompressedSize).max,
          rowCount = bs.map(_.getRowCount).sum)
      }.toSeq
    }
  }

  // ------------------------------------------------------------- scan
  override def scan(split: SplitInfo, query: QuerySpec): IpcStream = {
    val (rows, sparkSchema, close) = readRows(split, query)
    IpcStream(ArrowBridge.toIpc(rows, sparkSchema), close)
  }

  override def scanAgg(split: SplitInfo, query: QuerySpec,
                       agg: AggSpec): IpcStream = {
    // STRICT filtering contract (r14): a raw scan may under-filter (the
    // client re-evaluates residuals — the DSv2 contract), but a partial
    // AGGREGATE over under-filtered rows is silently wrong, so every
    // filter must translate to an exact parquet record predicate here
    // or the request is refused loudly.
    val fsch = fileSchema(new Path(split.endpoint.stripPrefix("local://")))
    val unapplied = query.filters.filterNot(ParquetFilters.translatable(_, fsch))
    if (unapplied.nonEmpty) throw new UnsupportedOperationException(
      s"graft-arrow: aggregate pushdown requires exactly-applicable filters; " +
        s"cannot apply: ${unapplied.mkString(", ")}")
    val aggCols = agg.calls.collect { case AggCall(op, c) if op != "count_star" => c }.distinct
    val cols = (agg.groupBy ++ aggCols.filterNot(agg.groupBy.contains)).toSeq
    val (rows, sparkSchema, close) = readRows(split, query.copy(requiredColumns = cols.toArray))
    val idx = cols.zipWithIndex.toMap
    val fieldIdx = agg.calls.map(c => if (c.op == "count_star") -1 else idx(c.column))
    val types = agg.calls.zip(fieldIdx).map {
      case (AggCall("count_star", _), _) => LongType
      case (AggCall("count", _), _) => LongType
      case (AggCall(_, _), i) => sparkSchema.fields(i).dataType
    }
    val aggFields = agg.calls.zip(types).zipWithIndex.map {
      case ((c, t), i) => StructField(s"${c.op}_$i", PartialAgg.outputType(c.op, t), nullable = true)
    }
    if (agg.groupBy.isEmpty) {
      // compute consumes the rows eagerly, so the reader is exhausted
      // and released here; the explicit close is the cancellation path
      val acc = try PartialAgg.compute(rows, agg.calls, fieldIdx, types) finally close()
      IpcStream(ArrowBridge.toIpc(Iterator.single(acc), StructType(aggFields)), () => ())
    } else {
      // grouped partials (r8): key columns lead the projection, so key
      // ordinal i reads field i; one row per distinct key in the split
      // up to the r9 cap, then streamed singleton partials. The
      // iterator is lazy over the reader, so the close rides the
      // IpcStream like a raw scan (exhaustion or caller close)
      val keyIdx = agg.groupBy.indices
      val keyTypes = keyIdx.map(sparkSchema.fields(_).dataType)
      val grouped = PartialAgg.computeGrouped(rows, agg.calls, fieldIdx, types,
        keyIdx, keyTypes, agg.maxGroupsPerSplit)
      val outSchema = StructType(
        agg.groupBy.zip(keyTypes).map { case (g, t) => StructField(g, t, nullable = true) } ++
        aggFields)
      IpcStream(ArrowBridge.toIpc(grouped, outSchema), close)
    }
  }

  /** Read the split's records with projection + filter applied by the
    * parquet layer itself. The third element closes the underlying
    * parquet reader (idempotent — exhaustion also triggers it).
    *
    * Filters may reference columns OUTSIDE the projection (the DSv2
    * client always projects filter columns for re-evaluation, but a
    * hand-built HTTP client need not): those columns are ADDED to the
    * parquet read schema — a record filter over an unread column sees
    * null and silently drops every row — and stripped from the emitted
    * rows (r14). Zero cost on the common path (no extra refs → no
    * per-row work). */
  private def readRows(split: SplitInfo, query: QuerySpec): (Iterator[InternalRow], StructType, () => Unit) = {
    // the split locator carries the part file it covers (splits never
    // span files); the schema is per-file but uniform across the table
    val file = new Path(split.endpoint.stripPrefix("local://"))
    val fs = fileSchema(file)
    // columns the translated record filter needs but the projection lacks
    val extraRefs: Array[String] =
      if (query.requiredColumns.isEmpty) Array.empty
      else query.filters
        .filter(f => ParquetFilters.translatable(f, fs))
        .flatMap(_.references)
        .distinct
        .filterNot(query.requiredColumns.contains)
        .filter(fs.containsField)
    val readCols = query.requiredColumns ++ extraRefs
    val projected: MessageType =
      if (query.requiredColumns.isEmpty) Types.buildMessage().named(fs.getName)
      else {
        val b = Types.buildMessage()
        readCols.foreach(c => b.addField(fs.getType(fs.getFieldIndex(c))))
        b.named(fs.getName)
      }
    val readSchema = ArrowBridge.parquetToSparkSchema(
      if (query.requiredColumns.isEmpty) fs else projected, hadoopConf)
    // the emitted schema: extras (appended last) stripped back off
    val sparkSchema =
      if (extraRefs.isEmpty) readSchema
      else StructType(readSchema.fields.dropRight(extraRefs.length))
    val conf = new Configuration(hadoopConf)
    if (query.requiredColumns.nonEmpty)
      conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
    var builder = ParquetReader.builder(new GroupReadSupport(), file)
      .withConf(conf)
      .withFileRange(split.startByte, split.endByte)
    ParquetFilters.translate(query.filters, fs)
      .foreach(p => builder = builder.withFilter(FilterCompat.get(p)))
    val reader = builder.build()
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val closeOnce: () => Unit = () => if (closed.compareAndSet(false, true)) reader.close()
    val conv = new GroupRowConverter(
      if (query.requiredColumns.isEmpty) fs else projected, readSchema)
    val nOut = sparkSchema.length
    // Mid-stream cancellation (the reference runs a cancel monitor that
    // aborts in-flight HTTP streams — src/http/cancel_monitor.cpp): a
    // killed Spark task stops consuming promptly instead of finishing
    // its split. Checked every CancelCheckRows records so the hot path
    // stays a counter increment; PartitionReader.close releases the
    // reader either way.
    val ctx = org.apache.spark.TaskContext.get()
    val it = new Iterator[InternalRow] {
      private var nextGroup: Group = reader.read()
      private var sinceCheck = 0
      override def hasNext: Boolean = {
        if (ctx != null) {
          sinceCheck += 1
          if (sinceCheck >= LocalParquetEndpoint.CancelCheckRows) {
            sinceCheck = 0
            if (ctx.isInterrupted()) {
              closeOnce()
              throw new org.apache.spark.TaskKilledException(
                "graft-arrow scan cancelled")
            }
          }
        }
        if (nextGroup == null) closeOnce()
        nextGroup != null
      }
      override def next(): InternalRow = {
        val g = nextGroup
        nextGroup = reader.read()
        val row = conv.convert(g)
        if (extraRefs.isEmpty) row
        else {
          // strip the filter-only columns (appended last by readCols)
          val vals = new Array[Any](nOut)
          var j = 0
          while (j < nOut) { vals(j) = row.get(j, sparkSchema.fields(j).dataType); j += 1 }
          new GenericInternalRow(vals)
        }
      }
    }
    (it, sparkSchema, closeOnce)
  }
}

object LocalParquetEndpoint {
  /** Rows between task-interrupt checks in the scan hot loop. */
  val CancelCheckRows = 1024
}

/** Spark [[Filter]] → parquet [[FilterPredicate]]. Conservative: only
  * types with unambiguous value mapping are translated (int32/int64/
  * float/double/string/timestamp); everything else stays a Spark-side
  * filter. Record-level semantics of the translated subset are exact.
  *
  * Timestamps matter most at scale: time ranges are the dominant
  * pruning predicate of a 100 TB log/fact table, and translating them
  * lets the parquet layer skip row groups on min/max stats instead of
  * shipping every row for Spark to re-filter. Values are rescaled to
  * the column's physical unit (nanos/micros/millis). */
object ParquetFilters {
  def translate(filters: Array[Filter], schema: MessageType): Option[FilterPredicate] = {
    val ps = filters.flatMap(one(_, schema))
    ps.reduceOption(FilterApi.and)
  }

  def translatable(f: Filter, schema: MessageType): Boolean = one(f, schema).isDefined

  private def primitive(schema: MessageType, name: String): Option[PrimitiveType] = {
    if (!schema.containsField(name)) return None
    schema.getType(schema.getFieldIndex(name)) match {
      case p: PrimitiveType if translatableAnnotation(p) => Some(p)
      case _ => None
    }
  }

  /** Annotations whose value ordering matches the physical column's
    * (so FilterApi comparisons are exact): none, string, timestamp
    * (INT64, unit rescaled), date (INT32 epoch-day), signed ints.
    * Unsigned ints and decimals stay Spark-side. */
  private def translatableAnnotation(p: PrimitiveType): Boolean =
    p.getLogicalTypeAnnotation match {
      case null => true
      case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => true
      case _: TimestampLogicalTypeAnnotation => p.getPrimitiveTypeName == INT64
      case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
        p.getPrimitiveTypeName == INT32
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
        p.getPrimitiveTypeName == INT32 && i.isSigned
      case _ => false
    }

  /** Session TZ is UTC engine-wide (Tables/Bench/Verify), so NTZ
    * LocalDateTime values convert at UTC. Returns the value in the
    * COLUMN's unit. */
  private def toEpoch(v: Any, ann: TimestampLogicalTypeAnnotation): Option[java.lang.Long] = {
    val micros: Option[Long] = v match {
      case i: java.time.Instant =>
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case t: java.sql.Timestamp =>
        val i = t.toInstant
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case ldt: java.time.LocalDateTime =>
        Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
      case _ => None
    }
    micros.flatMap { us =>
      ann.getUnit match {
        // lossy/overflowing conversions DECLINE the filter (it stays a
        // Spark-side filter — the documented conservative policy): a
        // truncating us/1000 on a MILLIS column would push e.g.
        // `ts < ...00.0015` as lt(1ms) and drop the 1ms rows before
        // Spark's re-evaluation could see them; NANOS us*1000 overflows
        // Long past ~year 2262 into a negative bound that excludes
        // every row.
        case LogicalTypeAnnotation.TimeUnit.NANOS =>
          try Some(Math.multiplyExact(us, 1000L))
          catch { case _: ArithmeticException => None }
        case LogicalTypeAnnotation.TimeUnit.MICROS => Some(us)
        case LogicalTypeAnnotation.TimeUnit.MILLIS =>
          if (us % 1000L == 0L) Some(us / 1000L) else None
      }
    }.map(java.lang.Long.valueOf)
  }

  private def one(f: Filter, schema: MessageType): Option[FilterPredicate] = f match {
    case EqualTo(a, v) => cmp(schema, a, v, "eq")
    case GreaterThan(a, v) => cmp(schema, a, v, "gt")
    case GreaterThanOrEqual(a, v) => cmp(schema, a, v, "gtEq")
    case LessThan(a, v) => cmp(schema, a, v, "lt")
    case LessThanOrEqual(a, v) => cmp(schema, a, v, "ltEq")
    case In(a, vs) if vs.nonEmpty =>
      val eqs = vs.toSeq.map(v => cmp(schema, a, v, "eq"))
      if (eqs.exists(_.isEmpty)) None else Some(eqs.flatten.reduce(FilterApi.or))
    case And(l, r) => for (lp <- one(l, schema); rp <- one(r, schema)) yield FilterApi.and(lp, rp)
    case Or(l, r) => for (lp <- one(l, schema); rp <- one(r, schema)) yield FilterApi.or(lp, rp)
    case _ => None
  }

  private def cmp(schema: MessageType, name: String, v: Any,
                  op: String): Option[FilterPredicate] = {
    if (v == null) return None
    primitive(schema, name).flatMap { p =>
      try {
        (p.getPrimitiveTypeName, op) match {
          case (INT64, _) =>
            val c = FilterApi.longColumn(name)
            val xOpt = p.getLogicalTypeAnnotation match {
              case ts: TimestampLogicalTypeAnnotation => toEpoch(v, ts)
              case _ => Some(java.lang.Long.valueOf(v.asInstanceOf[Number].longValue()))
            }
            xOpt.map { x =>
              op match {
                case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
                case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
                case "ltEq" => FilterApi.ltEq(c, x)
              }
            }
          case (INT32, _) =>
            val c = FilterApi.intColumn(name)
            val xOpt: Option[java.lang.Integer] = v match {
              case n: Number => Some(java.lang.Integer.valueOf(n.intValue()))
              // DATE columns: Spark hands LocalDate / java.sql.Date
              case d: java.time.LocalDate =>
                Some(java.lang.Integer.valueOf(d.toEpochDay.toInt))
              case d: java.sql.Date =>
                Some(java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt))
              case _ => None
            }
            xOpt.map { x =>
              op match {
                case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
                case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
                case "ltEq" => FilterApi.ltEq(c, x)
              }
            }
          case (DOUBLE, _) =>
            val c = FilterApi.doubleColumn(name)
            val x = java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue())
            Some(op match {
              case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
              case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
              case "ltEq" => FilterApi.ltEq(c, x)
            })
          case (FLOAT, _) =>
            val c = FilterApi.floatColumn(name)
            val x = java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue())
            Some(op match {
              case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
              case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
              case "ltEq" => FilterApi.ltEq(c, x)
            })
          case (BINARY, _) if v.isInstanceOf[String] =>
            val c = FilterApi.binaryColumn(name)
            val x = Binary.fromString(v.asInstanceOf[String])
            Some(op match {
              case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
              case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
              case "ltEq" => FilterApi.ltEq(c, x)
            })
          case _ => None
        }
      } catch { case _: ClassCastException => None }
    }
  }
}

/** parquet example Group → Spark InternalRow for the engine's column
  * repertoire (SURVEY.md §3): int32/int64/float/double/string/bool/
  * timestamp(ns|us|ms)/list-of-float-or-double. */
class GroupRowConverter(mt: MessageType, sparkSchema: StructType) {
  private val fields = mt.getFields.asScala.toArray

  private val getters: Array[(Group, Int) => Any] = fields.zipWithIndex.map { case (f, i) =>
    fieldGetter(f, sparkSchema.fields(i).dataType)
  }.toArray

  private def tsDivisor(ann: LogicalTypeAnnotation): Long = ann match {
    case t: TimestampLogicalTypeAnnotation => t.getUnit match {
      case LogicalTypeAnnotation.TimeUnit.NANOS => 1000L
      case LogicalTypeAnnotation.TimeUnit.MICROS => 1L
      case LogicalTypeAnnotation.TimeUnit.MILLIS => -1000L // multiply
    }
    case _ => 1L
  }

  private def fieldGetter(f: Type, dt: DataType): (Group, Int) => Any = f match {
    case p: PrimitiveType =>
      (p.getPrimitiveTypeName, dt) match {
        case (INT64, TimestampType) | (INT64, TimestampNTZType) =>
          val d = tsDivisor(p.getLogicalTypeAnnotation)
          if (d >= 0) (g, i) => g.getLong(i, 0) / d
          else (g, i) => g.getLong(i, 0) * (-d)
        case (INT64, t: DecimalType) =>
          (g, i) => Decimal(g.getLong(i, 0), t.precision, t.scale)
        case (INT64, _) => (g, i) => g.getLong(i, 0)
        case (INT32, t: DecimalType) =>
          (g, i) => Decimal(g.getInteger(i, 0).toLong, t.precision, t.scale)
        case (INT32, ByteType) => (g, i) => g.getInteger(i, 0).toByte
        case (INT32, ShortType) => (g, i) => g.getInteger(i, 0).toShort
        // DateType is epoch-day int both in parquet and internally
        case (INT32, _) => (g, i) => g.getInteger(i, 0)
        case (DOUBLE, _) => (g, i) => g.getDouble(i, 0)
        case (FLOAT, _) => (g, i) => g.getFloat(i, 0)
        case (BOOLEAN, _) => (g, i) => g.getBoolean(i, 0)
        case (BINARY | FIXED_LEN_BYTE_ARRAY, t: DecimalType) =>
          (g, i) => Decimal(
            new java.math.BigDecimal(
              new java.math.BigInteger(g.getBinary(i, 0).getBytes), t.scale),
            t.precision, t.scale)
        case (BINARY, StringType) | (FIXED_LEN_BYTE_ARRAY, StringType) =>
          (g, i) => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
        case (BINARY, _) | (FIXED_LEN_BYTE_ARRAY, _) =>
          (g, i) => g.getBinary(i, 0).getBytes
        case (other, _) => throw new UnsupportedOperationException(
          s"graft-arrow: unsupported parquet type $other for field ${f.getName}")
      }
    case gt: GroupType =>
      dt match {
        case ArrayType(elemType, _) =>
          // 3-level list encoding: field { repeated group list { element } }
          (g, i) => {
            val lg = g.getGroup(i, 0)
            val n = lg.getFieldRepetitionCount(0)
            val out = new Array[Any](n)
            var k = 0
            while (k < n) {
              val item = lg.getGroup(0, k)
              out(k) =
                if (item.getFieldRepetitionCount(0) == 0) null
                else elemType match {
                  case FloatType => item.getFloat(0, 0)
                  case DoubleType => item.getDouble(0, 0)
                  case LongType => item.getLong(0, 0)
                  case IntegerType => item.getInteger(0, 0)
                  case StringType => UTF8String.fromBytes(item.getBinary(0, 0).getBytes)
                  case t => throw new UnsupportedOperationException(
                    s"graft-arrow: unsupported list element type $t")
                }
              k += 1
            }
            new GenericArrayData(out)
          }
        case t => throw new UnsupportedOperationException(
          s"graft-arrow: unsupported nested type $t for field ${gt.getName}")
      }
  }

  def convert(g: Group): InternalRow = {
    val values = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      values(i) = if (g.getFieldRepetitionCount(i) == 0) null else getters(i)(g, i)
      i += 1
    }
    new GenericInternalRow(values)
  }
}

/** Streaming partial-aggregate computation for aggregation pushdown. */
object PartialAgg {
  /** Spark's expected result type for a pushed aggregate (must line up
    * with the final-aggregation plan Spark builds over the partials). */
  def outputType(op: String, colType: DataType): DataType = op match {
    case "count_star" | "count" => LongType
    case "sum" => colType match {
      case LongType | IntegerType | ShortType | ByteType => LongType
      case d: DecimalType => DecimalType(math.min(38, d.precision + 10), d.scale)
      case _ => DoubleType
    }
    case "min" | "max" => colType
  }

  /** Types this partial-aggregator can fold for the given op; anything
    * else declines pushdown (whole query stays local — the reference's
    * all-or-nothing fallback contract). */
  def supports(op: String, colType: DataType): Boolean = op match {
    case "count_star" | "count" => true
    case "sum" => colType match {
      case LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | _: DecimalType => true
      case _ => false
    }
    case "min" | "max" => ordFor(colType).isDefined
    case _ => false
  }

  private def ordFor(t: DataType): Option[Ordering[Any]] = (t match {
    case LongType | TimestampType | TimestampNTZType => Some(Ordering.Long)
    case IntegerType | DateType => Some(Ordering.Int)
    case ShortType => Some(Ordering.Short)
    case ByteType => Some(Ordering.Byte)
    case BooleanType => Some(Ordering.Boolean)
    case DoubleType => Some(Ordering.Double.TotalOrdering)
    case FloatType => Some(Ordering.Float.TotalOrdering)
    case StringType => Some(Ordering.by[Any, UTF8String](_.asInstanceOf[UTF8String]))
    case _: DecimalType => Some(Ordering.ordered[Decimal].on[Any](_.asInstanceOf[Decimal]))
    case _ => None
  }).asInstanceOf[Option[Ordering[_]]].map(_.asInstanceOf[Ordering[Any]])

  /** Types usable as pushed GROUP BY keys: extracted values carry
    * proper equals/hashCode (UTF8String, Decimal, boxed primitives),
    * so they can key the per-split hash aggregation. */
  def groupable(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType |
         DoubleType | FloatType | StringType | DateType | TimestampType |
         TimestampNTZType | _: DecimalType => true
    case _ => false
  }

  /** One in-flight partial-aggregation state (per split, or per group
    * in the grouped path). */
  private final class Acc(n: Int) {
    val counts = new Array[Long](n)
    val sumsL = new Array[Long](n)
    val sumsD = new Array[Double](n)
    val sumsB = new Array[java.math.BigDecimal](n)
    val mins = new Array[Any](n)
    val maxs = new Array[Any](n)
  }

  private def update(acc: Acc, r: InternalRow, calls: Seq[AggCall],
                     fieldIdx: Seq[Int], types: Seq[DataType],
                     ords: Seq[Ordering[Any]]): Unit = {
    val n = calls.length
    var i = 0
    while (i < n) {
      calls(i).op match {
        case "count_star" => acc.counts(i) += 1
        case "count" => if (!r.isNullAt(fieldIdx(i))) acc.counts(i) += 1
        case "sum" =>
          if (!r.isNullAt(fieldIdx(i))) {
            types(i) match {
              case LongType => acc.sumsL(i) += r.getLong(fieldIdx(i)); acc.counts(i) += 1
              case IntegerType => acc.sumsL(i) += r.getInt(fieldIdx(i)); acc.counts(i) += 1
              case ShortType => acc.sumsL(i) += r.getShort(fieldIdx(i)); acc.counts(i) += 1
              case ByteType => acc.sumsL(i) += r.getByte(fieldIdx(i)); acc.counts(i) += 1
              case DoubleType => acc.sumsD(i) += r.getDouble(fieldIdx(i)); acc.counts(i) += 1
              case FloatType => acc.sumsD(i) += r.getFloat(fieldIdx(i)); acc.counts(i) += 1
              case d: DecimalType =>
                val v = r.getDecimal(fieldIdx(i), d.precision, d.scale).toJavaBigDecimal
                acc.sumsB(i) = if (acc.sumsB(i) == null) v else acc.sumsB(i).add(v)
                acc.counts(i) += 1
              case _ =>
            }
          }
        case "min" | "max" =>
          if (!r.isNullAt(fieldIdx(i))) {
            val v = r.get(fieldIdx(i), types(i))
            val cur = if (calls(i).op == "min") acc.mins(i) else acc.maxs(i)
            val better = cur == null ||
              (calls(i).op == "min" && ords(i).lt(v, cur)) ||
              (calls(i).op == "max" && ords(i).gt(v, cur))
            if (better) {
              if (calls(i).op == "min") acc.mins(i) = v else acc.maxs(i) = v
            }
          }
      }
      i += 1
    }
  }

  private def result(acc: Acc, calls: Seq[AggCall], types: Seq[DataType]): Array[Any] = {
    val n = calls.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = calls(i).op match {
        case "count_star" | "count" => acc.counts(i)
        case "sum" =>
          if (acc.counts(i) == 0) null
          else types(i) match {
            case LongType | IntegerType | ShortType | ByteType => acc.sumsL(i)
            case d: DecimalType =>
              // overflow of the widened precision → null, matching
              // Spark's non-ANSI decimal SUM, instead of throwing
              val ot = outputType("sum", d).asInstanceOf[DecimalType]
              val dec = Decimal(acc.sumsB(i))
              if (dec.changePrecision(ot.precision, ot.scale)) dec else null
            case _ => acc.sumsD(i)
          }
        case "min" => acc.mins(i)
        case "max" => acc.maxs(i)
      }
      i += 1
    }
    out
  }

  private def ordsFor(types: Seq[DataType]): Seq[Ordering[Any]] =
    types.map(t => ordFor(t).getOrElse(
      throw new UnsupportedOperationException(s"agg over $t")))

  def compute(rows: Iterator[InternalRow], calls: Seq[AggCall],
              fieldIdx: Seq[Int], types: Seq[DataType]): InternalRow = {
    val ords = ordsFor(types)
    val acc = new Acc(calls.length)
    rows.foreach(r => update(acc, r, calls, fieldIdx, types, ords))
    new GenericInternalRow(result(acc, calls, types))
  }

  /** Grouped partials (r8, capped r9): one output row per distinct key
    * tuple the hash map holds, key values first then partials. Keys are
    * freshly extracted per row (the reader materializes a new row per
    * record), so map keys are stable.
    *
    * Memory: the map is bounded by `maxGroups` entries, NOT by the
    * split's group cardinality — a near-unique group key would
    * otherwise make the whole split's projection resident at once
    * (boxed keys + an Acc per group), which is WORSE peak memory than
    * streaming the raw split. Past the cap, rows with a NEW key go
    * through a SECONDARY run map (also `maxGroups`-bounded, so peak
    * memory is 2×cap accumulators): same-key overflow rows keep
    * combining there, and when the run fills it flushes as merged
    * partial rows and starts a new run (r10 — the r9 form streamed
    * every new key as a singleton partial, so an adversarial key order
    * that cycled a few hot keys after the cap degraded to one wire row
    * per input row; sort-run merging keeps the wire volume at
    * O(distinct keys) per run window instead). Spark's final
    * aggregation merges however many partials a key produced, so the
    * result is identical under any flush pattern. The returned
    * iterator is LAZY over `rows` — the caller keeps the reader open
    * until it is exhausted or closed. */
  def computeGrouped(rows: Iterator[InternalRow], calls: Seq[AggCall],
                     fieldIdx: Seq[Int], types: Seq[DataType],
                     keyIdx: Seq[Int], keyTypes: Seq[DataType],
                     maxGroups: Int = AggSpec.DefaultMaxGroupsPerSplit): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    require(maxGroups >= 1, s"maxGroups must be >= 1: $maxGroups")
    val ords = ordsFor(types)
    val n = calls.length
    val groups = new java.util.LinkedHashMap[Seq[Any], Acc]()
    val run = new java.util.LinkedHashMap[Seq[Any], Acc]()
    def row(key: Seq[Any], acc: Acc): InternalRow =
      new GenericInternalRow(key.toArray[Any] ++ result(acc, calls, types))
    def drain(m: java.util.LinkedHashMap[Seq[Any], Acc]): Vector[InternalRow] = {
      val out = m.entrySet().iterator().asScala
        .map(e => row(e.getKey, e.getValue)).toVector
      m.clear(); out
    }
    val overflow = rows.flatMap { r =>
      val key: Seq[Any] = keyIdx.zip(keyTypes).map {
        case (i, t) => if (r.isNullAt(i)) null else r.get(i, t)
      }
      val existing = groups.get(key)
      if (existing != null) {
        update(existing, r, calls, fieldIdx, types, ords); Nil
      } else if (groups.size < maxGroups) {
        val acc = new Acc(n); groups.put(key, acc)
        update(acc, r, calls, fieldIdx, types, ords); Nil
      } else {
        // primary cap reached: combine into the bounded secondary run;
        // flush the run as merged partials only when IT fills
        val inRun = run.get(key)
        if (inRun != null) {
          update(inRun, r, calls, fieldIdx, types, ords); Nil
        } else {
          val flushed = if (run.size < maxGroups) Vector.empty else drain(run)
          val acc = new Acc(n); run.put(key, acc)
          update(acc, r, calls, fieldIdx, types, ords)
          flushed
        }
      }
    }
    // `++`'s right operand is BY-NAME: each drain below runs only after
    // everything to its left is exhausted, i.e. after every input row
    // has been consumed — both maps are complete by then
    overflow ++ drain(run).iterator ++ drain(groups).iterator
  }
}
