package org.apache.spark.sql.graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** InternalRow ⇄ Arrow-IPC bridge (SURVEY.md §2 A14; reference
  * /root/reference/src/ipc/base_stream_reader.cpp etc.). Each byte[] is
  * one serialized Arrow record-batch IPC message — the unit the
  * reference streams over HTTP. Backed by Spark's own ArrowConverters
  * (private[sql], hence this file's package) so the vector encoding is
  * identical to what Spark uses for its Arrow interchange surfaces. */
object ArrowBridge {
  val MaxRecordsPerBatch = 8192L

  /** Serialize rows to Arrow record-batch messages. */
  def toIpc(rows: Iterator[InternalRow], schema: StructType,
            timeZoneId: String = "UTC"): Iterator[Array[Byte]] =
    ArrowConverters.toBatchIterator(
      rows, schema, MaxRecordsPerBatch, timeZoneId,
      true /*errorOnDuplicatedFieldNames*/, false /*largeVarTypes*/,
      TaskContext.get())

  /** Deserialize Arrow record-batch messages back to rows. */
  def fromIpc(batches: Iterator[Array[Byte]], schema: StructType,
              timeZoneId: String = "UTC"): Iterator[InternalRow] =
    ArrowConverters.fromBatchIterator(
      batches, schema, timeZoneId, true, false, TaskContext.get())

  /** Parquet MessageType → Spark schema, matching spark.read.parquet —
    * except that TIMESTAMP(NANOS) columns (which Spark's native reader
    * rejects outright with PARQUET_TYPE_ILLEGAL, while the reference
    * engine reads them fine) are admitted as micros timestamps; the
    * endpoint's row converter rescales the values. */
  def parquetToSparkSchema(mt: org.apache.parquet.schema.MessageType,
                           conf: org.apache.hadoop.conf.Configuration): StructType =
    new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(org.apache.spark.sql.internal.SQLConf.get)
      .convert(nanosAsMicros(mt))
      // spark.read.parquet relaxes REQUIRED fields to nullable (files
      // merged into one table may disagree); match that convention
      .asNullable.asInstanceOf[StructType]

  /** Rewrite INT64 TIMESTAMP(NANOS) fields to TIMESTAMP(MICROS) so the
    * stock converter accepts them (top-level primitives only — nested
    * timestamps are outside the engine's column repertoire). */
  def nanosAsMicros(mt: org.apache.parquet.schema.MessageType): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val b = Types.buildMessage()
    mt.getFields.asScala.foreach {
      case p: PrimitiveType => p.getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS =>
          b.addField(Types.primitive(p.getPrimitiveTypeName, p.getRepetition)
            .as(LogicalTypeAnnotation.timestampType(t.isAdjustedToUTC,
              LogicalTypeAnnotation.TimeUnit.MICROS))
            .named(p.getName))
        case _ => b.addField(p)
      }
      case g => b.addField(g)
    }
    b.named(mt.getName)
  }
}
