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

  // ------------------------------------------------ IPC STREAM framing
  // The reference's wire format is the standard Arrow IPC *stream*
  // (schema message, record-batch messages, end-of-stream marker) with
  // Content-Type application/vnd.apache.arrow.stream
  // (/root/reference/src/http/arrow_http_client.cpp:95-100,
  // src/ipc/http_stream_factory.cpp). These helpers frame/unframe that
  // exact format so the loopback HTTP endpoint's body is readable by
  // ANY arrow client, not just this library.

  /** Write a complete Arrow IPC stream: schema message, then each
    * record-batch message (already encapsulated — what [[toIpc]]
    * yields), then the 8-byte end-of-stream marker. */
  def writeIpcStream(schema: StructType, batches: Iterator[Array[Byte]],
                     out: java.io.OutputStream,
                     timeZoneId: String = "UTC"): Unit = {
    import org.apache.arrow.vector.ipc.WriteChannel
    import org.apache.arrow.vector.ipc.message.MessageSerializer
    val ch = new WriteChannel(java.nio.channels.Channels.newChannel(out))
    val arrowSchema = org.apache.spark.sql.util.ArrowUtils.toArrowSchema(
      schema, timeZoneId, errorOnDuplicatedFieldNames = true,
      largeVarTypes = false)
    MessageSerializer.serialize(ch, arrowSchema)
    batches.foreach { b => ch.write(b); out.flush() }
    // end-of-stream: continuation token + zero metadata length
    ch.writeIntLittleEndian(MessageSerializer.IPC_CONTINUATION_TOKEN)
    ch.writeIntLittleEndian(0)
    out.flush()
  }

  /** Read the leading schema message of an Arrow IPC stream, leaving the
    * channel positioned at the first record-batch message. */
  def readStreamSchema(in: java.nio.channels.ReadableByteChannel): StructType = {
    import org.apache.arrow.vector.ipc.ReadChannel
    import org.apache.arrow.vector.ipc.message.MessageSerializer
    org.apache.spark.sql.util.ArrowUtils.fromArrowSchema(
      MessageSerializer.deserializeSchema(new ReadChannel(in)))
  }

  /** Split an Arrow IPC stream into the per-record-batch encapsulated
    * message byte arrays [[fromIpc]] consumes (schema and dictionary
    * messages are skipped by Spark's reader; EOS terminates). */
  def batchesFromStream(in: java.nio.channels.ReadableByteChannel): Iterator[Array[Byte]] =
    ArrowConverters.getBatchesFromStream(in)

  /** [[batchesFromStream]] with TERMINATION enforcement (r15): Spark's
    * splitter treats a bare EOF exactly like the 8-byte end-of-stream
    * marker, so a producer that dies (or cancels) between two messages
    * looks like a short-but-valid stream — at 100 TB that is a
    * silently truncated scan, the worst failure mode there is. This
    * splitter parses the standard IPC framing itself (continuation
    * token, metadata length, flatbuffer `Message` for the body length)
    * and throws if the stream ends without the explicit EOS marker,
    * so truncation is ALWAYS an error, never an answer. Message
    * boundaries and the encapsulated byte form are exactly
    * [[writeIpcStream]]'s (the standard, so any producer works);
    * non-record-batch messages (the leading schema) are skipped like
    * Spark's splitter skips them. */
  def strictBatchesFromStream(
      in: java.nio.channels.ReadableByteChannel): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var pending: Array[Byte] = _
      private var eos = false

      /** Read exactly n bytes, or: clean EOF with zero bytes read and
        * `allowEof` → null; anything else → truncation error. */
      private def readFully(n: Int, allowEof: Boolean): Array[Byte] = {
        val buf = java.nio.ByteBuffer.allocate(n)
        while (buf.hasRemaining) {
          val r = in.read(buf)
          if (r < 0) {
            if (allowEof && buf.position() == 0) return null
            throw new java.io.IOException(
              "graft-http: Arrow IPC stream truncated (EOF without " +
                "end-of-stream marker) — producer died or cancelled")
          }
        }
        buf.array()
      }
      private def intLE(b: Array[Byte], off: Int): Int =
        (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
          ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

      private def advance(): Unit =
        while (pending == null && !eos) {
          val head = readFully(4, allowEof = true)
          if (head == null)
            // EOF at a clean message boundary but WITHOUT the marker:
            // the exact case Spark's splitter silently accepts
            throw new java.io.IOException(
              "graft-http: Arrow IPC stream truncated (EOF without " +
                "end-of-stream marker) — producer died or cancelled")
          val first = intLE(head, 0)
          val (prefix, metaLen) =
            if (first == -1) { // IPC_CONTINUATION_TOKEN
              val lenB = readFully(4, allowEof = false)
              (head ++ lenB, intLE(lenB, 0))
            } else (head, first) // legacy framing (no continuation)
          if (metaLen == 0) eos = true
          else {
            val meta = readFully(metaLen, allowEof = false)
            val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(
              java.nio.ByteBuffer.wrap(meta)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN))
            val bodyLen = msg.bodyLength()
            require(bodyLen <= Int.MaxValue - 8,
              s"IPC message body too large: $bodyLen")
            val body =
              if (bodyLen > 0) readFully(bodyLen.toInt, allowEof = false)
              else Array.empty[Byte]
            if (msg.headerType() ==
                org.apache.arrow.flatbuf.MessageHeader.RecordBatch)
              pending = prefix ++ meta ++ body
            // else: schema/dictionary message — skip, like Spark does
          }
        }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): Array[Byte] = {
        advance()
        if (pending == null) throw new NoSuchElementException("end of stream")
        val b = pending
        pending = null
        b
      }
    }

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
