package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column pipeline (SURVEY.md §2 C8): media as opaque BINARY
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample as a batched mapPartitions stage.
  *
  * ==== STUBBED CODEC ====
  * This container has no image/audio libraries, so `FakeCodec` is a
  * clearly-marked deterministic stand-in: it "decodes" a payload into
  * byte statistics and "samples frames" as fixed-size byte chunks. The
  * Spark-side plumbing is the real thing a production pipeline needs —
  * binary column + metadata struct schema, per-partition batched decode
  * (one codec instance per partition, like a real JNI/FFmpeg handle),
  * and a declarative pre-projection so only the binary column and its
  * metadata reach the decode stage.
  *
  * Scale: decode is a narrow per-partition map — no shuffle; the scan
  * prunes to (doc_id, content, format) before the heavy stage; at 100 TB
  * partition sizing (`maxPartitionBytes`) bounds per-task memory, and a
  * real codec would stream frames rather than materialize them.
  */
object Multimodal {

  /** ==== STUB ==== deterministic fake decoder standing in for a real
    * image/audio codec binding. Same input bytes → same features, on
    * every JVM. */
  object FakeCodec {
    val FrameBytes = 64

    /** "decode" → (n_bytes, byte_sum, mean_byte, n_frames) */
    def decode(payload: Array[Byte]): (Long, Long, Double, Long) = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      val n = payload.length.toLong
      val frames = (n + FrameBytes - 1) / FrameBytes
      (n, sum, if (n == 0) 0.0 else sum.toDouble / n, frames)
    }
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Build the media frame: binary payload + typed metadata. The payload
    * is the document's UTF-8 bytes posing as an opaque blob (the
    * testdata has no real media); metadata derives deterministically.
    * Library form: any frame with `doc_id`, `text`, `lang`, `n_chars`. */
  def mediaFrame(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        concat(lit("img/"), col("lang")).as("format"),
        col("n_chars").as("width"),
        lit(1L).as("height")).as("meta"))

  def mediaFrame(spark: SparkSession, dir: String): DataFrame =
    mediaFrame(Tables(spark, dir, "documents"))

  /** The pipeline: prune → batched per-partition decode → features. */
  def pipeline(documents: DataFrame): DataFrame = {
    val media = mediaFrame(documents)
      .select(col("doc_id"), col("content"), col("meta.format").as("format"))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // one codec instance per partition — the shape a native decoder
      // handle (JNI/FFmpeg/turbojpeg) requires
      val codec = FakeCodec
      rows.map { r =>
        val (n, sum, mean, frames) = codec.decode(r.getAs[Array[Byte]]("content"))
        // mean is emitted RAW: sum and n are exact integers on both
        // engines, so the IEEE quotient is bit-identical — while a
        // round(double, 6) is legal-to-disagree cross-engine at a 6-dp
        // boundary (the r2 pipeline_curate lesson)
        Row(r.getLong(0), r.getString(2), n, sum, mean, frames)
      }
    }(enc)
  }

  def pipeline(spark: SparkSession, dir: String): DataFrame =
    pipeline(Tables(spark, dir, "documents"))

  /** Oracle: the fake codec's arithmetic is expressible in SQL (that's
    * the point of a deterministic stub) — byte stats over the UTF-8
    * payload. The corpus is ASCII so ascii(char) == byte value. */
  val pipelineSql: String =
    """SELECT doc_id,
      |  'img/' || lang AS format,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(list_sum(list_transform(generate_series(1, length(text)),
      |       i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum,
      |  CAST(list_sum(list_transform(generate_series(1, length(text)),
      |       i -> ascii(substr(text, i, 1)))) AS BIGINT)
      |    / CAST(octet_length(encode(text)) AS BIGINT) AS mean_byte,
      |  CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT) AS n_frames
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_pipeline" -> pipeline _)

  val oracles: Map[String, String] = Map(
    "multimodal_pipeline" -> pipelineSql)
}
