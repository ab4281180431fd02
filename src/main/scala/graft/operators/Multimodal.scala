package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.Tables

/** Multimodal-column pipeline (SURVEY.md §2 C8): media as opaque BINARY
  * columns + typed metadata, with a REAL image decode (javax.imageio —
  * public JDK, no external libs) as a batched mapPartitions stage.
  *
  * The container has no real media files, so the media column is
  * GENERATED deterministically: each document renders as a small
  * grayscale image (pixel (x,y) = (charByte(x) + y) mod 256 over the
  * doc's first ≤64 chars, 4 rows), encoded as actual PNG (even doc_id)
  * or BMP (odd) bytes. The decode stage then parses those real
  * PNG/BMP payloads back with ImageIO and emits integer pixel
  * statistics — byte-exact because both formats are lossless for 8-bit
  * gray, which is what keeps the entry ORACLE-ABLE: the oracle cannot
  * decode a PNG, but it can compute what a correct decoder must yield
  * from the generative rule. A wrong decode (wrong dims, wrong
  * samples, dropped rows) breaks the hash.
  *
  * Scale: encode and decode are narrow per-partition maps — no
  * shuffle; the scan prunes to (doc_id, content, format) before the
  * heavy stage; one codec context per partition is the shape a native
  * decoder handle (JNI/turbojpeg/FFmpeg) requires; at 100 TB
  * `maxPartitionBytes` bounds per-task memory, and frame-sampling
  * codecs would stream rather than materialize.
  */
object Multimodal {

  /** Real JDK image codec: deterministic grayscale render + PNG/BMP
    * encode, and the matching ImageIO decode. Kept driver/executor
    * agnostic (pure functions of bytes) so the same code serves the
    * entry fixture and any caller's real binary column. */
  object ImageCodec {
    val Height = 4
    val MaxWidth = 64

    /** Render a doc's deterministic fixture image and encode it with
      * the REAL ImageIO writer for `fmt` ("png" | "bmp"). Pixel (x,y) =
      * (char x + y) mod 256 (chars past the text pad as 0); width is
      * the text length clamped to [1, 64]. */
    def encode(text: String, fmt: String): Array[Byte] = {
      val len = text.length
      val w = math.max(1, math.min(len, MaxWidth))
      val img = new BufferedImage(w, Height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < Height) {
        var x = 0
        while (x < w) {
          val c = if (x < len) text.charAt(x).toInt else 0
          raster.setSample(x, y, 0, (c + y) % 256)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      require(ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
      bos.toByteArray
    }

    /** Decode any ImageIO-readable payload to its BufferedImage — the
      * single decode the fusion API amortizes across extractors. */
    def decodeImage(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "undecodable media payload")
      img
    }

    /** Decode any ImageIO-readable payload → (width, height,
      * pixel_sum over band 0). Gray stays band 0 even if a decoder
      * surfaces RGB (R=G=B for gray sources). */
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      val img = decodeImage(payload)
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, sum)
    }
  }

  /** One feature over a DECODED image: the output fields it appends and
    * the values it computes from the raster. Extractors compose inside
    * [[decodeFeatures]]'s single per-row decode — the fusion contract:
    * adding a feature never adds a decode. (The decode is the dominant
    * cost of the C8 pipeline — 63.7s of linear codec CPU at sf10 — so
    * a consumer wanting stats AND a histogram must not pay it twice.) */
  trait ImageFeature extends Serializable {
    def fields: Seq[StructField]
    def compute(img: BufferedImage): Seq[Any]
  }

  /** Dimensions + integer pixel statistics (the original C8 features).
    * mean is the RAW IEEE quotient of exact integers (cross-engine
    * bit-identical; round(double, 6) is not — the r2 lesson). */
  object PixelStats extends ImageFeature {
    val fields = Seq(
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("pixel_sum", LongType, nullable = false),
      StructField("mean_pixel", DoubleType, nullable = false))
    def compute(img: BufferedImage): Seq[Any] = {
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      val n = w.toLong * h
      // Seq[Any], NOT Seq(...): mixed Long/Double literals would widen
      // the longs to Double (weak conformance) and break the encoder
      Seq[Any](w.toLong, h.toLong, n, sum, sum.toDouble / n)
    }
  }

  /** Min/max sample value — the contrast-range signal. */
  object PixelRange extends ImageFeature {
    val fields = Seq(
      StructField("pixel_min", LongType, nullable = false),
      StructField("pixel_max", LongType, nullable = false))
    def compute(img: BufferedImage): Seq[Any] = {
      val raster = img.getRaster
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val v = raster.getSample(x, y, 0)
          if (v < mn) mn = v
          if (v > mx) mx = v
          x += 1
        }
        y += 1
      }
      Seq(mn.toLong, mx.toLong)
    }
  }

  /** Four equal-width intensity buckets over [0, 256) — the brightness
    * profile a curation filter thresholds on. Bucket edges assume 8-bit
    * samples; deeper rasters (e.g. 16-bit grayscale PNG, samples up to
    * 65535) are clamped into the top bucket rather than indexing out of
    * bounds — decodeFeatures accepts any ImageIO-readable payload, so
    * the general surface must not throw on depths the generated corpus
    * doesn't exercise. */
  object PixelHistogram extends ImageFeature {
    val fields = (0 until 4).map(b =>
      StructField(s"hist_$b", LongType, nullable = false))
    def compute(img: BufferedImage): Seq[Any] = {
      val raster = img.getRaster
      val counts = new Array[Long](4)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          counts(math.min(raster.getSample(x, y, 0) / 64, 3)) += 1
          x += 1
        }
        y += 1
      }
      counts.toSeq
    }
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint — the
    * image-near-dup primitive: nearest-neighbor 8×8 downsample of the
    * decoded raster, one bit per cell set iff the cell exceeds the
    * 64-cell mean, emitted as two BIGINT halves (`ahash_hi` bits
    * 32–63, `ahash_lo` bits 0–31 — a single BIGINT would need the
    * sign bit, which DuckDB's checked BIGINT `<<` cannot carry).
    * Near-dup images then reduce to a Hamming-distance ≤ t self-join
    * on the hash — the C5/C2 banded-join machinery applied to media,
    * with the hash computed in the SAME one-decode fused pass as any
    * other feature. The mean compare stays integer-exact
    * (`sample·64 > sum`, no division) so the oracle is bit-identical
    * by construction. */
  object PerceptualHash extends ImageFeature {
    val fields = Seq(
      StructField("ahash_hi", LongType, nullable = false),
      StructField("ahash_lo", LongType, nullable = false))
    def compute(img: BufferedImage): Seq[Any] = {
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      val s = new Array[Long](64)
      var k = 0
      while (k < 64) {
        // nearest-neighbor: cell (k%8, k/8) samples the top-left-rule
        // source pixel (floor(cx·w/8), floor(cy·h/8))
        s(k) = raster.getSample(((k % 8) * w) / 8, ((k / 8) * h) / 8, 0)
        k += 1
      }
      val sum = s.sum
      var hi = 0L
      var lo = 0L
      k = 0
      while (k < 64) {
        if (s(k) * 64L > sum) {
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        k += 1
      }
      Seq[Any](hi, lo)
    }
  }

  /** The fusion API: one batched per-partition pass that decodes each
    * payload ONCE and runs every extractor over the shared raster.
    * Input: any frame with `doc_id`, `content` (the opaque binary
    * column), `format`. Downstream consumers compose feature LISTS
    * instead of chaining decode stages — at 100 TB, each extra decode
    * pass over the corpus is the bill this API exists to avoid. */
  def decodeFeatures(media: DataFrame, features: Seq[ImageFeature]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false)) ++
      features.flatMap(_.fields))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("content"), col("format"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = ImageCodec.decodeImage(r.getAs[Array[Byte]]("content"))
          Row.fromSeq(
            Seq(r.getLong(0), r.getString(2)) ++ features.flatMap(_.compute(img)))
        }
      }(enc)
  }

  private val mediaSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false))), nullable = false)))

  /** Build the media frame: REAL encoded PNG/BMP payloads (format
    * alternates by doc_id so both decode paths are exercised) + typed
    * metadata. Per-row binary encode is genuine imperative work — the
    * one place mapPartitions is the right tool. Library form: any
    * frame with `doc_id`, `text`. */
  def mediaFrame(documents: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    // null text is DROPPED, pinned on both engine sides (the oracle
    // filters identically) — the simhash precedent: without the filter
    // the codec NPEs here while the oracle would emit a NULL-width row
    documents.select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
      .mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bytes = ImageCodec.encode(text, fmt)
        val w = math.max(1, math.min(text.length, ImageCodec.MaxWidth)).toLong
        Row(id, bytes, Row(fmt, w, ImageCodec.Height.toLong))
      }
    }(enc)
  }

  def mediaFrame(spark: SparkSession, dir: String): DataFrame =
    mediaFrame(Tables(spark, dir, "documents"))

  /** The pipeline: prune → batched per-partition REAL decode →
    * integer pixel features, routed through [[decodeFeatures]] so the
    * C8 entry and any richer feature set share ONE decode code path.
    * Dimensions come from the DECODED image, not the metadata — the
    * decode is load-bearing. */
  def pipeline(documents: DataFrame): DataFrame =
    decodeFeatures(
      mediaFrame(documents)
        .select(col("doc_id"), col("content"), col("meta.format").as("format")),
      Seq(PixelStats))

  // ------------------------------------------------------ decode fusion
  /** Decode fusion (r18, promoted out of the Bench harness in r19):
    * the five multimodal entries each decode the SAME corpus — at sf10
    * that triplicated ~150 s of codec CPU across the suite. The fused
    * all-features frame (the declared [[all]] shape) is materialized
    * ON FIRST USE by any (session, dir) adapter call — the C14
    * materialize discipline, eager localCheckpoint so every consumer
    * reads blocks, not the codec — registered with
    * [[graft.SharedFrames]] so Bench's generic leaked-persist sweep
    * spares it, and every later adapter call projects off it. Verify
    * does NOT consult the registry: its per-entry sweep releases the
    * blocks, the [[fusedLive]] check notices, and the next entry
    * rebuilds — so every gated entry still computes its standalone
    * form under the oracle. MultimodalSpec/LibraryApiSpec pin fused ≡
    * standalone for all entries. Nothing persists across JVM runs. */
  private val fusedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val AllFeatures: Seq[ImageFeature] =
    Seq(PixelStats, PixelRange, PixelHistogram, PerceptualHash)

  private def allFeatures(documents: DataFrame): DataFrame =
    decodeFeatures(
      mediaFrame(documents)
        .select(col("doc_id"), col("content"), col("meta.format").as("format")),
      AllFeatures)

  private def fuseKey(spark: SparkSession, dir: String): String =
    System.identityHashCode(spark).toString + "|" + dir

  /** The checkpointed frame's backing RDDs, if the plan is (as built
    * here) a checkpoint scan. */
  private def fusedRdds(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** A memoized frame is usable only while its checkpoint blocks are
    * still persisted — a harness sweep (Verify's per-entry cleanup)
    * unpersists them, and a truncated-lineage frame cannot recompute. */
  private def fusedLive(df: DataFrame): Boolean = {
    val rdds = fusedRdds(df)
    rdds.nonEmpty && rdds.forall(
      _.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
  }

  /** The shared decoded frame for (session, dir): reuse if live,
    * (re)materialize + register otherwise. */
  private def fusedFrame(spark: SparkSession, dir: String): DataFrame =
    fusedMemo.compute(fuseKey(spark, dir), (_, old) =>
      if (old != null && fusedLive(old)) old
      else {
        val df = allFeatures(Tables(spark, dir, "documents"))
          .localCheckpoint(true)
        fusedRdds(df).foreach(r => graft.SharedFrames.register(r.id))
        df
      })

  /** Materialize the shared decoded frame for (session, dir) ahead of
    * first use (spec surface; the adapters call [[fusedFrame]] lazily). */
  def prewarmFused(spark: SparkSession, dir: String): Unit = {
    fusedFrame(spark, dir); ()
  }

  /** Release a fused frame (spec hygiene). */
  def clearFused(spark: SparkSession, dir: String): Unit = {
    val df = fusedMemo.remove(fuseKey(spark, dir))
    if (df != null) {
      fusedRdds(df).foreach(r => graft.SharedFrames.unregister(r.id))
      df.unpersist(false): Unit
    }
  }

  /** An entry's projection off the shared fused frame — column order
    * matches the standalone decodeFeatures schema. */
  private def fromFused(spark: SparkSession, dir: String,
      fs: Seq[ImageFeature]): DataFrame =
    fusedFrame(spark, dir).select(
      (Seq(col("doc_id"), col("format")) ++
        fs.flatMap(_.fields.map(f => col(f.name)))): _*)

  /** The DECLARED fused entry (r19): all features from ONE decode —
    * the form a production curation pass runs, and the shape the three
    * narrow entries are projections of. */
  def all(documents: DataFrame): DataFrame = allFeatures(documents)

  def all(spark: SparkSession, dir: String): DataFrame =
    fromFused(spark, dir, AllFeatures)

  def pipeline(spark: SparkSession, dir: String): DataFrame =
    fromFused(spark, dir, Seq(PixelStats))

  /** The fused multi-feature entry (C8b): stats + contrast range +
    * intensity histogram from ONE decode per row — what a production
    * curation pass runs, and the proof the fusion API composes. */
  def features(documents: DataFrame): DataFrame =
    decodeFeatures(
      mediaFrame(documents)
        .select(col("doc_id"), col("content"), col("meta.format").as("format")),
      Seq(PixelStats, PixelRange, PixelHistogram))

  def features(spark: SparkSession, dir: String): DataFrame =
    fromFused(spark, dir, Seq(PixelStats, PixelRange, PixelHistogram))

  /** Oracle: what a CORRECT encode→decode roundtrip must yield, from
    * the generative rule — w = clamp(len,1,64), h = 4, pixel (x,y) =
    * (ascii(char x) + y) mod 256 with 0-padding past the text (ASCII
    * corpus: char == byte). Flattened k = y·w + x so one
    * generate_series covers both loops. */
  val pipelineSql: String = {
    val h = ImageCodec.Height
    val mw = ImageCodec.MaxWidth
    s"""WITH d AS (SELECT doc_id, text,
       |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
       |    GREATEST(LEAST(length(text), $mw), 1) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |px AS (SELECT doc_id, format, w,
       |    CAST(list_sum(list_transform(generate_series(0, w * $h - 1),
       |      k -> ((CASE WHEN (k % w) < length(text)
       |              THEN ascii(substr(text, (k % w) + 1, 1)) ELSE 0 END)
       |            + (k // w)) % 256)) AS BIGINT) AS pixel_sum
       |  FROM d)
       |SELECT doc_id, format,
       |  CAST(w AS BIGINT) AS width,
       |  CAST($h AS BIGINT) AS height,
       |  CAST(w * $h AS BIGINT) AS n_pixels,
       |  pixel_sum,
       |  pixel_sum / CAST(w * $h AS BIGINT) AS mean_pixel
       |FROM px""".stripMargin
  }

  /** Oracle for the fused entry: the same generative rule materialized
    * ONCE as a pixel list per doc, then every feature as a list
    * aggregate over it — integer-exact throughout, mean as the raw
    * IEEE quotient like [[pipelineSql]]. */
  val featuresSql: String = {
    val h = ImageCodec.Height
    val mw = ImageCodec.MaxWidth
    val hists = (0 until 4).map(b =>
      s"CAST(len(list_filter(ps, p -> p // 64 = $b)) AS BIGINT) AS hist_$b")
      .mkString(",\n  ")
    s"""WITH d AS (SELECT doc_id, text,
       |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
       |    GREATEST(LEAST(length(text), $mw), 1) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |px AS (SELECT doc_id, format, w,
       |    list_transform(generate_series(0, w * $h - 1),
       |      k -> ((CASE WHEN (k % w) < length(text)
       |              THEN ascii(substr(text, (k % w) + 1, 1)) ELSE 0 END)
       |            + (k // w)) % 256) AS ps
       |  FROM d)
       |SELECT doc_id, format,
       |  CAST(w AS BIGINT) AS width,
       |  CAST($h AS BIGINT) AS height,
       |  CAST(w * $h AS BIGINT) AS n_pixels,
       |  CAST(list_sum(ps) AS BIGINT) AS pixel_sum,
       |  CAST(list_sum(ps) AS BIGINT) / CAST(w * $h AS BIGINT) AS mean_pixel,
       |  CAST(list_min(ps) AS BIGINT) AS pixel_min,
       |  CAST(list_max(ps) AS BIGINT) AS pixel_max,
       |  $hists
       |FROM px""".stripMargin
  }

  /** C8c: the perceptual-hash pass — aHash per media row from one
    * decode. */
  def phash(documents: DataFrame): DataFrame =
    decodeFeatures(
      mediaFrame(documents)
        .select(col("doc_id"), col("content"), col("meta.format").as("format")),
      Seq(PerceptualHash))

  def phash(spark: SparkSession, dir: String): DataFrame =
    fromFused(spark, dir, Seq(PerceptualHash))

  /** Oracle: the generative pixel rule sampled at the 64 aHash cells,
    * bits via the integer-exact `sample·64 > sum` compare, halves
    * assembled with checked BIGINT shifts (max 1<<31 — in range). */
  val phashSql: String = {
    val h = ImageCodec.Height
    val mw = ImageCodec.MaxWidth
    def half(lo: Int): String =
      s"""CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}),
         |      k -> CASE WHEN samp[k + 1] * 64 > total
         |                THEN (CAST(1 AS BIGINT) << (k - $lo)) ELSE 0 END)) AS BIGINT)"""
        .stripMargin
    s"""WITH d AS (SELECT doc_id, text,
       |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
       |    GREATEST(LEAST(length(text), $mw), 1) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |s AS (SELECT doc_id, format,
       |    list_transform(generate_series(0, 63),
       |      k -> ((CASE WHEN (((k % 8) * w) // 8) < length(text)
       |              THEN ascii(substr(text, (((k % 8) * w) // 8) + 1, 1)) ELSE 0 END)
       |            + (((k // 8) * $h) // 8)) % 256) AS samp
       |  FROM d),
       |t AS (SELECT doc_id, format, samp,
       |    CAST(list_sum(samp) AS BIGINT) AS total FROM s)
       |SELECT doc_id, format,
       |  ${half(32)} AS ahash_hi,
       |  ${half(0)} AS ahash_lo
       |FROM t""".stripMargin
  }

  // -------------------------------------------------------------- C8d
  /** Near-dup pair distance bound: pairs at Hamming ≤ [[PhashMaxHam]]
    * are reported; [[PhashMaxHam]] + 1 bands of 64/(d+1) bits make the
    * band equi-join EXHAUSTIVE for that bound (pigeonhole: ≤ d
    * differing bits cannot touch all d+1 disjoint bands). */
  private val PhashMaxHam = 3

  /** Image near-dup PAIRS (C8d) — the multi-index Hamming join that
    * turns C8c's per-image aHash into the image-dedup step: the C2
    * LSH-banding idiom applied to BITS. Exact-equal hashes are
    * collapsed FIRST (the C1 exact-dedup discipline — a 20-image
    * exact-dup group is one row with n=20, never 190 materialized
    * pairs), then the DISTINCT hashes are banded into
    * [[PhashMaxHam]]+1 disjoint 16-bit bands, candidate pairs come
    * from an equi-join on (band, value) — exhaustive for Hamming ≤ d
    * by pigeonhole, never a cross-join — and the exact popcount
    * verify keeps pairs with Hamming in [1, d]. Output: one row per
    * near-dup DISTINCT-hash pair, carrying each side's exact-group
    * representative and size.
    *
    * Scale shape: one decode pass (the hash groupBy collapses the
    * corpus to distinct hashes, map-side combinable), the grouped
    * frame localCheckpoint'd so the self-join never re-decodes, then
    * one (band, value)-keyed equi-join whose buckets are bounded the
    * way C2's LSH bands are (and the C3 simhash band join's). A
    * 16-bit band caps at 2¹⁶ buckets, so past ~10⁹ DISTINCT hashes
    * bucket sizes grow linearly and the verify join needs the Manku
    * et al. (WWW 2007) refinement — more blocks matched in
    * combinations (e.g. C(6,3) tables with 32-bit compound keys) —
    * same pigeonhole, wider keys; the (band, value) join below is
    * that design at the 2-table point. All-integer → the oracle
    * replays pairs bit-for-bit from the generative pixel rule. */
  def phashPairs(documents: DataFrame): DataFrame =
    phashPairsFrom(phash(documents))

  /** The pair machinery over ANY `(doc_id, ahash_hi, ahash_lo)` frame —
    * shared by the standalone form and the fused bench path. */
  private def phashPairsFrom(hashes: DataFrame): DataFrame = {
    val g = hashes
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(count(lit(1)).cast("long").as("n"), min(col("doc_id")).as("rep"))
      .localCheckpoint(true) // decode once; bounded by distinct hashes
    val bands = g.select(col("ahash_hi"), col("ahash_lo"), col("n"),
      col("rep"), explode(array(
        struct(lit(0L).as("band"),
          col("ahash_lo").bitwiseAND(lit(65535L)).as("v")),
        struct(lit(1L).as("band"),
          shiftright(col("ahash_lo"), 16).bitwiseAND(lit(65535L)).as("v")),
        struct(lit(2L).as("band"),
          col("ahash_hi").bitwiseAND(lit(65535L)).as("v")),
        struct(lit(3L).as("band"),
          shiftright(col("ahash_hi"), 16).bitwiseAND(lit(65535L)).as("v"))))
        .as("b"))
      .select(col("b.band").as("band"), col("b.v").as("v"),
        col("ahash_hi").as("hi"), col("ahash_lo").as("lo"),
        col("n"), col("rep"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          (col("a.hi") < col("b.hi") ||
            (col("a.hi") === col("b.hi") && col("a.lo") < col("b.lo"))))
      .select(col("a.rep").as("rep1"), col("b.rep").as("rep2"),
        col("a.n").as("n1"), col("b.n").as("n2"),
        (bit_count(col("a.hi").bitwiseXOR(col("b.hi"))) +
          bit_count(col("a.lo").bitwiseXOR(col("b.lo"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") >= 1 && col("hamming") <= PhashMaxHam)
      .distinct() // a pair may agree on several bands
      .orderBy(col("rep1"), col("rep2"))
  }

  def phashPairs(spark: SparkSession, dir: String): DataFrame =
    phashPairsFrom(phash(spark, dir)) // fusion-aware via phash(spark, dir)

  /** Oracle: the C8c hash CTE, exact-group collapse, then the
    * BRUTE-FORCE distinct-hash pair scan with the same popcount bound
    * — sound as an oracle at gate SF, which is exactly what the banded
    * join must reproduce without the quadratic scan. */
  val phashPairsSql: String = {
    val h = ImageCodec.Height
    val mw = ImageCodec.MaxWidth
    def half(lo: Int): String =
      s"""CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}),
         |      k -> CASE WHEN samp[k + 1] * 64 > total
         |                THEN (CAST(1 AS BIGINT) << (k - $lo)) ELSE 0 END)) AS BIGINT)"""
        .stripMargin
    val ham = "CAST(bit_count(xor(a.hi::BIT, b.hi::BIT)) + " +
      "bit_count(xor(a.lo::BIT, b.lo::BIT)) AS BIGINT)"
    s"""WITH d AS (SELECT doc_id, text,
       |    GREATEST(LEAST(length(text), $mw), 1) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |s AS (SELECT doc_id,
       |    list_transform(generate_series(0, 63),
       |      k -> ((CASE WHEN (((k % 8) * w) // 8) < length(text)
       |              THEN ascii(substr(text, (((k % 8) * w) // 8) + 1, 1)) ELSE 0 END)
       |            + (((k // 8) * $h) // 8)) % 256) AS samp
       |  FROM d),
       |t AS (SELECT doc_id, samp,
       |    CAST(list_sum(samp) AS BIGINT) AS total FROM s),
       |ph AS (SELECT doc_id, ${half(32)} AS hi, ${half(0)} AS lo FROM t),
       |g AS (SELECT hi, lo, CAST(count(*) AS BIGINT) AS n,
       |    min(doc_id) AS rep FROM ph GROUP BY 1, 2)
       |SELECT a.rep AS rep1, b.rep AS rep2, a.n AS n1, b.n AS n2,
       |  $ham AS hamming
       |FROM g a JOIN g b
       |  ON (a.hi < b.hi OR (a.hi = b.hi AND a.lo < b.lo))
       |WHERE $ham BETWEEN 1 AND $PhashMaxHam
       |ORDER BY rep1, rep2""".stripMargin
  }

  /** Oracle for the declared fused entry: the features oracle's pixel
    * list and the phash oracle's 64 sampled cells, both from the same
    * generative encode→decode rule, one row per doc (column order is
    * immaterial — the gate compares column-name-sorted). */
  val allSql: String = {
    val h = ImageCodec.Height
    val mw = ImageCodec.MaxWidth
    val hists = (0 until 4).map(b =>
      s"CAST(len(list_filter(ps, p -> p // 64 = $b)) AS BIGINT) AS hist_$b")
      .mkString(",\n  ")
    def half(lo: Int): String =
      s"""CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}),
         |      k -> CASE WHEN samp[k + 1] * 64 > total
         |                THEN (CAST(1 AS BIGINT) << (k - $lo)) ELSE 0 END)) AS BIGINT)"""
        .stripMargin
    s"""WITH d AS (SELECT doc_id, text,
       |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
       |    GREATEST(LEAST(length(text), $mw), 1) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |px AS (SELECT doc_id, format, w,
       |    list_transform(generate_series(0, w * $h - 1),
       |      k -> ((CASE WHEN (k % w) < length(text)
       |              THEN ascii(substr(text, (k % w) + 1, 1)) ELSE 0 END)
       |            + (k // w)) % 256) AS ps
       |  FROM d),
       |s AS (SELECT doc_id,
       |    list_transform(generate_series(0, 63),
       |      k -> ((CASE WHEN (((k % 8) * w) // 8) < length(text)
       |              THEN ascii(substr(text, (((k % 8) * w) // 8) + 1, 1)) ELSE 0 END)
       |            + (((k // 8) * $h) // 8)) % 256) AS samp
       |  FROM d),
       |t AS (SELECT doc_id, samp,
       |    CAST(list_sum(samp) AS BIGINT) AS total FROM s)
       |SELECT px.doc_id, px.format,
       |  CAST(px.w AS BIGINT) AS width,
       |  CAST($h AS BIGINT) AS height,
       |  CAST(px.w * $h AS BIGINT) AS n_pixels,
       |  CAST(list_sum(ps) AS BIGINT) AS pixel_sum,
       |  CAST(list_sum(ps) AS BIGINT) / CAST(px.w * $h AS BIGINT) AS mean_pixel,
       |  CAST(list_min(ps) AS BIGINT) AS pixel_min,
       |  CAST(list_max(ps) AS BIGINT) AS pixel_max,
       |  $hists,
       |  ${half(32)} AS ahash_hi,
       |  ${half(0)} AS ahash_lo
       |FROM px JOIN t ON px.doc_id = t.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_all" -> all _,
    "multimodal_pipeline" -> pipeline _,
    "multimodal_features" -> features _,
    "multimodal_phash" -> phash _,
    "multimodal_dedup_phash" -> (phashPairs(_, _)))

  val oracles: Map[String, String] = Map(
    "multimodal_all" -> allSql,
    "multimodal_pipeline" -> pipelineSql,
    "multimodal_features" -> featuresSql,
    "multimodal_phash" -> phashSql,
    "multimodal_dedup_phash" -> phashPairsSql)
}
