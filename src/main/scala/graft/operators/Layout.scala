package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Physical-layout operators (SURVEY.md §2 C42): multi-dimensional
  * clustering for scan pruning.
  *
  * At 100 TB the scan you never run is the cheapest operator in the
  * engine: parquet/Delta/Iceberg readers skip whole files from
  * footer min/max stats, but a table sorted by ONE key only prunes
  * predicates on that key. Z-ordering (Morton 1966; the primitive
  * behind Delta `OPTIMIZE ZORDER BY` and Iceberg's `zorder` sort
  * order) interleaves the bits of several normalized dimensions so
  * ranges of the ORDER-BY key are small hyper-rectangles in every
  * dimension at once — each written file carries tight min/max on
  * ALL z-ordered columns, and predicates on any of them prune.
  *
  * Everything here is integer-exact (rank-normalize → bit
  * interleave → bucket), so DuckDB replays the layout bit-for-bit. */
object Layout {

  /** Bits kept per dimension (two dims → 2·[[ZBits]]-bit z values). */
  private val ZBits = 16

  /** Z-bucket count: top 8 z bits = top 4 bits of EACH dimension, so
    * every bucket is a ≤1/16-of-range window in both dims. */
  private val ZBucketShift = 2 * ZBits - 8

  /** The bit-interleave as dialect SQL — one generator per engine,
    * same 2·[[ZBits]]-term arithmetic tree (Spark `shiftleft/-right`
    * functions ≡ DuckDB `<<`/`>>` operators; `& 1` isolates a bit in
    * both). Inputs must already be in [0, 2^ZBits). */
  private[operators] def zExprSpark(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
      s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})").mkString(" + ")

  private[operators] def zExprDuck(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** Z-order layout audit (C42) over `events`, clustering dims
    * (user_id, event time): the OPTIMIZE ZORDER planning pass. Each
    * dim is min/max-normalized to a [[ZBits]]-bit integer rank
    * (`(x − min)·65535 div max(range, 1)` — floor division, exact in
    * both engines; time spans up to ~4.6 years in µs stay long-safe
    * under the ×65535), bits are interleaved into the Morton code,
    * and rows land in 256 z-buckets (= the files a writer would cut).
    * The output is the per-bucket stats frame a planner reads: row
    * count plus min/max of BOTH raw dims — the audit that every
    * bucket is a small hyper-rectangle (file-skipping works on either
    * predicate), which a 1-D sort cannot give on its trailing dim.
    *
    * Plan shape: one 1-row global min/max aggregate whose FOUR longs
    * are collected and inlined as literals (the bounded-collect scalar
    * pattern of C34/C37 — exactly what Spark's own scalar-subquery
    * execution does, and it keeps the corpus scan join-free; a
    * constant-key broadcast join constant-folds into the
    * BroadcastNestedLoopJoin the plan audit forbids), one map-side z
    * projection, one 256-group aggregate. No sort at all — the BUCKET
    * assignment is what production writes by
    * (`repartitionByRange(zbucket)` + local sort inside the writer);
    * the audit frame is the gated artifact. */
  def zorder(events: DataFrame): DataFrame = {
    val pts = events.select(col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("s"))
    val b = pts.agg(
      min(col("user_id")), max(col("user_id")),
      min(col("s")), max(col("s"))).head()
    // empty input: the no-group agg still yields one all-null row;
    // zeros make the projection well-typed and the groupBy stays empty
    def at(i: Int) = if (b.isNullAt(i)) 0L else b.getLong(i)
    val (mnu, mxu, mns, mxs) = (at(0), at(1), at(2), at(3))
    val z = pts
      .withColumn("ux",
        expr(s"(user_id - $mnu) * 65535 div ${math.max(mxu - mnu, 1L)}"))
      .withColumn("uy",
        expr(s"(s - $mns) * 65535 div ${math.max(mxs - mns, 1L)}"))
      .withColumn("z", expr(zExprSpark("ux", "uy")))
    z.groupBy(expr(s"z div ${1L << ZBucketShift}").as("zbucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("s")).as("min_s"), max(col("s")).as("max_s"))
      .orderBy(col("zbucket"))
  }

  def zorder(spark: SparkSession, dir: String): DataFrame =
    zorder(Tables(spark, dir, "events"))

  val zorderSql: String =
    s"""WITH p AS (SELECT user_id, epoch_us(ts) AS s FROM events),
       |b AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
       |             min(s) AS mns, max(s) AS mxs FROM p),
       |u AS (SELECT p.user_id, p.s,
       |    (p.user_id - b.mnu) * 65535 // greatest(b.mxu - b.mnu, 1) AS ux,
       |    (p.s - b.mns) * 65535 // greatest(b.mxs - b.mns, 1) AS uy
       |  FROM p, b),
       |z AS (SELECT user_id, s,
       |    (${zExprDuck("ux", "uy")}) // ${1L << ZBucketShift} AS zbucket
       |  FROM u)
       |SELECT zbucket, count(*) AS n_events,
       |  min(user_id) AS min_user, max(user_id) AS max_user,
       |  min(s) AS min_s, max(s) AS max_s
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin

  // -------------------------------------------------------------- C42b
  /** Digest modulus for the write round-trip gate. */
  private val ZDigestMod = 1000003L

  /** Shared rank-normalized projection: (event_id, user_id, s, ux, uy)
    * with both dims min/max-normalized to 16-bit ranks (bounds
    * collected once — the C42 scalar pattern). */
  private def ranked(events: DataFrame): DataFrame = {
    val pts = events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("s"))
    val b = pts.agg(
      min(col("user_id")), max(col("user_id")),
      min(col("s")), max(col("s"))).head()
    def at(i: Int) = if (b.isNullAt(i)) 0L else b.getLong(i)
    val (mnu, mxu, mns, mxs) = (at(0), at(1), at(2), at(3))
    pts
      .withColumn("ux",
        expr(s"(user_id - $mnu) * 65535 div ${math.max(mxu - mnu, 1L)}"))
      .withColumn("uy",
        expr(s"(s - $mns) * 65535 div ${math.max(mxs - mns, 1L)}"))
  }

  /** Z-order MATERIALIZATION (C42b) — the write step C42 only plans:
    * rows land in their z-bucket, the corpus is physically rewritten as
    * one parquet directory per bucket (`partitionBy(zbucket)` after a
    * bucket-keyed repartition + within-partition z sort — exactly what
    * Delta's OPTIMIZE ZORDER materializes), and the gated artifact is
    * the READ-BACK of the written corpus: per-bucket row count, raw
    * min/max of BOTH dims, and a content digest (Σ md5(event_id) mod
    * [[ZDigestMod]]). The digest is computed FROM THE WRITTEN FILES, so
    * a write that drops, duplicates, or mis-buckets any row
    * hash-fails against the oracle, which replays the bucket
    * assignment from the raw table — the gate proves the rewrite is a
    * complete, correctly-bucketed permutation of the input.
    *
    * Scale shape: one bounds collect, one map-side z projection, one
    * 256-way shuffle write, one read-back aggregate. At 100 TB the
    * writer adds `maxRecordsPerFile` under each bucket; the per-bucket
    * min/max the gate emits are exactly the footer stats a reader
    * prunes on. */
  def zorderWrite(events: DataFrame, outDir: String): DataFrame = {
    val spark = events.sparkSession
    val z = ranked(events)
      .withColumn("z", expr(zExprSpark("ux", "uy")))
      .withColumn("zbucket", expr(s"z div ${1L << ZBucketShift}"))
      .select(col("event_id"), col("user_id"), col("s"),
        col("z"), col("zbucket"))
    z.repartition(col("zbucket"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite")
      .partitionBy("zbucket")
      .parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("zbucket").cast("long").as("zbucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("s")).as("min_s"), max(col("s")).as("max_s"),
        sum(expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15)," +
          s" 16, 10) AS BIGINT) % $ZDigestMod")).cast("long").as("digest"))
      .orderBy(col("zbucket"))
  }

  // per-invocation scratch dir ([[graft.Scratch]]), deleted once the
  // 256-row read-back aggregate is materialized — the eager checkpoint
  // pins the bounded gate frame so nothing reads the dir afterwards
  def zorderWrite(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.Scratch.dir("zorder_write")
    try zorderWrite(Tables(spark, dir, "events"), out).localCheckpoint(true)
    finally graft.Scratch.delete(out)
  }

  val zorderWriteSql: String =
    s"""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS s FROM events),
       |b AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
       |             min(s) AS mns, max(s) AS mxs FROM p),
       |u AS (SELECT p.event_id, p.user_id, p.s,
       |    (p.user_id - b.mnu) * 65535 // greatest(b.mxu - b.mnu, 1) AS ux,
       |    (p.s - b.mns) * 65535 // greatest(b.mxs - b.mns, 1) AS uy
       |  FROM p, b),
       |z AS (SELECT event_id, user_id, s,
       |    (${zExprDuck("ux", "uy")}) // ${1L << ZBucketShift} AS zbucket
       |  FROM u)
       |SELECT zbucket, count(*) AS n_events,
       |  min(user_id) AS min_user, max(user_id) AS max_user,
       |  min(s) AS min_s, max(s) AS max_s,
       |  CAST(sum(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
       |    ::BIGINT % $ZDigestMod) AS BIGINT) AS digest
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin

  // -------------------------------------------------------------- C42c
  /** Probe boxes for the skip audit: 4 user stripes, 4 time stripes,
    * 16 quartile cells — all in 16-bit rank space. */
  private val ZBoxes: Seq[(Long, Long, Long, Long, Long)] = {
    val q = 16384L
    val stripesU = (0 until 4).map(i =>
      (i.toLong, i * q, i * q + q - 1, 0L, 65535L))
    val stripesT = (0 until 4).map(i =>
      (4L + i, 0L, 65535L, i * q, i * q + q - 1))
    val cells = for (i <- 0 until 4; j <- 0 until 4)
      yield (8L + i * 4 + j, i * q, i * q + q - 1, j * q, j * q + q - 1)
    stripesU ++ stripesT ++ cells
  }

  /** File-skip audit (C42c) — the measured pruning win the z-layout
    * exists for, as a deterministic cross-engine artifact instead of a
    * one-off benchmark: the SAME corpus is bucketed two ways (256
    * Morton z-buckets vs 256 equal-width time buckets — the 1-D layout
    * a time-sorted writer produces), each bucket keeps its min/max
    * rank stats on BOTH dims (= parquet footer stats), and for each of
    * the [[ZBoxes]] probe boxes the audit counts the files a
    * stats-pruning reader must scan under each layout (bucket overlaps
    * box on both dims). The z-layout prunes user-only predicates the
    * time layout cannot (LayoutSpec pins z scanning ≤ a quarter of the
    * files on user stripes where the time layout scans ALL of them,
    * and both pruning time stripes).
    *
    * Everything is integer rank arithmetic over the 256-row-per-layout
    * stats frames — corpus-linear once, then constant-size. */
  def zorderSkip(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val tagged = ranked(events)
      .select(col("ux"), col("uy"),
        expr(s"(${zExprSpark("ux", "uy")}) div ${1L << ZBucketShift}")
          .as("zbucket"),
        expr("uy div 256").as("tbucket"))
    val stats = tagged
      .groupBy(lit("zorder").as("layout"), col("zbucket").as("bucket"))
      .agg(min(col("ux")).as("min_x"), max(col("ux")).as("max_x"),
        min(col("uy")).as("min_y"), max(col("uy")).as("max_y"))
      .unionAll(tagged
        .groupBy(lit("timesort").as("layout"), col("tbucket").as("bucket"))
        .agg(min(col("ux")).as("min_x"), max(col("ux")).as("max_x"),
          min(col("uy")).as("min_y"), max(col("uy")).as("max_y")))
    // the probe boxes ride as a LITERAL array exploded per stats row —
    // a pure map-side expansion of the ≤512-row stats frame (a
    // crossJoin(broadcast(...)) of two bounded frames still PLANS the
    // BroadcastNestedLoopJoin shape the blanket audit forbids)
    val boxLit = typedlit(ZBoxes)
    stats.select(col("layout"), col("min_x"), col("max_x"),
        col("min_y"), col("max_y"), explode(boxLit).as("b"))
      .select(col("layout"), col("b._1").as("box_id"),
        col("b._2").as("xlo"), col("b._3").as("xhi"),
        col("b._4").as("ylo"), col("b._5").as("yhi"),
        col("min_x"), col("max_x"), col("min_y"), col("max_y"))
      .groupBy(col("layout"), col("box_id"))
      .agg(count(lit(1)).as("files_total"),
        sum(when(col("min_x") <= col("xhi") && col("max_x") >= col("xlo") &&
          col("min_y") <= col("yhi") && col("max_y") >= col("ylo"), 1L)
          .otherwise(0L)).cast("long").as("files_scanned"))
      .orderBy(col("layout"), col("box_id"))
  }

  def zorderSkip(spark: SparkSession, dir: String): DataFrame =
    zorderSkip(Tables(spark, dir, "events"))

  val zorderSkipSql: String = {
    val boxesSql = ZBoxes.map { case (id, xlo, xhi, ylo, yhi) =>
      s"($id, $xlo, $xhi, $ylo, $yhi)"
    }.mkString(", ")
    s"""WITH p AS (SELECT user_id, epoch_us(ts) AS s FROM events),
       |b AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
       |             min(s) AS mns, max(s) AS mxs FROM p),
       |u AS (SELECT
       |    (p.user_id - b.mnu) * 65535 // greatest(b.mxu - b.mnu, 1) AS ux,
       |    (p.s - b.mns) * 65535 // greatest(b.mxs - b.mns, 1) AS uy
       |  FROM p, b),
       |tagged AS (SELECT ux, uy,
       |    (${zExprDuck("ux", "uy")}) // ${1L << ZBucketShift} AS zbucket,
       |    uy // 256 AS tbucket
       |  FROM u),
       |stats AS (
       |  SELECT 'zorder' AS layout, zbucket AS bucket,
       |    min(ux) AS min_x, max(ux) AS max_x,
       |    min(uy) AS min_y, max(uy) AS max_y
       |  FROM tagged GROUP BY zbucket
       |  UNION ALL
       |  SELECT 'timesort' AS layout, tbucket AS bucket,
       |    min(ux) AS min_x, max(ux) AS max_x,
       |    min(uy) AS min_y, max(uy) AS max_y
       |  FROM tagged GROUP BY tbucket),
       |boxes(box_id, xlo, xhi, ylo, yhi) AS (VALUES $boxesSql)
       |SELECT s.layout, CAST(b.box_id AS BIGINT) AS box_id,
       |  count(*) AS files_total,
       |  CAST(sum(CASE WHEN s.min_x <= b.xhi AND s.max_x >= b.xlo
       |    AND s.min_y <= b.yhi AND s.max_y >= b.ylo THEN 1 ELSE 0 END)
       |    AS BIGINT) AS files_scanned
       |FROM stats s CROSS JOIN boxes b
       |GROUP BY s.layout, b.box_id
       |ORDER BY layout, box_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (zorder(_, _)),
    "layout_zorder_write" -> (zorderWrite(_, _)),
    "layout_zorder_skip" -> (zorderSkip(_, _)))

  val oracles: Map[String, String] = Map(
    "layout_zorder" -> zorderSql,
    "layout_zorder_write" -> zorderWriteSql,
    "layout_zorder_skip" -> zorderSkipSql)
}
