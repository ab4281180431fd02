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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (zorder(_, _)))

  val oracles: Map[String, String] = Map(
    "layout_zorder" -> zorderSql)
}
