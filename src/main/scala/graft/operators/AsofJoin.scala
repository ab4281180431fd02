package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** C24: as-of join — for each left row, the single most recent right row
  * with `right.ts <= left.ts` on the same key (pandas `merge_asof`
  * backward / DuckDB `ASOF JOIN` / kdb `aj`). The canonical event-time
  * enrichment operator Spark's join zoo lacks: the naive encoding
  * (range-join `l.ts >= r.ts` + argmax) plans a per-key cross product —
  * O(|L|·|R|) per key — and the correlated-subquery form plans one probe
  * per row. Neither survives 100 TB.
  *
  * Plan here is the scale-correct union-and-carry formulation: tag both
  * sides, union, ONE shuffle by key into a per-key `(ts, tag)`-ordered
  * window, carry the latest right payload forward with
  * `last(_, ignoreNulls)`, keep left rows. Cost is a single exchange of
  * |L|+|R| rows plus a linear per-key scan — the same shape as a sort
  * -merge join, with no candidate amplification. At equal timestamps the
  * right row sorts BEFORE the left row (tag 0 < 1), so `ts_r == ts_l`
  * matches — DuckDB ASOF `>=` semantics. Rows-between framing keeps the
  * window in the streaming (non-buffering) window-exec path.
  *
  * An optional `tolerance` bounds the match age (merge_asof's
  * `tolerance`): the carry still happens, but a match older than the
  * bound is nulled out per row — no second pass, no extra shuffle.
  *
  * The right side must be unique per (key, ts) for the operator to be
  * deterministic (and for ASOF oracles to be well-defined among equal
  * timestamps); callers pre-aggregate — the entry arg-maxes `event_id`.
  */
object AsofJoin {

  /** Backward as-of join. `left` keeps all its columns; every non-key,
    * non-ts column of `right` is appended (null where no right row is at
    * or before the left row's `ts`), plus the matched right timestamp as
    * `<tsCol>_matched`. `right` must be unique per (key, ts). */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tolerance: Option[Column] = None): DataFrame =
    asofDirected(left, right, keyCol, tsCol, tolerance, forward = false)

  /** Forward as-of join (pandas merge_asof `direction='forward'` /
    * DuckDB `ASOF ... ON l.ts <= r.ts`): for each left row, the single
    * EARLIEST right row with `right.ts >= left.ts` on the same key —
    * the "next event after" enrichment (click → next purchase, alert →
    * next deploy). Identical cost shape to backward: the same single
    * |L|+|R| exchange, the window merely orders descending so the
    * ignoreNulls-last carry holds the nearest LATER right row (right
    * still sorts before left at equal ts, so `ts_r == ts_l` matches —
    * `<=` semantics). `tolerance` bounds the match's futurity. */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tolerance: Option[Column] = None): DataFrame =
    asofDirected(left, right, keyCol, tsCol, tolerance, forward = true)

  /** Nearest as-of join (pandas merge_asof `direction='nearest'`):
    * for each left row, whichever of the backward and forward matches
    * is closer in time (tie → the backward one, matching pandas).
    * STILL one |L|+|R| exchange: both carries run over the SAME
    * key-partitioned union — two within-partition sorts (asc + desc
    * window), zero extra shuffles. `tolerance` bounds both directions
    * symmetrically. */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tolerance: Option[Column] = None): DataFrame = {
    val rightPayload = validate(left, right, keyCol, tsCol)
    val rStruct = struct(
      (col(tsCol).as("__ts") +: rightPayload.map(col)): _*)
    val l = left.withColumn("__tag", lit(1))
    val r = right.select(
      col(keyCol), col(tsCol), lit(0).as("__tag"), rStruct.as("__r"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    def w(desc: Boolean) = Window.partitionBy(col(keyCol))
      .orderBy(if (desc) col(tsCol).desc else col(tsCol).asc, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val back0 = last(col("__r"), ignoreNulls = true).over(w(desc = false))
    val fwd0 = last(col("__r"), ignoreNulls = true).over(w(desc = true))
    val ageB = col(tsCol) - back0.getField("__ts")
    val ageF = fwd0.getField("__ts") - col(tsCol)
    val (back, fwd) = tolerance match {
      case Some(tol) => (when(ageB <= tol, back0), when(ageF <= tol, fwd0))
      case None => (back0, fwd0)
    }
    val picked = when(back.isNotNull && (fwd.isNull || ageB <= ageF), back)
      .otherwise(fwd)
    unioned
      .withColumn("__m", picked)
      .filter(col("__tag") === 1)
      .select(
        (left.columns.map(col) :+
          col("__m.__ts").as(s"${tsCol}_matched")) ++
          rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Library-form contract enforcement (ADVICE r11: a silent payload/
    * left collision produced duplicate output columns; caller frames
    * carrying the internal working names corrupted the carry).
    * Returns the right payload columns. */
  private def validate(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String): Array[String] = {
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == tsCol)
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: " +
        s"${collisions.mkString(", ")} — rename them before joining")
    val reserved = Set("__tag", "__r", "__m", s"${tsCol}_matched")
    val reservedHits =
      (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedHits.isEmpty,
      s"column names reserved by the as-of join present in an input: " +
        s"${reservedHits.mkString(", ")}")
    rightPayload
  }

  private def asofDirected(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tolerance: Option[Column], forward: Boolean): DataFrame = {
    val rightPayload = validate(left, right, keyCol, tsCol)
    // one struct carry instead of one last() per payload column: a
    // single ignoreNulls-last scans the frame once however wide the
    // right side is (the matched ts rides inside the struct too);
    // unionByName(allowMissingColumns) null-fills `__r` on the left
    // side and the left payload on the right side
    val rStruct = struct(
      (col(tsCol).as("__ts") +: rightPayload.map(col)): _*)
    val l = left.withColumn("__tag", lit(1))
    val r = right.select(
      col(keyCol), col(tsCol), lit(0).as("__tag"), rStruct.as("__r"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // forward = the same linear carry over a DESCENDING ts order: the
    // window's preceding rows are the later timestamps, so the last
    // non-null right struct is the nearest row with ts >= current (the
    // ascending tag keeps right before left at equal ts in both
    // directions)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(if (forward) col(tsCol).desc else col(tsCol).asc, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = last(col("__r"), ignoreNulls = true).over(w)
    val age =
      if (forward) carried0.getField("__ts") - col(tsCol)
      else col(tsCol) - carried0.getField("__ts")
    val carried = tolerance match {
      case Some(tol) => when(age <= tol, carried0)
      case None => carried0
    }
    unioned
      .withColumn("__m", carried)
      .filter(col("__tag") === 1)
      .select(
        (left.columns.map(col) :+
          col("__m.__ts").as(s"${tsCol}_matched")) ++
          rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }

  // ------------------------------------------------- skew hardening
  /** Backward as-of join, SKEW-HARDENED (r12 verdict #3): the plain
    * carry puts each key's entire |L|+|R| row set into ONE task's sort
    * — correct, but at 100 TB a single hot key (one user with 10⁹
    * events, one device gone haywire) becomes one straggler task, the
    * same failure class as any skewed sort-merge join. This variant
    * bounds every task by CHUNKING TIME instead of salting randomly
    * (random salt would separate a left row from the earlier right row
    * it must match; time-chunking keeps order semantics exact):
    *
    *  1. bucket both sides by `(key, chunk)` where
    *     `chunk = floor(epoch_us(ts) / chunkMicros)` and run the SAME
    *     within-partition carry — one |L|+|R| exchange, but a hot
    *     key's timeline now splits across `span/chunkWidth` parallel
    *     tasks, each sorting only its chunk;
    *  2. a boundary pass over the per-`(key, chunk)` summaries (ONE
    *     row per non-empty chunk: the chunk's latest right struct,
    *     `max_by` over right rows only) computes each chunk's
    *     CARRY-IN — the latest right struct of all strictly earlier
    *     chunks — via the same ignoreNulls-last window over the tiny
    *     summary frame;
    *  3. the carry-in joins back on `(key, chunk)` (partitioning
    *     already agrees with pass 1's window, and the summary side is
    *     bounded by #distinct (key, chunk) — broadcast-size in
    *     practice) and `coalesce(within_chunk, carry_in)` resolves
    *     each left row.
    *
    * Equal timestamps can never straddle a chunk boundary (same ts ⇒
    * same chunk), so the `>=`-match tag ordering is untouched; a right
    * row in an earlier chunk is strictly earlier in time, so carry-in
    * can never beat a within-chunk match (within-chunk, when present,
    * is always later). AsofJoinSpec asserts row-for-row equality with
    * [[asofBackward]] on the gate fixture and on an adversarial
    * single-key (maximally skewed) frame.
    *
    * WHEN TO SWITCH (the SURVEY §4 threshold): chunk when the largest
    * single key's row count exceeds what one task sorts comfortably —
    * at typical 128 MB/task budgets, ~10⁶–10⁷ rows per key. Pick
    * `chunkMicros` so a hot key yields 10–1000 chunks over its span;
    * fewer and the straggler remains, more and the (bounded) summary
    * pass grows for no win. The plain path stays the default: below
    * the threshold its single exchange and single sort are strictly
    * cheaper. */
  def asofBackwardChunked(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, chunkMicros: Long,
      tolerance: Option[Column] = None): DataFrame =
    asofChunked(left, right, keyCol, tsCol, chunkMicros, tolerance,
      forward = false)

  /** Forward twin of [[asofBackwardChunked]]: carry-in becomes the
    * EARLIEST right struct of all strictly later chunks (`min_by`
    * summary, descending boundary window). Same cost shape. */
  def asofForwardChunked(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, chunkMicros: Long,
      tolerance: Option[Column] = None): DataFrame =
    asofChunked(left, right, keyCol, tsCol, chunkMicros, tolerance,
      forward = true)

  private def asofChunked(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, chunkMicros: Long, tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    require(chunkMicros > 0, s"chunkMicros must be positive: $chunkMicros")
    val rightPayload = validate(left, right, keyCol, tsCol)
    require(!(left.columns ++ right.columns).exists(Set("__chunk", "__cin")),
      "column names __chunk/__cin reserved by the chunked as-of join")
    def chunkOf(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / chunkMicros)
    val rStruct = struct(
      (col(tsCol).as("__ts") +: rightPayload.map(col)): _*)
    val l = left.withColumn("__tag", lit(1))
    val r = right.select(
      col(keyCol), col(tsCol), lit(0).as("__tag"), rStruct.as("__r"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__chunk", chunkOf(col(tsCol)))
    // pass 1: the plain carry, partitioned by (key, chunk)
    val w = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(if (forward) col(tsCol).desc else col(tsCol).asc, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inChunk = last(col("__r"), ignoreNulls = true).over(w)
    // pass 2: per-(key, chunk) boundary summaries over RIGHT rows only
    // (bounded: one row per non-empty chunk), left-joined onto every
    // (key, chunk) the union actually has so chunks with no right rows
    // still receive a carry-in
    val edge = r.withColumn("__chunk", chunkOf(col(tsCol)))
      .groupBy(col(keyCol), col("__chunk"))
      .agg((if (forward) min_by(col("__r"), col(tsCol))
            else max_by(col("__r"), col(tsCol))).as("__edge"))
    val wIn = Window.partitionBy(col(keyCol))
      .orderBy(if (forward) col("__chunk").desc else col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = unioned.select(col(keyCol), col("__chunk")).distinct()
      .join(edge, Seq(keyCol, "__chunk"), "left")
      .withColumn("__cin", last(col("__edge"), ignoreNulls = true).over(wIn))
      .select(col(keyCol), col("__chunk"), col("__cin"))
    // pass 3: resolve — a within-chunk match is always nearer than any
    // other-chunk match, so coalesce picks correctly
    val carried0 = coalesce(col("__m"), col("__cin"))
    val age =
      if (forward) carried0.getField("__ts") - col(tsCol)
      else col(tsCol) - carried0.getField("__ts")
    val carried = tolerance match {
      case Some(tol) => when(age <= tol, carried0)
      case None => carried0
    }
    unioned
      .withColumn("__m", inChunk)
      .join(carryIn, Seq(keyCol, "__chunk"), "left")
      .filter(col("__tag") === 1)
      .select(
        (left.columns.map(col) :+
          carried.getField("__ts").as(s"${tsCol}_matched")) ++
          rightPayload.map(c => carried.getField(c).as(c)): _*)
  }

  /** Entry: purchase attribution over `events` — for each click, the
    * user's most recent purchase at or before the click, with the gap in
    * microseconds (exact integers end-to-end; NULL columns where the
    * user has not purchased yet). Right side is arg-maxed to one row per
    * (user, ts) so ties cannot make the as-of choice ambiguous. */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    // parquet ts is NTZ; unix_micros needs LTZ — session tz is UTC, so
    // the cast is deterministic (the D4 stream_join precedent). Raw
    // timestamps never ship in an entry output (the §5 rule): epoch
    // micros as exact BIGINTs instead.
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    asofBackward(clicks, purchases, "user_id", "ts")
      .select(
        col("user_id"), col("click_id"), us(col("ts")).as("click_us"),
        col("purchase_id"), us(col("ts_matched")).as("purchase_us"),
        (us(col("ts")) - us(col("ts_matched"))).as("gap_us"))
  }

  /** Entry: the tolerance-bounded variant of [[joinAsof]] — attribution
    * windows are never unbounded in production (a purchase from last
    * quarter does not explain today's click). Same carry, same single
    * exchange; a match older than `AsofToleranceHours` is nulled PER
    * ROW by the tolerance branch (no second pass), so stale-match rows
    * keep their left columns with null right payload — exactly the
    * rows a bounded `ASOF` emits. Non-vacuity (some matches survive,
    * some are nulled) is asserted in AsofJoinSpec on the driver
    * fixture. */
  def joinAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    asofBackward(clicks, purchases, "user_id", "ts",
        tolerance = Some(expr(s"INTERVAL $AsofToleranceHours HOURS")))
      .select(
        col("user_id"), col("click_id"), us(col("ts")).as("click_us"),
        col("purchase_id"), us(col("ts_matched")).as("purchase_us"),
        (us(col("ts")) - us(col("ts_matched"))).as("gap_us"))
  }

  private val AsofToleranceHours = 2

  /** Entry: the FORWARD direction — for each click, the user's next
    * purchase at or after the click (did the click convert, and how
    * long did conversion take). `gap_us` is purchase − click ≥ 0.
    * Oracle = DuckDB native ASOF with the inequality flipped. */
  def joinAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    asofForward(clicks, purchases, "user_id", "ts")
      .select(
        col("user_id"), col("click_id"), us(col("ts")).as("click_us"),
        col("purchase_id"), us(col("ts_matched")).as("purchase_us"),
        (us(col("ts_matched")) - us(col("ts"))).as("gap_us"))
  }

  val joinAsofForwardSql: String =
    """WITH p AS (SELECT user_id, ts, max(event_id) AS purchase_id
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |c AS (SELECT user_id, ts, event_id AS click_id
      |      FROM events WHERE event_type = 'click')
      |SELECT c.user_id, c.click_id,
      |  CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
      |  p.purchase_id,
      |  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
      |  CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin

  val joinAsofToleranceSql: String =
    s"""WITH p AS (SELECT user_id, ts, max(event_id) AS purchase_id
       |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |c AS (SELECT user_id, ts, event_id AS click_id
       |      FROM events WHERE event_type = 'click'),
       |a AS (SELECT c.user_id, c.click_id, c.ts AS cts, p.ts AS pts,
       |             p.purchase_id
       |      FROM c ASOF LEFT JOIN p
       |        ON c.user_id = p.user_id AND c.ts >= p.ts)
       |SELECT user_id, click_id,
       |  CAST(epoch_us(cts) AS BIGINT) AS click_us,
       |  CASE WHEN cts - pts <= INTERVAL $AsofToleranceHours HOURS
       |       THEN purchase_id END AS purchase_id,
       |  CASE WHEN cts - pts <= INTERVAL $AsofToleranceHours HOURS
       |       THEN CAST(epoch_us(pts) AS BIGINT) END AS purchase_us,
       |  CASE WHEN cts - pts <= INTERVAL $AsofToleranceHours HOURS
       |       THEN CAST(epoch_us(cts) - epoch_us(pts) AS BIGINT)
       |       END AS gap_us
       |FROM a""".stripMargin

  val joinAsofSql: String =
    """WITH p AS (SELECT user_id, ts, max(event_id) AS purchase_id
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |c AS (SELECT user_id, ts, event_id AS click_id
      |      FROM events WHERE event_type = 'click')
      |SELECT c.user_id, c.click_id,
      |  CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
      |  p.purchase_id,
      |  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
      |  CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  /** Entry: the NEAREST direction — each click matched to the closest
    * purchase in either direction (tie → backward, the pandas
    * convention). `gap_us` is SIGNED: negative when the nearest
    * purchase preceded the click. Oracle composes DuckDB's two native
    * ASOF joins (one per inequality) and picks per row with the same
    * tie rule — the nearest semantics is exactly that composition. */
  def joinAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    asofNearest(clicks, purchases, "user_id", "ts")
      .select(
        col("user_id"), col("click_id"), us(col("ts")).as("click_us"),
        col("purchase_id"), us(col("ts_matched")).as("purchase_us"),
        (us(col("ts_matched")) - us(col("ts"))).as("gap_us"))
  }

  val joinAsofNearestSql: String =
    """WITH p AS (SELECT user_id, ts, max(event_id) AS purchase_id
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |c AS (SELECT user_id, ts, event_id AS click_id
      |      FROM events WHERE event_type = 'click'),
      |b AS (SELECT c.user_id, c.click_id, c.ts AS cts,
      |             p.ts AS bts, p.purchase_id AS bid
      |      FROM c ASOF LEFT JOIN p
      |        ON c.user_id = p.user_id AND c.ts >= p.ts),
      |f AS (SELECT c.click_id, p.ts AS fts, p.purchase_id AS fid
      |      FROM c ASOF LEFT JOIN p
      |        ON c.user_id = p.user_id AND c.ts <= p.ts),
      |n AS (SELECT b.user_id, b.click_id, b.cts,
      |        CASE WHEN bts IS NOT NULL AND (fts IS NULL OR cts - bts <= fts - cts)
      |             THEN bts ELSE fts END AS mts,
      |        CASE WHEN bts IS NOT NULL AND (fts IS NULL OR cts - bts <= fts - cts)
      |             THEN bid ELSE fid END AS purchase_id
      |      FROM b JOIN f ON b.click_id = f.click_id)
      |SELECT user_id, click_id,
      |  CAST(epoch_us(cts) AS BIGINT) AS click_us,
      |  purchase_id,
      |  CAST(epoch_us(mts) AS BIGINT) AS purchase_us,
      |  CAST(epoch_us(mts) - epoch_us(cts) AS BIGINT) AS gap_us
      |FROM n""".stripMargin

  /** Entry: [[joinAsof]] through the SKEW-HARDENED chunked path —
    * 30-minute chunks over the events fixture force real cross-chunk
    * carry-ins (most clicks match a purchase from an earlier chunk).
    * The oracle is joinAsofSql VERBATIM: chunking must be semantically
    * invisible, which is the entire point of the gate. */
  def joinAsofChunked(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    asofBackwardChunked(clicks, purchases, "user_id", "ts",
        chunkMicros = 30L * 60 * 1000000)
      .select(
        col("user_id"), col("click_id"), us(col("ts")).as("click_us"),
        col("purchase_id"), us(col("ts_matched")).as("purchase_us"),
        (us(col("ts")) - us(col("ts_matched"))).as("gap_us"))
  }

  // --------------------------------------------------------------- C39
  /** Band width for [[rangeCount]]: 30 minutes, in microseconds. */
  private val BandUs = 1800L * 1000000L

  /** Distributed band-join COUNT (C39) — for every event, the number
    * of events (corpus-wide) with `ts' ∈ [ts − W, ts]`, W =
    * [[BandUs]]: the count-aggregate form of the range/band self-join
    * (the other join Spark's zoo lacks beside as-of; the
    * pair-PRODUCING form is the same chunk machinery with an
    * equi-join on chunk + containment filter, it just multiplies
    * output rows). Event analytics reads this as "activity in the
    * trailing window at each event" — concurrency, burst and rate
    * metrics.
    *
    * The naive formulations do not scale: the correlated count probes
    * per row, the band θ-join is a cross product, and the direct
    * window form — `count(*) OVER (ORDER BY ts RANGE W PRECEDING)`,
    * which IS the semantics and IS the oracle — plans one global
    * single-partition sort. The distributed plan exploits chunk =
    * band width, so every band spans AT MOST TWO chunks and splits
    * exactly:
    *
    *   count = |chunk(ts) ∩ (-∞, ts]| + |chunk(ts)−1 ∩ [ts − W, ∞)|
    *
    *  1. in-chunk prefix: `count(*)` over a window PARTITIONED BY
    *     chunk, ordered by ts, RANGE-framed to current row
    *     (peers-inclusive — duplicates of ts all count, matching the
    *     oracle's RANGE frame) — distributed across chunks.
    *  2. prev-chunk suffix: each event drops a QUERY row at `ts − W`
    *     into chunk−1; one more per-chunk window over the
    *     marker+query union (queries sort BEFORE markers at equal
    *     position, so the closed `ts − W` bound counts the tie) gives
    *     markers-strictly-before; suffix = chunk total − that, chunk
    *     totals riding on a broadcast ≤|timespan/W|-row frame.
    *
    * Two chunk-partitioned exchanges, one tiny broadcast, zero
    * data×data joins (the query rows carry their event's in-chunk
    * prefix, so nothing joins back on event_id). A single hot 30-min
    * chunk (a burst) is the C24e straggler class — the same sub-chunk
    * treatment applies (split the hot chunk, one more carry level);
    * not wired here because the band is what bounds the chunk. */
  def rangeCount(events: DataFrame, bandUs: Long = BandUs): DataFrame = {
    require(bandUs > 0, s"bandUs must be positive, got $bandUs")
    val U = bandUs
    // FLOOR division, not Spark's truncating `div`: the suffix
    // accounting needs chunk(ts − W) == chunk(ts) − 1 EXACTLY, and
    // truncation widens the chunk at zero (trunc maps (−U, U) → 0), so
    // pre-1970 timestamps would miscount. (s − pmod(s, U)) is exactly
    // divisible, making the trailing div exact for any sign.
    val pts = events.select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("s"))
      .withColumn("c", expr(s"(s - pmod(s, ${U}L)) div ${U}L"))
    val wIn = Window.partitionBy(col("c")).orderBy(col("s"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = pts.withColumn("n_in", count(lit(1)).over(wIn))
    val markers = withIn.select(col("c"), col("s").as("pos"),
      lit(1L).as("m"), lit(null).cast("long").as("event_id"),
      lit(null).cast("long").as("n_in"))
    val queries = withIn.select((col("c") - 1).as("c"),
      (col("s") - U).as("pos"), lit(0L).as("m"), col("event_id"),
      col("n_in"))
    val wSweep = Window.partitionBy(col("c"))
      .orderBy(col("pos"), col("m"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = pts.groupBy(col("c")).agg(count(lit(1)).as("tot"))
    markers.unionByName(queries)
      .withColumn("pfx", coalesce(sum(col("m")).over(wSweep), lit(0L)))
      .filter(col("event_id").isNotNull)
      .join(broadcast(tot), Seq("c"), "left")
      .select(col("event_id"),
        (col("n_in") + coalesce(col("tot"), lit(0L)) - col("pfx"))
          .as("n_band"))
  }

  def rangeCount(spark: SparkSession, dir: String): DataFrame =
    rangeCount(Tables(spark, dir, "events"))

  /** The oracle IS the naive global RANGE window — the semantics in
    * one line, single-partition and fine in DuckDB. */
  val rangeCountSql: String =
    s"""SELECT event_id,
       |  count(*) OVER (ORDER BY epoch_us(ts)
       |    RANGE BETWEEN $BandUs PRECEDING AND CURRENT ROW) AS n_band
       |FROM events""".stripMargin

  // --------------------------------------------------------------- C43
  /** Keyed interval (band) join, PAIRS form (C43) — every (left,
    * right) pair on the same key with `right.ts ∈ [left.ts − band,
    * left.ts]`, bounds inclusive: Flink's interval join in batch, the
    * pair-producing sibling of [[rangeCount]] and the one-to-MANY
    * complement of the as-of join (attribution wants ALL clicks
    * preceding a purchase, not just the latest).
    *
    * The naive θ-join (`key equality AND ts BETWEEN`) plans an
    * equi-join on the key alone with the band as a post-join filter —
    * O(|L_k|·|R_k|) candidate amplification per key, the C24 disease.
    * Here both sides co-partition on (key, time-chunk) with chunk =
    * band width: a band spans at most two chunks, so each left row is
    * replicated to exactly its own chunk and the previous one (a
    * bounded 2× — compare the unbounded per-key blow-up), the join is
    * a true equi-join on (key, chunk), and the containment filter
    * runs inside the joined partition. Replicas carry DISTINCT chunk
    * values, so a matching right row (in exactly one chunk) meets
    * exactly one replica — no duplicate pairs, no dedup pass.
    * (Truncating `div` is safe HERE even for pre-1970 timestamps:
    * both sides chunk with the same nondecreasing step function, and
    * r ∈ [l − U, l] keeps chunk(r) ∈ {chunk(l) − 1, chunk(l)} under
    * truncation's widened zero-chunk too — spec-pinned on a
    * negative-epoch fixture. Contrast [[rangeCount]], whose suffix
    * accounting needs the EXACT chunk(ts − W) = chunk − 1 identity
    * and therefore floor-divides.)
    * Output: all left columns, the matched right ts as
    * `<tsCol>_right`, and the right payload. */
  def intervalJoinPairs(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, bandUs: Long = BandUs): DataFrame = {
    require(bandUs > 0, s"bandUs must be positive, got $bandUs")
    val rightPayload = validate(left, right, keyCol, tsCol)
    val reserved = Set("__ls", "__jc", "__rk", "__rs", "__rjc",
      s"${tsCol}_right")
    val reservedHits =
      (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedHits.isEmpty,
      s"column names reserved by the interval join present in an " +
        s"input: ${reservedHits.mkString(", ")}")
    val l = left
      .withColumn("__ls", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__jc", explode(array(
        expr(s"__ls div $bandUs"), expr(s"__ls div $bandUs - 1"))))
    val r = right.select(
      (col(keyCol).as("__rk") +:
        unix_micros(col(tsCol).cast("timestamp")).as("__rs") +:
        col(tsCol).as(s"${tsCol}_right") +:
        rightPayload.map(col)): _*)
      .withColumn("__rjc", expr(s"__rs div $bandUs"))
    l.join(r,
        col(keyCol) === col("__rk") && col("__jc") === col("__rjc") &&
          col("__rs") >= col("__ls") - bandUs && col("__rs") <= col("__ls"))
      .drop("__ls", "__jc", "__rk", "__rs", "__rjc")
  }

  /** Attribution pairs entry: for every purchase, ALL clicks by the
    * same user in the trailing 30 minutes, with the click age. */
  def joinInterval(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    intervalJoinPairs(purchases, clicks, "user_id", "ts")
      .select(col("purchase_id"), col("click_id"),
        (us(col("ts")) - us(col("ts_right"))).as("gap_us"))
  }

  /** The oracle IS the θ-join — correct single-node, amplification-
    * prone distributed (the plan this operator replaces). */
  val joinIntervalSql: String =
    s"""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       |FROM events p JOIN events c ON p.user_id = c.user_id
       | AND p.event_type = 'purchase' AND c.event_type = 'click'
       | AND epoch_us(c.ts)
       |   BETWEEN epoch_us(p.ts) - $BandUs AND epoch_us(p.ts)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof" -> (joinAsof(_, _)),
    "join_asof_tolerance" -> (joinAsofTolerance(_, _)),
    "join_asof_forward" -> (joinAsofForward(_, _)),
    "join_asof_nearest" -> (joinAsofNearest(_, _)),
    "join_asof_chunked" -> (joinAsofChunked(_, _)),
    "join_range_count" -> (rangeCount(_, _)),
    "join_interval" -> (joinInterval(_, _)))

  val oracles: Map[String, String] = Map(
    "join_asof" -> joinAsofSql,
    "join_asof_tolerance" -> joinAsofToleranceSql,
    "join_asof_forward" -> joinAsofForwardSql,
    "join_asof_nearest" -> joinAsofNearestSql,
    "join_asof_chunked" -> joinAsofSql,
    "join_range_count" -> rangeCountSql,
    "join_interval" -> joinIntervalSql)
}
