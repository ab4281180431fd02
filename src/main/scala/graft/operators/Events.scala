package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch event-analytics operators (SURVEY.md §2 C44/C45): gap-based
  * sessionization and ordered funnel matching — the two queries every
  * event warehouse runs that plain GROUP BY cannot express.
  *
  * Both are single-exchange plans: partition by user, order by time
  * within the partition, resolve everything with window carries — no
  * self-joins, no per-row probes, no state machine outside the
  * ts-ordered scan. Per-user timelines are the unit of parallelism
  * (the D2/D6 streaming twins keyed the same way), so 100 TB spreads
  * across users; a single pathological user is the C24e straggler
  * class and takes the same (key, time-chunk) treatment if it ever
  * appears. */
object Events {

  /** Inactivity gap that closes a session: 30 minutes, in µs. */
  private val SessionGapUs = 1800L * 1000000L

  /** Funnel window: the whole view→click→purchase chain must fit in
    * 24 hours (the synthetic corpus is ~33 events/user/month — sparse
    * enough that a web-style 30-minute window never completes a
    * chain; 24h exercises depth 3 AND the cutoff at every gate SF). */
  private val FunnelWindowUs = 24L * 3600L * 1000000L

  private def us(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  // --------------------------------------------------------------- C44
  /** Gap-based batch sessionization (C44) — the batch twin of D2's
    * streaming session windows: a user's events split into sessions
    * wherever consecutive events are more than [[SessionGapUs]]
    * apart, then per-session stats. The classic two-window SQL shape
    * (Kimball's "sessionize in SQL"): lag → new-session flag →
    * running sum = session index, then one groupBy. Equal timestamps
    * order by event_id for determinism, but the assignment is
    * tie-order-invariant (a zero gap never opens a session).
    *
    * One exchange on user_id; both windows and the final aggregate
    * share it (the groupBy keys are a superset of the partition key,
    * so Catalyst reuses the partitioning — no second shuffle). */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), us(col("ts")).as("s"))
      .withColumn("gap", col("s") - lag(col("s"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("s")).as("start_s"), max(col("s")).as("end_s"),
        (max(col("s")) - min(col("s"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables(spark, dir, "events"))

  val sessionizeSql: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS s FROM events),
       |g AS (SELECT user_id, event_id, s,
       |    s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
       |      AS gap
       |  FROM e),
       |x AS (SELECT user_id, s,
       |    sum(CASE WHEN gap IS NULL OR gap > $SessionGapUs
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY s, event_id
       |            ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM g)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  count(*) AS n_events,
       |  min(s) AS start_s, max(s) AS end_s,
       |  max(s) - min(s) AS duration_us
       |FROM x GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // --------------------------------------------------------------- C45
  /** Ordered funnel matching (C45) — per user, the deepest prefix of
    * view → click → purchase reachable with the whole chain inside
    * [[FunnelWindowUs]] (ClickHouse `windowFunnel` semantics in the
    * EXISTS form: depth 3 ⟺ ∃ v ≤ c ≤ p with p−v ≤ W; depth 2 ⟺
    * ∃ v ≤ c with c−v ≤ W; depth 1 ⟺ ∃ view; ties at equal ts admit
    * the chain — the as-of `>=` convention), plus the per-user count
    * of CONVERTED purchases (those with a valid depth-3 chain).
    *
    * The naive encoding is a per-user triple θ-join (the oracle —
    * correct single-node, cubic distributed). The distributed plan is
    * ONE ts-ordered carry pass, exact by a monotonicity argument:
    * latest-view-at-or-before is nondecreasing in time, so the chain
    * maximizing the view timestamp for a purchase p goes through the
    * LATEST click ≤ p and ITS latest view — the greedy backward
    * composition finds a valid chain iff one exists. Two stacked
    * carries (latest view s; latest click's (click s, view-at-click))
    * over one user-partitioned window, then a per-user aggregate.
    * Equal-ts chains resolve by tag order (view < click < purchase at
    * the same instant). One exchange, reused by the aggregate. */
  def funnel(events: DataFrame, windowUs: Long = FunnelWindowUs): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val e = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), us(col("ts")).as("s"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .otherwise(2).as("tag"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = e
      .withColumn("v_s",
        last(when(col("tag") === 0, col("s")), ignoreNulls = true).over(w))
      .withColumn("chain2",
        last(when(col("tag") === 1,
          struct(col("s").as("c_s"), col("v_s").as("v_s"))),
          ignoreNulls = true).over(w))
    val d2ok = col("tag") === 1 && col("v_s").isNotNull &&
      col("s") - col("v_s") <= windowUs
    val d3ok = col("tag") === 2 && col("chain2").isNotNull &&
      col("chain2.v_s").isNotNull &&
      col("s") - col("chain2.v_s") <= windowUs
    carried.groupBy(col("user_id"))
      .agg(
        max(when(col("tag") === 0, 1L).otherwise(0L)).as("d1"),
        max(when(d2ok, 1L).otherwise(0L)).as("d2"),
        max(when(d3ok, 1L).otherwise(0L)).as("d3"),
        sum(when(d3ok, 1L).otherwise(0L)).as("n_conversions"))
      .select(col("user_id"),
        (col("d1") + col("d2") + col("d3")).as("funnel_depth"),
        col("n_conversions"))
      .orderBy(col("user_id"))
  }

  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables(spark, dir, "events"))

  /** The oracle IS the EXISTS/θ-join formulation — the semantics
    * stated directly, cubic per user if distributed, fine in DuckDB
    * at gate scale. Depth levels are cumulative by construction
    * (a depth-3 chain contains a depth-2 chain contains a view), so
    * the flag sum equals the CASE depth. */
  val funnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS s
       |  FROM events
       |  WHERE event_type IN ('view', 'click', 'purchase')),
       |d AS (SELECT u.user_id,
       |  (SELECT CASE WHEN EXISTS (SELECT 1 FROM e v
       |      WHERE v.user_id = u.user_id AND v.event_type = 'view')
       |    THEN 1 ELSE 0 END) AS d1,
       |  (SELECT CASE WHEN EXISTS (SELECT 1 FROM e v, e c
       |      WHERE v.user_id = u.user_id AND c.user_id = u.user_id
       |        AND v.event_type = 'view' AND c.event_type = 'click'
       |        AND v.s <= c.s AND c.s - v.s <= $FunnelWindowUs)
       |    THEN 1 ELSE 0 END) AS d2,
       |  (SELECT CASE WHEN EXISTS (SELECT 1 FROM e v, e c, e p
       |      WHERE v.user_id = u.user_id AND c.user_id = u.user_id
       |        AND p.user_id = u.user_id
       |        AND v.event_type = 'view' AND c.event_type = 'click'
       |        AND p.event_type = 'purchase'
       |        AND v.s <= c.s AND c.s <= p.s
       |        AND p.s - v.s <= $FunnelWindowUs)
       |    THEN 1 ELSE 0 END) AS d3,
       |  (SELECT count(*) FROM e p
       |     WHERE p.user_id = u.user_id AND p.event_type = 'purchase'
       |       AND EXISTS (SELECT 1 FROM e v, e c
       |         WHERE v.user_id = u.user_id AND c.user_id = u.user_id
       |           AND v.event_type = 'view' AND c.event_type = 'click'
       |           AND v.s <= c.s AND c.s <= p.s
       |           AND p.s - v.s <= $FunnelWindowUs)) AS n_conversions
       |  FROM (SELECT DISTINCT user_id FROM e) u)
       |SELECT user_id, CAST(d1 + d2 + d3 AS BIGINT) AS funnel_depth,
       |  CAST(n_conversions AS BIGINT) AS n_conversions
       |FROM d ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------- C46
  /** Week width in µs (epoch-aligned weeks — deterministic, engine-
    * neutral; calendar weeks are a consumer-side relabeling). */
  private val WeekUs = 7L * 24 * 3600 * 1000000L

  /** Weekly cohort retention (C46) — the third leg of the
    * event-analytics trio: users cohorted by their FIRST-ACTIVE week,
    * then for every (cohort_week, week_offset) the count of cohort
    * members active that week and the retention rate in ppm
    * (integer: n_active·10⁶ div cohort size; offset 0 is exactly 10⁶
    * by definition — every user is active in their first week).
    *
    * Plan: distinct (user, week) pairs — ONE exchange on user_id —
    * then the cohort week as a min-over-user window on the SAME
    * partitioning (no join back to the corpus), a (cohort, offset)
    * count aggregate over the collapsed frame, and the cohort-size
    * denominators (offset-0 rows, ≤ |weeks| of them) broadcast back
    * into the ppm. Weeks floor-divide ([[rangeCount]]'s pmod
    * discipline) so pre-1970 data cohorts correctly. */
  def retention(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"),
        expr(s"(unix_micros(cast(ts as timestamp)) - " +
          s"pmod(unix_micros(cast(ts as timestamp)), ${WeekUs}L)) " +
          s"div ${WeekUs}L").as("week"))
      .distinct()
    val cohorted = uw
      .withColumn("cohort_week", min(col("week")).over(
        Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val base = cohorted.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("n_cohort"))
    cohorted.join(broadcast(base), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        expr("n_active * 1000000 div n_cohort").as("retention_ppm"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def retention(spark: SparkSession, dir: String): DataFrame =
    retention(Tables(spark, dir, "events"))

  val retentionSql: String =
    s"""WITH uw AS (SELECT DISTINCT user_id,
       |    (epoch_us(ts) - (epoch_us(ts) % $WeekUs + $WeekUs) % $WeekUs)
       |      // $WeekUs AS week
       |  FROM events),
       |c AS (SELECT user_id, week,
       |    min(week) OVER (PARTITION BY user_id) AS cohort_week
       |  FROM uw),
       |m AS (SELECT cohort_week, week - cohort_week AS week_offset,
       |    count(*) AS n_active
       |  FROM c GROUP BY 1, 2),
       |b AS (SELECT cohort_week, n_active AS n_cohort FROM m
       |  WHERE week_offset = 0)
       |SELECT m.cohort_week, m.week_offset, m.n_active, b.n_cohort,
       |  (m.n_active * 1000000) // b.n_cohort AS retention_ppm
       |FROM m JOIN b ON m.cohort_week = b.cohort_week
       |ORDER BY m.cohort_week, m.week_offset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sessionize" -> (sessionize(_, _)),
    "events_funnel" -> (funnel(_, _)),
    "events_retention" -> (retention(_, _)))

  val oracles: Map[String, String] = Map(
    "events_sessionize" -> sessionizeSql,
    "events_funnel" -> funnelSql,
    "events_retention" -> retentionSql)
}
