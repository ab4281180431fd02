package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** C26: HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
  * canonical "novel sketch" operator: COUNT(DISTINCT) at 100 TB
  * shuffles every distinct value; the HLL register table shuffles at
  * most m rows per partition per group however large the input, and
  * registers merge by elementwise max (the sketch is a semilattice, so
  * map-side combine does most of the work).
  *
  * The sketch is exposed in its MERGEABLE form (r12): [[hllSketch]]
  * emits the register table `(group…, bucket, r)` — a value a pipeline
  * can persist per partition/day/source — [[hllMerge]] combines
  * sketches by elementwise max (union + re-max: the semilattice join,
  * so merged-then-estimated ≡ estimated-over-everything, which the
  * `agg_hll_merge` entry proves cross-engine), and [[hllEstimate]]
  * finishes registers into the estimate. [[hllDistinct]] is the fused
  * one-shot composition. Production shape: sketch each day's data
  * once, store ≤m rows per (group, day), answer any date-range
  * distinct query by merging sketches — no rescan.
  *
  * Everything up to the final estimate is INTEGER-exact, which is what
  * makes the sketch cross-engine oracle-able (no library HLL is):
  *  - 60-bit hash = first 15 hex chars of md5(value-as-string)
  *    (Spark `conv(_, 16, 10)` ≡ DuckDB `CAST('0x' || _ AS BIGINT)`);
  *  - bucket = hash % m, rest = hash >> log2m;
  *  - rho = leading-zeros-in-(60−log2m)-bits + 1, computed via the
  *    BINARY-STRING length (`bin()` exists in both engines and drops
  *    leading zeros) — integer-exact, never a float log (§8: float-
  *    derived bucket keys are a correctness bug for exact keying);
  *  - register[b] = max(rho) — the groupBy(group, bucket) aggregate.
  * The only floats are the final harmonic sum Σ 2^-r — dyadic rationals
  * summed in REGISTER ORDER on both engines (`aggregate(sort_array(…))`
  * ≡ `list_reduce(list(… ORDER BY bucket))`, the §8 ordered-fold
  * idiom), with the (m − n_present) empty-register mass (each 2^0 = 1)
  * added as one exact term — and the constant α·m², folded identically
  * from the same literal tree by both engines. `v_zero` (empty
  * registers) ships so a consumer can apply the small-range linear-
  * counting correction, which needs ln and therefore stays OUT of the
  * oracle-gated output (ln is last-ulp unstable cross-engine — the C19
  * lesson). `n_exact` rides along as the demo baseline: it IS the
  * full-shuffle plan the sketch replaces.
  */
object Sketch {

  /** The mergeable sketch: HLL register table `(groupCols…, bucket, r)`
    * — at most m = 2^log2m rows per group, whatever the input size.
    * NULL values are ignored, matching COUNT(DISTINCT) semantics
    * (ADVICE r11: an unfiltered null hashed to a null bucket and
    * nulled the whole group's estimate). Merge two sketches with
    * [[hllMerge]]; finish with [[hllEstimate]] at the same log2m. */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      log2m: Int = 10): DataFrame = {
    require(log2m >= 4 && log2m <= 16, s"log2m out of range: $log2m")
    val m = 1 << log2m
    val restBits = 60 - log2m
    val gcols = groupCols.map(col)
    val hash = conv(substring(md5(col(valueCol).cast("string")), 1, 15),
      16, 10).cast("long")
    df
      .filter(col(valueCol).isNotNull)
      .select((gcols :+ hash.as("h")): _*)
      .withColumn("bucket", col("h") % m)
      .withColumn("rest", shiftright(col("h"), log2m))
      .withColumn("rho",
        when(col("rest") === 0, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(col("rest")))))
      .groupBy((gcols :+ col("bucket")): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Semilattice merge of register tables produced by [[hllSketch]] at
    * the SAME log2m over the SAME group schema: union + elementwise
    * max. Associative, commutative, idempotent — per-day/per-source
    * sketches compose in any order to exactly the sketch of the
    * concatenated input (`agg_hll_merge` gates this cross-engine). */
  def hllMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "hllMerge needs at least one sketch")
    val gcols = groupCols.map(col)
    sketches.reduce(_.unionByName(_))
      .groupBy((gcols :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Finisher: registers → `(groupCols…, v_zero, hll_estimate)`. Must
    * be called with the log2m the registers were built at. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
      log2m: Int = 10): DataFrame = {
    require(log2m >= 4 && log2m <= 16, s"log2m out of range: $log2m")
    val m = 1 << log2m
    val gcols = groupCols.map(col)
    val alphaM2 = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
      lit(m.toDouble) * lit(m.toDouble)
    regs
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("n_present"),
        expr("""aggregate(
               |  sort_array(collect_list(named_struct(
               |    'bucket', bucket, 'w', pow(2.0, -r)))),
               |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.w)""".stripMargin)
          .as("s_present"))
      .select(
        (gcols :+
          (lit(m) - col("n_present")).cast("long").as("v_zero") :+
          (alphaM2 / (col("s_present") +
            (lit(m) - col("n_present")).cast("double"))).as("hll_estimate")): _*)
  }

  /** One-shot composition: HLL registers + raw estimate per group.
    * `log2m` in [4, 16]; m = 2^log2m registers. Library form: any
    * frame, any group columns, any value column with a stable string
    * form. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      log2m: Int = 10): DataFrame =
    hllEstimate(hllSketch(df, groupCols, valueCol, log2m), groupCols, log2m)

  /** Entry: distinct users per event type, sketched (m = 1024) next to
    * the exact count the sketch replaces. */
  def hllUsers(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val sketch = hllDistinct(events, Seq("event_type"), "user_id", log2m = 10)
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    sketch.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("v_zero"),
        col("hll_estimate"))
  }

  val hllUsersSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM events WHERE user_id IS NOT NULL),
      |b AS (SELECT event_type, h % 1024 AS bucket, h >> 10 AS rest FROM h),
      |r AS (SELECT event_type, bucket,
      |        max(CASE WHEN rest = 0 THEN 51
      |                 ELSE 51 - length(bin(rest)) END) AS r
      |      FROM b GROUP BY 1, 2),
      |g AS (SELECT event_type, count(*) AS n_present,
      |        list_reduce(list(pow(2.0, -r) ORDER BY bucket),
      |                    (acc, x) -> acc + x) AS s_present
      |      FROM r GROUP BY 1),
      |e AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
      |      FROM events GROUP BY 1)
      |SELECT g.event_type, e.n_exact,
      |  CAST(1024 - n_present AS BIGINT) AS v_zero,
      |  (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
      |    (s_present + CAST(1024 - n_present AS DOUBLE)) AS hll_estimate
      |FROM g JOIN e ON g.event_type = e.event_type""".stripMargin

  /** Entry (r13): the PRODUCTION path — sketch-only, no exact
    * baseline riding along. `agg_hll_distinct` deliberately computes
    * `countDistinct` NEXT TO the sketch as the demo of what the
    * sketch replaces, which makes its bench line the cost of the
    * full-shuffle baseline, not of the sketch (r12 verdict noted the
    * bench-readability trap). This entry is what a user actually
    * runs: registers → estimate, ≤1024 bounded rows per group across
    * the wire, nothing else — its bench line IS the sketch's cost.
    * The estimate arithmetic is the proven integer-exact pipeline, so
    * the oracle gates it exactly, baseline-free. */
  def hllUsersProduction(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    hllDistinct(events, Seq("event_type"), "user_id", log2m = 10)
      .select(col("event_type"), col("v_zero"), col("hll_estimate"))
  }

  val hllUsersProductionSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM events WHERE user_id IS NOT NULL),
      |b AS (SELECT event_type, h % 1024 AS bucket, h >> 10 AS rest FROM h),
      |r AS (SELECT event_type, bucket,
      |        max(CASE WHEN rest = 0 THEN 51
      |                 ELSE 51 - length(bin(rest)) END) AS r
      |      FROM b GROUP BY 1, 2),
      |g AS (SELECT event_type, count(*) AS n_present,
      |        list_reduce(list(pow(2.0, -r) ORDER BY bucket),
      |                    (acc, x) -> acc + x) AS s_present
      |      FROM r GROUP BY 1)
      |SELECT event_type,
      |  CAST(1024 - n_present AS BIGINT) AS v_zero,
      |  (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
      |    (s_present + CAST(1024 - n_present AS DOUBLE)) AS hll_estimate
      |FROM g""".stripMargin

  /** Entry: the MERGE path proven against the direct path — events are
    * split into two disjoint shards (event_id parity — the stand-in
    * for "two days of data sketched independently"), each shard
    * sketched on its own, the sketches merged, and the merged estimate
    * emitted NEXT TO the direct single-pass estimate. Because merge is
    * the semilattice join, the two estimates must be IDENTICAL doubles
    * — the oracle computes both sides independently, so a hash match
    * proves the composition law holds in both engines. */
  def hllUsersMerged(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val shards = Seq(0, 1).map(p =>
      hllSketch(events.filter(pmod(col("event_id"), lit(2)) === p),
        Seq("event_type"), "user_id", log2m = 10))
    val merged = hllEstimate(hllMerge(shards, Seq("event_type")),
        Seq("event_type"), log2m = 10)
      .select(col("event_type"), col("hll_estimate").as("est_merged"))
    val direct = hllDistinct(events, Seq("event_type"), "user_id", log2m = 10)
      .select(col("event_type"), col("hll_estimate").as("est_direct"))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    direct.join(merged, Seq("event_type")).join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("est_direct"),
        col("est_merged"))
  }

  val hllUsersMergedSql: String =
    """WITH h AS (
      |  SELECT event_type, event_id % 2 AS part,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM events WHERE user_id IS NOT NULL),
      |b AS (SELECT event_type, part, h % 1024 AS bucket, h >> 10 AS rest FROM h),
      |rp AS (SELECT event_type, part, bucket,
      |         max(CASE WHEN rest = 0 THEN 51
      |                  ELSE 51 - length(bin(rest)) END) AS r
      |       FROM b GROUP BY 1, 2, 3),
      |rm AS (SELECT event_type, bucket, max(r) AS r FROM rp GROUP BY 1, 2),
      |rd AS (SELECT event_type, bucket,
      |         max(CASE WHEN rest = 0 THEN 51
      |                  ELSE 51 - length(bin(rest)) END) AS r
      |       FROM b GROUP BY 1, 2),
      |gm AS (SELECT event_type, count(*) AS n_present,
      |         list_reduce(list(pow(2.0, -r) ORDER BY bucket),
      |                     (acc, x) -> acc + x) AS s_present
      |       FROM rm GROUP BY 1),
      |gd AS (SELECT event_type, count(*) AS n_present,
      |         list_reduce(list(pow(2.0, -r) ORDER BY bucket),
      |                     (acc, x) -> acc + x) AS s_present
      |       FROM rd GROUP BY 1),
      |e AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
      |      FROM events GROUP BY 1)
      |SELECT gd.event_type, e.n_exact,
      |  (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
      |    (gd.s_present + CAST(1024 - gd.n_present AS DOUBLE)) AS est_direct,
      |  (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 /
      |    (gm.s_present + CAST(1024 - gm.n_present AS DOUBLE)) AS est_merged
      |FROM gd JOIN gm ON gd.event_type = gm.event_type
      |JOIN e ON gd.event_type = e.event_type""".stripMargin

  // --------------------------------------------------------------- C29
  /** Mergeable log2-histogram quantile sketch — the quantile twin of
    * the C26 register table: an exact quantile at 100 TB is a full
    * sort (or a corpus-wide percentile shuffle); this sketch shuffles
    * at most ~64 `(group, bucket, cnt)` rows per partition per group
    * and answers any quantile with a factor-of-two value bound —
    * the right first-pass shape for "what's the p99 doc length per
    * source" over a corpus (follow up exactly on the one bucket if
    * tighter bounds are needed).
    *
    * Everything is INTEGER-exact, so the sketch is cross-engine
    * oracle-able end-to-end (q-digest/KLL are not):
    *  - bucket = bit length of the non-negative long value, via the
    *    same `length(bin(v))` idiom as C26's rho (0 for v = 0) — an
    *    integer log2, never a float one (§8);
    *  - sketch = groupBy(group, bucket) count — map-side combined;
    *  - merge = union + SUM (counts are a commutative monoid — the
    *    spec proves shard-merge ≡ direct);
    *  - rank_p = ceil(n·p/100) computed as (n·p + 99) div 100 in
    *    integer arithmetic (no float multiply);
    *  - quantile bucket = min bucket with cumulative count ≥ rank_p
    *    (bucket-ordered window cumsum — identical in both engines);
    *    the answer ships as the exact integer bounds [2^(b-1), 2^b)
    *    of that bucket, which CONTAIN the exact p-quantile by
    *    construction (spec-checked against a driver-side sort).
    * Values must be non-negative longs (cents, token counts, bytes —
    * scale decimals exactly first). A negative value FAILS FAST
    * (raise_error in the bucket branch — ADVICE r12: it would land in
    * the two's-complement top bucket with nonsense bounds, and a
    * silently dropped or mis-bucketed value is a wrong quantile). */
  /** THE bucket expression — shared by [[logHistSketch]] (pass 1) and
    * [[exactQuantiles]]' pass 2 so the two passes can never drift
    * (ADVICE r13): bit length of the non-negative long `v` (0 for 0),
    * failing FAST on negatives in BOTH passes — a negative value that
    * appears only on a re-scan (non-deterministic source) would
    * otherwise silently mis-bucket pass 2. */
  private def bucketOf(v: Column, valueCol: String): Column =
    when(v < 0, raise_error(concat(
      lit("graft logHistSketch: negative value "),
      v.cast("string"),
      lit(s" in column $valueCol — scale to non-negative integers first"))))
      .when(v === 0, lit(0))
      .otherwise(length(bin(v)))

  def logHistSketch(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .select((gcols :+ col(valueCol).cast("long").as("v")): _*)
      .withColumn("bucket", bucketOf(col("v"), valueCol))
      .groupBy((gcols :+ col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Monoid merge of [[logHistSketch]] tables over the same group
    * schema: union + per-bucket count sum. */
  def logHistMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "logHistMerge needs at least one sketch")
    val gcols = groupCols.map(col)
    sketches.reduce(_.unionByName(_))
      .groupBy((gcols :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Finisher: per group, for each requested integer percentile p,
    * the factor-of-two bounds `p<p>_lo`/`p<p>_hi` of the bucket the
    * exact p-quantile falls in, plus the group count `n`. */
  def logHistQuantile(sketch: DataFrame, groupCols: Seq[String],
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100]: $percentiles")
    val gcols = groupCols.map(col)
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(gcols: _*)
    val c = sketch
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    // the quantile bucket as a SQL fragment so lo/hi stay textually
    // symmetric with the oracle's CASE tree. Bucket 63's hi bound is
    // clamped to Long.MaxValue EXPLICITLY (ADVICE r12: Spark's
    // shiftleft(1,63)-1 only lands there by wraparound; DuckDB's
    // checked 1::BIGINT << 63 raises — the clamp makes both engines
    // compute the same value by the same arithmetic).
    def bq(p: Int) =
      s"min(CASE WHEN cum >= (n * $p + 99) div 100 THEN bucket END)"
    val qCols = percentiles.flatMap { p => Seq(
      expr(s"CAST(CASE WHEN ${bq(p)} = 0 THEN 0 ELSE " +
          s"shiftleft(CAST(1 AS BIGINT), ${bq(p)} - 1) END AS BIGINT)")
        .as(s"p${p}_lo"),
      expr(s"CAST(CASE WHEN ${bq(p)} = 0 THEN 0 " +
          s"WHEN ${bq(p)} >= 63 THEN 9223372036854775807 ELSE " +
          s"shiftleft(CAST(1 AS BIGINT), ${bq(p)}) - 1 END AS BIGINT)")
        .as(s"p${p}_hi"))
    }
    c.groupBy(gcols: _*)
      .agg(max(col("n")).cast("long").as("n"), qCols: _*)
  }

  /** Entry: order-value quantile bounds per order priority — exact
    * decimal cents (the Olap money discipline: DECIMAL(18,2)·100,
    * never a double cast), p50/p90/p99 bounds from the sketch next to
    * the exact count. */
  def quantileOrderValues(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    val sk = logHistSketch(orders, Seq("o_orderpriority"), "cents")
    logHistQuantile(sk, Seq("o_orderpriority"), Seq(50, 90, 99))
  }

  /** Entry (C29b, r13 — the C26b treatment for the quantile sketch):
    * the MERGE path proven against the direct path cross-engine.
    * Orders are sharded by o_orderkey parity (the stand-in for two
    * days sketched independently), each shard sketched on its own,
    * the sketches merged with [[logHistMerge]] (union + count sum —
    * the commutative-monoid law), and the merged quantile bounds
    * emitted NEXT TO the direct single-pass bounds. Counts are exact
    * integers, so merged ≡ direct must hash-match exactly — the
    * oracle computes both paths independently. */
  def quantileOrderValuesMerged(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    val shards = Seq(0, 1).map(p =>
      logHistSketch(orders.filter(pmod(col("o_orderkey"), lit(2)) === p),
        Seq("o_orderpriority"), "cents"))
    val merged = logHistQuantile(logHistMerge(shards, Seq("o_orderpriority")),
        Seq("o_orderpriority"), Seq(50, 99))
      .select(col("o_orderpriority"), col("n"),
        col("p50_lo").as("p50_lo_m"), col("p50_hi").as("p50_hi_m"),
        col("p99_lo").as("p99_lo_m"), col("p99_hi").as("p99_hi_m"))
    val direct = logHistQuantile(
        logHistSketch(orders, Seq("o_orderpriority"), "cents"),
        Seq("o_orderpriority"), Seq(50, 99))
      .select(col("o_orderpriority"),
        col("p50_lo").as("p50_lo_d"), col("p50_hi").as("p50_hi_d"),
        col("p99_lo").as("p99_lo_d"), col("p99_hi").as("p99_hi_d"))
    merged.join(direct, Seq("o_orderpriority"))
  }

  val quantileOrderValuesMergedSql: String =
    """WITH v AS (SELECT o_orderpriority AS g, o_orderkey % 2 AS part,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |sp AS (SELECT g, part, CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bucket,
      |         count(*) AS cnt FROM v GROUP BY 1, 2, 3),
      |sm AS (SELECT g, bucket, sum(cnt) AS cnt FROM sp GROUP BY 1, 2),
      |sd AS (SELECT g, CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bucket,
      |         count(*) AS cnt FROM v GROUP BY 1, 2),
      |cm AS (SELECT g, bucket, cnt,
      |         sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
      |         sum(cnt) OVER (PARTITION BY g) AS n FROM sm),
      |cd AS (SELECT g, bucket, cnt,
      |         sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
      |         sum(cnt) OVER (PARTITION BY g) AS n FROM sd),
      |em AS (SELECT g, max(n) AS n,
      |         min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) AS b50,
      |         min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) AS b99
      |       FROM cm GROUP BY g),
      |ed AS (SELECT g,
      |         min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) AS b50,
      |         min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) AS b99
      |       FROM cd GROUP BY g)
      |SELECT em.g AS o_orderpriority, CAST(em.n AS BIGINT) AS n,
      |  CAST(CASE WHEN em.b50 = 0 THEN 0 ELSE 1::BIGINT << (em.b50 - 1) END AS BIGINT) AS p50_lo_m,
      |  CAST(CASE WHEN em.b50 = 0 THEN 0 WHEN em.b50 >= 63 THEN 9223372036854775807 ELSE (1::BIGINT << em.b50) - 1 END AS BIGINT) AS p50_hi_m,
      |  CAST(CASE WHEN em.b99 = 0 THEN 0 ELSE 1::BIGINT << (em.b99 - 1) END AS BIGINT) AS p99_lo_m,
      |  CAST(CASE WHEN em.b99 = 0 THEN 0 WHEN em.b99 >= 63 THEN 9223372036854775807 ELSE (1::BIGINT << em.b99) - 1 END AS BIGINT) AS p99_hi_m,
      |  CAST(CASE WHEN ed.b50 = 0 THEN 0 ELSE 1::BIGINT << (ed.b50 - 1) END AS BIGINT) AS p50_lo_d,
      |  CAST(CASE WHEN ed.b50 = 0 THEN 0 WHEN ed.b50 >= 63 THEN 9223372036854775807 ELSE (1::BIGINT << ed.b50) - 1 END AS BIGINT) AS p50_hi_d,
      |  CAST(CASE WHEN ed.b99 = 0 THEN 0 ELSE 1::BIGINT << (ed.b99 - 1) END AS BIGINT) AS p99_lo_d,
      |  CAST(CASE WHEN ed.b99 = 0 THEN 0 WHEN ed.b99 >= 63 THEN 9223372036854775807 ELSE (1::BIGINT << ed.b99) - 1 END AS BIGINT) AS p99_hi_d
      |FROM em JOIN ed ON em.g = ed.g""".stripMargin

  // -------------------------------------------------------------- C29c
  /** Exact discrete quantiles via the sketch + ONE bounded refinement
    * pass (the follow-up the C29 scaladoc promised): pass 1 builds the
    * log2-histogram (≤64 partial rows per group per partition); pass 2
    * rescans ONLY the rows of each percentile's target bucket (the
    * broadcast semi-join below) and rank-selects within it. The exact
    * quantile is the rank_p-th smallest value (rank_p = ceil(n·p/100),
    * integer arithmetic — DuckDB quantile_disc semantics made
    * explicit), found at rank (rank_p − cum_before_bucket) within the
    * target bucket.
    *
    * Scale: the refinement sorts per (group, percentile) ONLY the
    * target bucket's rows — for value distributions spread across
    * buckets that's a small fraction of the group (factor-of-two
    * bucketing ⇒ roughly the mass within 2× of the quantile); the
    * degenerate worst case (all values in one bucket) is an honest
    * full-group sort, which is what an exact quantile costs anyway.
    *
    * MEASURED at sf10 (bench_points_r13/quantile_ab_sf10.json,
    * interleaved, equality-guarded): refined 7.5s vs naive full-sort
    * rank-selection 6.9s — 0.92×. In the IN-MEMORY regime the naive
    * sort's single scan beats this plan's two scans; the refinement's
    * win is (a) the SPILL regime — the naive window sorts every row
    * (working set = the whole group) while pass 2 sorts only the
    * target-bucket mass — and (b) the PERSISTED-SKETCH regime, where
    * pass 1 already exists per day/source and an exact quantile costs
    * only the bounded pass 2. Use naive below those regimes; the
    * ≤10% in-memory penalty bounds the cost of choosing wrong. */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100]: $percentiles")
    val gcols = groupCols.map(col)
    val sk = logHistSketch(df, groupCols, valueCol)
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(gcols: _*)
    val c = sk
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    // per (group, percentile): target bucket qb, global rank rank_p,
    // rank within the bucket k = rank_p − (cum(qb) − cnt(qb)).
    // Percentiles fan out by exploding a LITERAL array — map-side only,
    // no join of any kind (a crossJoin(broadcast(...)) here compiles to
    // a BroadcastNestedLoopJoin, which the plan audit rightly forbids)
    val targets = c
      .withColumn("p", explode(array(percentiles.map(lit(_)): _*)))
      .withColumn("rank_p", expr("(n * p + 99) div 100"))
      .filter(col("cum") >= col("rank_p"))
      .groupBy((gcols :+ col("p") :+ col("rank_p") :+ col("n")): _*)
      .agg(min(col("bucket")).as("qb"))
    val kFrame = targets.as("t")
      .join(c.as("s"),
        groupCols.map(g => col(s"t.$g") === col(s"s.$g"))
          .reduce(_ && _) && col("s.bucket") === col("t.qb"))
      .select((groupCols.map(g => col(s"t.$g")) :+ col("t.p") :+ col("t.n") :+
        col("t.qb") :+
        (col("t.rank_p") - (col("s.cum") - col("s.cnt"))).as("k")): _*)
    // pass 2: only the target buckets' rows survive the broadcast join;
    // the bucket expression (incl. the negative-value guard) is THE
    // shared bucketOf — pass 2 re-derives buckets from df, so on a
    // source that changed between passes it must fail fast too
    val bucketed = df
      .filter(col(valueCol).isNotNull)
      .select((gcols :+ col(valueCol).cast("long").as("v")): _*)
      .withColumn("bucket", bucketOf(col("v"), valueCol))
    val candidates = bucketed.as("d")
      .join(broadcast(kFrame.as("q")),
        groupCols.map(g => col(s"d.$g") === col(s"q.$g"))
          .reduce(_ && _) && col("d.bucket") === col("q.qb"))
      .select((groupCols.map(g => col(s"d.$g")) :+ col("d.v") :+
        col("q.p") :+ col("q.n") :+ col("q.k")): _*)
    val wRank = Window.partitionBy((gcols :+ col("p")): _*).orderBy(col("v"))
    val picked = candidates
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === col("k"))
    picked.groupBy(gcols: _*)
      .agg(max(col("n")).cast("long").as("n"),
        percentiles.map(p =>
          max(when(col("p") === p, col("v"))).cast("long").as(s"p$p")): _*)
  }

  /** Entry: EXACT p50/p90/p99 order-value cents per priority — the
    * refinement pass next to the C29 bounds; oracle is an explicit
    * rank selection (row_number = ceil(n·p/100)), integer-exact. */
  def exactOrderValueQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    exactQuantiles(orders, Seq("o_orderpriority"), "cents", Seq(50, 90, 99))
  }

  val exactOrderValueQuantilesSql: String =
    """WITH v AS (SELECT o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |r AS (SELECT g, v,
      |        row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
      |        count(*) OVER (PARTITION BY g) AS n
      |      FROM v)
      |SELECT g AS o_orderpriority, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END) AS BIGINT) AS p50,
      |  CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN v END) AS BIGINT) AS p90,
      |  CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN v END) AS BIGINT) AS p99
      |FROM r GROUP BY g""".stripMargin

  // --------------------------------------------------------------- C30
  /** Count-min heavy-hitters sketch (Cormode & Muthukrishnan 2005) —
    * the third member of the mergeable-sketch family (HLL = distinct,
    * log-histogram = quantiles, CMS = frequencies): "what are the hot
    * items per group" at 100 TB without shuffling one row per item
    * occurrence. The sketch is a d×w counter table per group —
    * `counter[r][h_r(x)] += 1` — so at most d·w = 192 rows per group
    * per partition cross the shuffle (map-side combined) however large
    * the input, and a point estimate is `min over r of
    * counter[r][h_r(x)]`, which is ALWAYS ≥ the true count and exceeds
    * it by more than ε·N (ε = e/w) with probability < e^-d per row.
    *
    * Counters are sums — a commutative monoid — so per-day/per-source
    * sketches merge by per-cell addition into EXACTLY the sketch of
    * the concatenated input ([[topkMerge]]; the `agg_topk_sketch_merge`
    * entry proves merged ≡ direct cross-engine, the C26b treatment).
    *
    * Everything is INTEGER-exact and the hashes are md5-derived
    * (`h_r(x)` = first 15 hex chars of md5(r ‖ '|' ‖ x), mod w — the
    * C26 conv idiom), so DuckDB replays the sketch bit-for-bit: the
    * driver gate checks the ESTIMATES, not just shapes.
    *
    * LLM-pipeline use: hot-gram / boilerplate detection per source —
    * the df-signal that feeds the C4c dispatcher and C23's span
    * scoring — without a full (gram → count) aggregation. Candidate
    * ENUMERATION at scale comes from a bounded per-partition local
    * top-m pass (classic SpaceSaving-per-partition, union of local
    * candidates); the gated entries enumerate distinct tokens because
    * at gate SFs that IS the bounded set and it keeps the oracle a
    * pure SQL replay. */
  private[graft] val CmsDepth = 3
  private[graft] val CmsWidth = 64

  /** The mergeable sketch: `(groupCols…, r, bucket, cnt)` — at most
    * d·w rows per group. `itemCol` must have a stable string form.
    *
    * r18 opt: the md5 bucket hash depends only on (r, item), so the
    * occurrence stream is first collapsed to per-(group, item) counts
    * (map-side combinable, vocabulary-bounded) and the [[CmsDepth]]
    * md5s are computed once per DISTINCT item instead of once per
    * occurrence — identical cell sums by commutativity, ~occurrences/
    * vocabulary fewer hashes (the dominant per-row cost at scale). */
  def topkSketch(df: DataFrame, groupCols: Seq[String],
      itemCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    df.filter(col(itemCol).isNotNull)
      .select((gcols :+ col(itemCol).cast("string").as("item")): _*)
      .groupBy((gcols :+ col("item")): _*)
      .agg(count(lit(1)).as("occ"))
      .withColumn("r", explode(array((0 until CmsDepth).map(lit(_)): _*)))
      .withColumn("bucket", cmsBucket(col("r"), col("item")))
      .groupBy((gcols :+ col("r") :+ col("bucket")): _*)
      .agg(sum(col("occ")).as("cnt"))
  }

  private def cmsBucket(r: Column, item: Column): Column =
    pmod(conv(substring(md5(concat(r.cast("string"), lit("|"), item)),
      1, 15), 16, 10).cast("long"), lit(CmsWidth.toLong))

  /** JVM-side twin of [[cmsBucket]] for state folds that run outside
    * Catalyst (the D7 streaming sketch): first 15 hex chars of
    * md5(r ‖ '|' ‖ item) as an unsigned 60-bit integer, mod
    * [[CmsWidth]] — byte-identical to the Column form (SketchSpec pins
    * the agreement on a fixture; the D7 streamed-equals-batch law
    * re-proves it over every token of a real feed). */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[graft] def cmsBucketLocal(r: Int, item: String): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s"$r|$item".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = the digest's first 60 bits = (first 8 bytes
    // as an unsigned 64-bit integer) >>> 4 — no hex-string round trip
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    ((x >>> 4) % CmsWidth).toInt
  }

  /** Monoid merge of [[topkSketch]] tables over the same group schema:
    * union + per-cell count sum. */
  def topkMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "topkMerge needs at least one sketch")
    val gcols = groupCols.map(col)
    sketches.reduce(_.unionByName(_))
      .groupBy((gcols :+ col("r") :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Finisher: estimate each candidate item's count from the sketch
    * (min over the d rows) and keep the top k per group, ranked
    * (estimate DESC, item ASC — deterministic). Candidates join the
    * sketch on (group, r, bucket): 3 rows per candidate, a bounded
    * shuffle. */
  def topkEstimate(sketch: DataFrame, candidates: DataFrame,
      groupCols: Seq[String], k: Int): DataFrame = {
    val gcols = groupCols.map(col)
    val cand = candidates
      .withColumn("r", explode(array((0 until CmsDepth).map(lit(_)): _*)))
      .withColumn("bucket", cmsBucket(col("r"), col("item")))
    val est = cand.join(sketch, groupCols ++ Seq("r", "bucket"))
      .groupBy((gcols :+ col("item")): _*)
      .agg(min(col("cnt")).cast("long").as("est"))
    val w = Window.partitionBy(gcols: _*)
      .orderBy(col("est").desc, col("item").asc)
    est.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select((gcols :+ col("rank") :+ col("item") :+ col("est")): _*)
  }

  private def docTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("item"))
      .filter(length(col("item")) > 0)

  /** Entry: top-10 hottest words per document source, CMS-estimated
    * (d=3, w=64 — small enough that collisions are REAL at gate SFs,
    * so the gate exercises the min-over-rows estimate, not a
    * pass-through). */
  def topkWords(spark: SparkSession, dir: String): DataFrame = {
    val toks = docTokens(spark, dir)
    val sketch = topkSketch(toks, Seq("source"), "item")
    val cand = toks.select(col("source"), col("item")).distinct()
    topkEstimate(sketch, cand, Seq("source"), 10)
  }

  private val topkSqlCommon =
    s"""WITH toks AS (
       |  SELECT doc_id, source, tok AS item
       |  FROM documents, unnest(string_split(text, ' ')) AS u(tok)
       |  WHERE len(tok) > 0),
       |rows3 AS (
       |  SELECT doc_id, source, item, r,
       |    CAST('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || item), 1, 15)
       |      AS BIGINT) % $CmsWidth AS bucket
       |  FROM toks, unnest([${(0 until CmsDepth).mkString(", ")}]) AS rr(r))""".stripMargin

  val topkWordsSql: String =
    s"""$topkSqlCommon,
       |sk AS (SELECT source, r, bucket, count(*) AS cnt
       |       FROM rows3 GROUP BY 1, 2, 3),
       |cand AS (SELECT DISTINCT source, item, r, bucket FROM rows3),
       |est AS (SELECT cand.source, cand.item,
       |          CAST(min(sk.cnt) AS BIGINT) AS est
       |        FROM cand JOIN sk ON cand.source = sk.source
       |          AND cand.r = sk.r AND cand.bucket = sk.bucket
       |        GROUP BY 1, 2),
       |rk AS (SELECT source, item, est,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY est DESC, item) AS rank
       |       FROM est)
       |SELECT source, CAST(rank AS BIGINT) AS rank, item, est
       |FROM rk WHERE rank <= 10""".stripMargin

  /** Entry (C30b): the MERGE path proven against the direct path —
    * documents sharded by doc_id parity (two "days" sketched
    * independently), per-shard sketches merged by per-cell count sum,
    * and the merged top-10 emitted NEXT TO the direct top-10. Counts
    * are exact integers and the cells are identical, so merged ≡
    * direct must hash-match — the oracle computes both independently. */
  def topkWordsMerged(spark: SparkSession, dir: String): DataFrame = {
    val toks = docTokens(spark, dir)
    val shards = Seq(0, 1).map(p =>
      topkSketch(toks.filter(pmod(col("doc_id"), lit(2)) === p),
        Seq("source"), "item"))
    val merged = topkMerge(shards, Seq("source"))
    val cand = toks.select(col("source"), col("item")).distinct()
    val m = topkEstimate(merged, cand, Seq("source"), 10)
      .withColumnRenamed("est", "est_merged")
    val d = topkEstimate(topkSketch(toks, Seq("source"), "item"),
        cand, Seq("source"), 10)
      .withColumnRenamed("est", "est_direct")
    m.join(d, Seq("source", "rank", "item"))
      .select(col("source"), col("rank"), col("item"),
        col("est_merged"), col("est_direct"))
  }

  val topkWordsMergedSql: String =
    s"""$topkSqlCommon,
       |skp AS (SELECT source, doc_id % 2 AS part, r, bucket, count(*) AS cnt
       |        FROM rows3 GROUP BY 1, 2, 3, 4),
       |skm AS (SELECT source, r, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
       |        FROM skp GROUP BY 1, 2, 3),
       |skd AS (SELECT source, r, bucket, count(*) AS cnt
       |        FROM rows3 GROUP BY 1, 2, 3),
       |cand AS (SELECT DISTINCT source, item, r, bucket FROM rows3),
       |estm AS (SELECT cand.source, cand.item,
       |           CAST(min(skm.cnt) AS BIGINT) AS est_merged
       |         FROM cand JOIN skm ON cand.source = skm.source
       |           AND cand.r = skm.r AND cand.bucket = skm.bucket
       |         GROUP BY 1, 2),
       |estd AS (SELECT cand.source, cand.item,
       |           CAST(min(skd.cnt) AS BIGINT) AS est_direct
       |         FROM cand JOIN skd ON cand.source = skd.source
       |           AND cand.r = skd.r AND cand.bucket = skd.bucket
       |         GROUP BY 1, 2),
       |rkm AS (SELECT source, item, est_merged,
       |          row_number() OVER (PARTITION BY source
       |                             ORDER BY est_merged DESC, item) AS rank
       |        FROM estm),
       |rkd AS (SELECT source, item, est_direct,
       |          row_number() OVER (PARTITION BY source
       |                             ORDER BY est_direct DESC, item) AS rank
       |        FROM estd)
       |SELECT rkm.source, CAST(rkm.rank AS BIGINT) AS rank, rkm.item,
       |  rkm.est_merged, rkd.est_direct
       |FROM rkm JOIN rkd ON rkm.source = rkd.source
       |  AND rkm.rank = rkd.rank AND rkm.item = rkd.item
       |WHERE rkm.rank <= 10""".stripMargin

  // ------------------------------------------------------ C47 KMV sketch
  /** Sketch size: bottom-64 hashes per group. */
  private[graft] val KmvK = 64

  /** Hash space: 12 hex chars of md5 = exactly 48 bits, so
    * (K−1)·M ≈ 2⁵⁴ stays long-safe through the estimator and the
    * intersection rescale (ρ·d ≤ 64·63·2⁴⁸ < 2⁶³). */
  private val KmvM = 1L << 48

  /** The engine-neutral KMV hash: md5-derived 48-bit integer. */
  private def kmvHash(c: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), c.cast("string"))), 1, 12),
      16, 10).cast("long")

  /** JVM twin of [[kmvHash]] for the streaming fold (the
    * cmsBucketLocal precedent) — first 12 hex chars of the md5 as an
    * unsigned 48-bit long; byte parity with the Column form is
    * spec-pinned. */
  private[graft] def kmvHashLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(("kmv:" + s).getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  private def kmvAggCol(h: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.KmvAgg(Bridge.expression(h), KmvK)
      .toAggregateExpression())
  }

  /** KMV bottom-k distinct sketch per group (C47) — the sketch HLL
    * cannot be: because it keeps actual hash SAMPLES, two groups'
    * sketches compose into SET-OPERATION estimates ([[kmvOverlap]]).
    * Per event_type over distinct users: the ascending bottom-64 hash
    * array (pinned by md5 digest), θ = its max, and the distinct
    * estimate d̂ = (K−1)·M div θ — EXACT (= the kept count) below K
    * distinct, the classical KMV estimator above it, all integer
    * arithmetic so DuckDB replays the ESTIMATES (the C30 discipline).
    * [[graft.functions.KmvAgg]] dedups inside the partial-agg buffer:
    * ≤64 longs per group per map task cross the wire, no global
    * DISTINCT pass. */
  def kmvDistinct(events: DataFrame): DataFrame =
    kmvFinish(events
      .select(col("event_type"), kmvHash(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(kmvAggCol(col("h")).as("sk")))

  /** Shared KMV finisher over an (event_type, sk: ascending ≤K longs)
    * frame — the estimate/digest projection of [[kmvDistinct]], reused
    * by the streaming form (D8), whose state re-merges to exactly this
    * shape by the bottom-k semilattice law. */
  private[graft] def kmvFinish(skFrame: DataFrame): DataFrame = {
    val sk = col("sk")
    skFrame
      .select(col("event_type"),
        size(sk).cast("long").as("n_kept"),
        element_at(sk, size(sk)).as("theta"),
        when(size(sk) < KmvK, size(sk).cast("long"))
          .otherwise(expr(
            s"(${KmvK - 1}L * ${KmvM}L) div greatest(element_at(sk, $KmvK), 1L)"))
          .as("d_hat"),
        md5(concat_ws(",", transform(sk, x => x.cast("string"))))
          .as("sketch_md5"))
      .orderBy(col("event_type"))
  }

  def kmvDistinct(spark: SparkSession, dir: String): DataFrame =
    kmvDistinct(Tables(spark, dir, "events"))

  val kmvDistinctSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type,
       |    ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |  FROM events),
       |r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM d),
       |s AS (SELECT event_type, count(*) AS n_kept, max(h) AS theta,
       |    md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS sketch_md5
       |  FROM r WHERE rn <= $KmvK GROUP BY event_type)
       |SELECT event_type, CAST(n_kept AS BIGINT) AS n_kept, theta,
       |  CASE WHEN n_kept < $KmvK THEN CAST(n_kept AS BIGINT)
       |    ELSE (${KmvK - 1} * $KmvM) // greatest(theta, 1) END AS d_hat,
       |  sketch_md5
       |FROM s ORDER BY event_type""".stripMargin

  /** Driver-side KMV set-operation estimate over two sketches —
    * bounded input (two ≤K-long ascending arrays), pure integer
    * arithmetic, shared by the entry and the spec. Returns
    * (L = |union bottom-k|, θ, ρ, d̂_union, Jaccard ppm, |A∩B| hat). */
  private[operators] def kmvOverlapStats(a: Seq[Long], b: Seq[Long])
      : (Long, Long, Long, Long, Long, Long) = {
    val sa = a.toSet; val sb = b.toSet
    val u = (sa ++ sb).toSeq.sorted.take(KmvK)
    val L = u.size.toLong
    val theta = if (u.nonEmpty) u.last else 0L
    val rho = u.count(h => sa(h) && sb(h)).toLong
    val dU = if (L < KmvK) L
      else (KmvK - 1).toLong * KmvM / math.max(theta, 1L)
    val jPpm = if (L == 0) 0L else rho * 1000000L / L
    val inter = if (L == 0) 0L else rho * dU / L
    (L, theta, rho, dU, jPpm, inter)
  }

  /** KMV set-operation entry (C47b): distinct-user OVERLAP between
    * clicks and purchases from the two sketches alone (Beyer et al.
    * 2007): union bottom-k gives θ and d̂_union; ρ = union-bottom-k
    * members present in BOTH sketches; Jaccard ≈ ρ/K and |A∩B| ≈
    * (ρ·d̂_union)/K, emitted as integer ppm / counts. The corpus never
    * re-scans — the composition runs on TWO ≤64-long arrays (bounded
    * collect, the C37/C38 scalar discipline). This is the
    * cross-source audience-overlap / corpus-overlap measure a
    * multi-dump pipeline needs and HLL registers cannot express. */
  def kmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables(spark, dir, "events")
    val sk = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), kmvHash(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(kmvAggCol(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val (l, theta, rho, dU, jPpm, inter) = kmvOverlapStats(
      sk.getOrElse("click", Seq.empty), sk.getOrElse("purchase", Seq.empty))
    Seq((KmvK.toLong, l, theta, rho, dU, jPpm, inter))
      .toDF("k", "l_union", "theta", "rho", "d_union_hat", "j_ppm",
        "inter_hat")
  }

  val kmvIntersectSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type,
       |    ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM d),
       |sk AS (SELECT event_type, h FROM r WHERE rn <= $KmvK),
       |ru AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT h FROM sk)),
       |bu AS (SELECT h FROM ru WHERE rn <= $KmvK),
       |l AS (SELECT count(*) AS n, coalesce(max(h), 0) AS theta FROM bu),
       |rho AS (SELECT count(*) AS c FROM bu
       |  WHERE h IN (SELECT h FROM sk WHERE event_type = 'click')
       |    AND h IN (SELECT h FROM sk WHERE event_type = 'purchase')),
       |est AS (SELECT l.n, l.theta, rho.c,
       |    CASE WHEN l.n < $KmvK THEN l.n
       |      ELSE (${KmvK - 1} * $KmvM) // greatest(l.theta, 1) END AS du
       |  FROM l, rho)
       |SELECT CAST($KmvK AS BIGINT) AS k, CAST(n AS BIGINT) AS l_union,
       |  theta, CAST(c AS BIGINT) AS rho, CAST(du AS BIGINT) AS d_union_hat,
       |  CASE WHEN n = 0 THEN 0 ELSE (c * 1000000) // n END AS j_ppm,
       |  CASE WHEN n = 0 THEN 0 ELSE (c * du) // n END AS inter_hat
       |FROM est""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_kmv_distinct" -> (kmvDistinct(_, _)),
    "agg_kmv_intersect" -> (kmvIntersect(_, _)),
    "agg_hll_distinct" -> (hllUsers(_, _)),
    "agg_hll_merge" -> (hllUsersMerged(_, _)),
    "agg_hll_production" -> (hllUsersProduction(_, _)),
    "agg_quantile_sketch" -> (quantileOrderValues(_, _)),
    "agg_quantile_sketch_merge" -> (quantileOrderValuesMerged(_, _)),
    "agg_quantile_exact" -> (exactOrderValueQuantiles(_, _)),
    "agg_topk_sketch" -> (topkWords(_, _)),
    "agg_topk_sketch_merge" -> (topkWordsMerged(_, _)))

  val quantileOrderValuesSql: String =
    """WITH v AS (SELECT o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |s AS (SELECT g, CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bucket,
      |        count(*) AS cnt FROM v GROUP BY 1, 2),
      |c AS (SELECT g, bucket, cnt,
      |        sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
      |        sum(cnt) OVER (PARTITION BY g) AS n
      |      FROM s),
      |e AS (SELECT g, max(n) AS n,
      |        min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) AS b50,
      |        min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bucket END) AS b90,
      |        min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) AS b99
      |      FROM c GROUP BY g)
      |SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
      |  CAST(CASE WHEN b50 = 0 THEN 0 ELSE 1::BIGINT << (b50 - 1) END AS BIGINT) AS p50_lo,
      |  CAST(CASE WHEN b50 = 0 THEN 0 WHEN b50 >= 63 THEN 9223372036854775807 ELSE (1::BIGINT << b50) - 1 END AS BIGINT) AS p50_hi,
      |  CAST(CASE WHEN b90 = 0 THEN 0 ELSE 1::BIGINT << (b90 - 1) END AS BIGINT) AS p90_lo,
      |  CAST(CASE WHEN b90 = 0 THEN 0 WHEN b90 >= 63 THEN 9223372036854775807 ELSE (1::BIGINT << b90) - 1 END AS BIGINT) AS p90_hi,
      |  CAST(CASE WHEN b99 = 0 THEN 0 ELSE 1::BIGINT << (b99 - 1) END AS BIGINT) AS p99_lo,
      |  CAST(CASE WHEN b99 = 0 THEN 0 WHEN b99 >= 63 THEN 9223372036854775807 ELSE (1::BIGINT << b99) - 1 END AS BIGINT) AS p99_hi
      |FROM e""".stripMargin

  val oracles: Map[String, String] = Map(
    "agg_kmv_distinct" -> kmvDistinctSql,
    "agg_kmv_intersect" -> kmvIntersectSql,
    "agg_hll_distinct" -> hllUsersSql,
    "agg_hll_merge" -> hllUsersMergedSql,
    "agg_hll_production" -> hllUsersProductionSql,
    "agg_quantile_sketch" -> quantileOrderValuesSql,
    "agg_quantile_sketch_merge" -> quantileOrderValuesMergedSql,
    "agg_quantile_exact" -> exactOrderValueQuantilesSql,
    "agg_topk_sketch" -> topkWordsSql,
    "agg_topk_sketch_merge" -> topkWordsMergedSql)
}
