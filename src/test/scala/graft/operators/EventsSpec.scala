package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C44/C45 batch event analytics: known-value sessionization and
  * funnel semantics, a differential proving the greedy funnel carry
  * equals the EXISTS formulation, and single-exchange plan audits. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private val baseMs = 1700000000000L
  private def t(offSec: Long) = new Timestamp(baseMs + offSec * 1000L)

  // ------------------------------------------------------- sessionize
  test("sessionize: gap closes a session, boundary gap stays open") {
    val events = Seq(
      (1L, t(0), 10L),
      (1L, t(1800), 11L),  // exactly 30min after: gap == limit → SAME session
      (1L, t(3601), 12L),  // 30min+1s after 11 → NEW session
      (2L, t(0), 20L)      // other user: own numbering
    ).toDF("user_id", "ts", "event_id")
    val out = Events.sessionize(events)
      .select("user_id", "session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 1L, 2L, 1800L * 1000000L),
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("sessionize: conservation and intra-session gap law on the corpus") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val out = Events.sessionize(events).cache()
    try {
      assert(out.agg(sum("n_events")).head().getLong(0) === events.count())
      // sessions of one user never overlap: next start > prev end + gap
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("session_idx")
      val bad = out.withColumn("prev_end", lag(col("end_s"), 1).over(w))
        .filter(col("prev_end").isNotNull &&
          col("start_s") - col("prev_end") <= 1800L * 1000000L)
      assert(bad.count() === 0, "adjacent sessions closer than the gap")
    } finally out.unpersist()
  }

  // ----------------------------------------------------------- funnel
  test("funnel: depths, window cutoff, equal-ts chain, conversions") {
    val W = 1800L
    val events = Seq(
      // user 1: full chain inside the window, twice over one view
      (1L, t(0), "view", 100L),
      (1L, t(60), "click", 101L),
      (1L, t(120), "purchase", 102L),
      (1L, t(180), "purchase", 103L),
      // user 2: view→click ok, purchase outside the 30min window
      (2L, t(0), "view", 200L),
      (2L, t(60), "click", 201L),
      (2L, t(W + 1), "purchase", 202L),
      // user 3: view only
      (3L, t(0), "view", 300L),
      // user 4: purchase BEFORE the click — order matters, depth 1
      (4L, t(0), "purchase", 400L),
      (4L, t(60), "view", 401L),
      (4L, t(120), "error", 402L),
      // user 5: the whole chain at ONE instant — equal ts admits it
      (5L, t(7), "view", 500L),
      (5L, t(7), "click", 501L),
      (5L, t(7), "purchase", 502L),
      // user 6: clicks and purchases but never a view — depth 0
      (6L, t(0), "click", 600L),
      (6L, t(60), "purchase", 601L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Events.funnel(events, windowUs = W * 1000000L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1L -> ((3L, 2L)), // both purchases convert through the one view
      2L -> ((2L, 0L)),
      3L -> ((1L, 0L)),
      4L -> ((1L, 0L)),
      5L -> ((3L, 1L)),
      6L -> ((0L, 0L))))
  }

  test("funnel: the greedy chain misses nothing an earlier click catches") {
    // the latest click's view is TOO OLD, but an earlier click carries
    // a fresher view? impossible by monotonicity — construct the
    // adversarial shape and check the chain is still found through
    // the LATEST click (v at 100s, clicks at 110s and 1900s, purchase
    // at 1901s: p−v = 1801s ≤ 1800s? no — make it fit: v=200)
    val events = Seq(
      (1L, t(200), "view", 1L),
      (1L, t(210), "click", 2L),
      (1L, t(1900), "click", 3L),   // latest click: its view is still 200
      (1L, t(1999), "purchase", 4L) // p − v = 1799s ≤ 1800s → converts
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Events.funnel(events, windowUs = 1800L * 1000000L)
      .as[(Long, Long, Long)].head()
    assert(out === ((1L, 3L, 1L)))
  }

  test("funnel differential vs the EXISTS formulation at sf0.001") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val fast = Events.funnel(events) // entry default: 24h window
    val W = 24L * 3600L * 1000000L
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val e = events.filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", us($"ts").as("s"), $"event_type", $"event_id")
      .cache()
    try {
      val v = e.filter($"event_type" === "view")
        .select($"user_id".as("vu"), $"s".as("vs"))
      val c = e.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"s".as("cs"))
      val p = e.filter($"event_type" === "purchase")
        .select($"user_id".as("pu"), $"s".as("ps"), $"event_id".as("pid"))
      val d1 = v.groupBy($"vu".as("user_id")).agg(lit(1L).as("e1"))
      val d2 = v.join(c, $"vu" === $"cu" && $"vs" <= $"cs" &&
          $"cs" - $"vs" <= W)
        .groupBy($"vu".as("user_id")).agg(lit(1L).as("e2"))
      val chains = v.join(c, $"vu" === $"cu" && $"vs" <= $"cs")
        .join(p, $"vu" === $"pu" && $"cs" <= $"ps" && $"ps" - $"vs" <= W)
      val d3 = chains.groupBy($"vu".as("user_id")).agg(lit(1L).as("e3"))
      val conv = chains.select($"vu".as("user_id"), $"pid").distinct()
        .groupBy("user_id").agg(count(lit(1)).as("n3"))
      val naive = e.select($"user_id").distinct()
        .join(d1, Seq("user_id"), "left").join(d2, Seq("user_id"), "left")
        .join(d3, Seq("user_id"), "left").join(conv, Seq("user_id"), "left")
        .select($"user_id",
          (coalesce($"e1", lit(0L)) + coalesce($"e2", lit(0L)) +
            coalesce($"e3", lit(0L))).as("funnel_depth"),
          coalesce($"n3", lit(0L)).as("n_conversions"))
      assert(fast.count() === naive.count())
      assert(fast.exceptAll(naive).count() === 0)
      assert(naive.exceptAll(fast).count() === 0)
      // non-vacuous: the corpus must exercise depth 3 and a cutoff
      assert(fast.filter($"funnel_depth" === 3).count() > 0)
      assert(fast.filter($"funnel_depth" < 3).count() > 0)
    } finally e.unpersist()
  }

  test("funnel: randomized differential vs driver-side brute force") {
    // deterministic LCG event soups: dense ties, all five types, tiny
    // windows — the greedy carry must match the O(n³) EXISTS reference
    var seed = 0xC0FFEE123456789L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 11 }
    val types = Seq("view", "click", "purchase", "error", "signup")
    for (trial <- 0 until 3) {
      val wSec = 20L + next() % 40
      val evs = (0 until 150).map { i =>
        ((next() % 4) + 1, t(next() % 120), types((next() % 5).toInt),
          i.toLong)
      }
      def brute(u: Long) = {
        val e = evs.filter(r => r._1 == u && r._3 != "error" && r._3 != "signup")
          .map(r => (r._2.getTime * 1000L, r._3, r._4))
        val vs = e.filter(_._2 == "view").map(_._1)
        val cs = e.filter(_._2 == "click").map(_._1)
        val ps = e.filter(_._2 == "purchase")
        val W = wSec * 1000000L
        val d1 = if (vs.nonEmpty) 1L else 0L
        val d2 = if (vs.exists(v => cs.exists(c => v <= c && c - v <= W))) 1L else 0L
        def conv(p: Long) =
          vs.exists(v => cs.exists(c => v <= c && c <= p && p - v <= W))
        val convs = ps.count(p => conv(p._1)).toLong
        val d3 = if (convs > 0) 1L else 0L
        (d1 + d2 + d3, convs)
      }
      val users = evs.filter(r => Set("view", "click", "purchase")(r._3))
        .map(_._1).distinct
      val want = users.map(u => u -> brute(u)).toMap
      val got = Events.funnel(
          evs.toDF("user_id", "ts", "event_type", "event_id"),
          windowUs = wSec * 1000000L)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === want, s"trial $trial (window ${wSec}s)")
    }
  }

  // -------------------------------------------------------- retention
  test("retention: known cohort matrix with epoch-aligned weeks") {
    val Week = 7L * 24 * 3600
    // epoch-aligned: week k starts at k·Week seconds since 1970
    def wk(week: Long, offSec: Long) =
      new Timestamp((week * Week + offSec) * 1000L)
    val events = Seq(
      // cohort week 100: users 1, 2 — user 1 returns weeks 101, 103;
      // user 2 returns week 101 only
      (1L, wk(100, 10), 1L), (1L, wk(101, 20), 2L), (1L, wk(103, 0), 3L),
      (2L, wk(100, 50), 4L), (2L, wk(101, 60), 5L),
      (2L, wk(101, 61), 6L), // same user+week twice: distinct collapses
      // cohort week 101: user 3, never returns
      (3L, wk(101, 5), 7L)
    ).toDF("user_id", "ts", "event_id")
    val out = Events.retention(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (100L, 0L, 2L, 2L, 1000000L),
      (100L, 1L, 2L, 2L, 1000000L),
      (100L, 3L, 1L, 2L, 500000L),
      (101L, 0L, 1L, 1L, 1000000L)))
  }

  test("retention: matrix laws on the corpus") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val out = Events.retention(events).cache()
    try {
      // offset 0 is always exactly 10⁶, and cohort sizes sum to the
      // distinct-user total (every user belongs to exactly one cohort)
      assert(out.filter($"week_offset" === 0 &&
        $"retention_ppm" =!= 1000000L).count() === 0)
      val cohortSum = out.filter($"week_offset" === 0)
        .agg(sum("n_cohort")).head().getLong(0)
      assert(cohortSum === events.select("user_id").distinct().count())
      // no cell exceeds its cohort, no negative offsets
      assert(out.filter($"n_active" > $"n_cohort").count() === 0)
      assert(out.filter($"week_offset" < 0).count() === 0)
      assert(out.count() > 1, "corpus must spread over several cells")
    } finally out.unpersist()
  }

  test("plans: one exchange each, no joins in the funnel") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    for ((name, df) <- Seq("sessionize" -> Events.sessionize(events),
        "funnel" -> Events.funnel(events))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), name)
      assert(!plan.contains("Join"), s"$name must be join-free:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"$name expected 1 exchange:\n$plan")
    }
  }
}
