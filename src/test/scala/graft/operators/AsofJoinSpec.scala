package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C24 as-of join: known-value semantics (backward match, equal-ts
  * inclusion, null on no-match, tolerance), a differential check against
  * an independent naive formulation on real data, and the plan-shape
  * guarantee that motivates the operator (no nested-loop/cartesian
  * amplification). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 12:00:00"), 101L),
    (2L, ts("2024-01-01 09:00:00"), 102L),
    (3L, ts("2024-01-01 11:00:00"), 103L)
  ).toDF("k", "ts", "lid")

  private lazy val right = Seq(
    (1L, ts("2024-01-01 09:30:00"), 200L),
    (1L, ts("2024-01-01 12:00:00"), 201L), // equal-ts with left 101
    (2L, ts("2024-01-01 09:30:00"), 202L)  // after left 102 — no match
  ).toDF("k", "ts", "rid")

  test("backward match, equal-ts inclusion, null on no-match") {
    val out = AsofJoin.asofBackward(left, right, "k", "ts")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(200L)) // latest at-or-before 10:00 is 09:30
    assert(out(101L) === Some(201L)) // equal ts matches (>= semantics)
    assert(out(102L) === None)       // only right row is AFTER the left ts
    assert(out(103L) === None)       // key 3 has no right rows at all
  }

  test("matched ts column rides along") {
    val out = AsofJoin.asofBackward(left, right, "k", "ts")
      .filter($"lid" === 100L).select("ts_matched")
      .as[Timestamp].head()
    assert(out === ts("2024-01-01 09:30:00"))
  }

  test("tolerance nulls matches older than the bound") {
    val out = AsofJoin.asofBackward(left, right, "k", "ts",
        tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === None)       // 09:30 is 30min old — outside bound
    assert(out(101L) === Some(201L)) // equal ts: zero age stays inside
  }

  test("differential vs naive range-join argmax at sf0.001") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))

    val fast = AsofJoin.asofBackward(clicks, purchases, "user_id", "ts")
      .select($"click_id", $"purchase_id")

    // independent formulation: range join + row_number argmax — the
    // O(|L|·|R|)-per-key plan the operator exists to avoid
    val j = clicks.join(purchases.withColumnRenamed("ts", "pts")
        .withColumnRenamed("user_id", "puid"),
      $"user_id" === $"puid" && $"ts" >= $"pts", "left")
    val w = Window.partitionBy($"click_id")
      .orderBy($"pts".desc_nulls_last, $"purchase_id".desc_nulls_last)
    val naive = j.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"click_id", $"purchase_id")

    assert(fast.count() === clicks.count())
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
    // non-vacuous: both matched and unmatched rows exist
    assert(fast.filter($"purchase_id".isNotNull).count() > 0)
    assert(fast.filter($"purchase_id".isNull).count() > 0)
  }

  test("forward: earliest at-or-after match, equal-ts inclusion, null past end") {
    val out = AsofJoin.asofForward(left, right, "k", "ts")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(201L)) // next at-or-after 10:00 is 12:00
    assert(out(101L) === Some(201L)) // equal ts matches (<= semantics)
    assert(out(102L) === Some(202L)) // 09:30 is after 09:00 — forward matches
    assert(out(103L) === None)       // key 3 has no right rows at all
  }

  test("forward tolerance nulls matches farther than the bound") {
    val out = AsofJoin.asofForward(left, right, "k", "ts",
        tolerance = Some(expr("INTERVAL 40 MINUTES")))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === None)       // 12:00 is 2h ahead — outside bound
    assert(out(102L) === Some(202L)) // 09:30 is 30min ahead — inside
  }

  test("forward differential vs naive range-join argmin at sf0.001") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))
    val fast = AsofJoin.asofForward(clicks, purchases, "user_id", "ts")
      .select($"click_id", $"purchase_id")
    val j = clicks.join(purchases.withColumnRenamed("ts", "pts")
        .withColumnRenamed("user_id", "puid"),
      $"user_id" === $"puid" && $"ts" <= $"pts", "left")
    val w = Window.partitionBy($"click_id")
      .orderBy($"pts".asc_nulls_last, $"purchase_id".desc_nulls_last)
    val naive = j.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"click_id", $"purchase_id")
    assert(fast.count() === clicks.count())
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
    assert(fast.filter($"purchase_id".isNotNull).count() > 0)
    assert(fast.filter($"purchase_id".isNull).count() > 0)
  }

  test("nearest: closer side wins, tie goes backward, single side matches") {
    // key 1 left 10:00: back 09:30 (30m) vs fwd 12:00 (2h) → back 200
    // key 1 left 12:00: back/fwd both 12:00 (tie at 0) → 201 either way
    // key 2 left 09:00: no back, fwd 09:30 → forward 202
    // key 3: no right rows → null
    val out = AsofJoin.asofNearest(left, right, "k", "ts")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(100L -> Some(200L), 101L -> Some(201L),
      102L -> Some(202L), 103L -> None))
    // an explicit tie: equidistant matches pick the BACKWARD one
    val l2 = Seq((9L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "lid")
    val r2 = Seq(
      (9L, ts("2024-01-01 09:00:00"), 88L),
      (9L, ts("2024-01-01 11:00:00"), 99L)).toDF("k", "ts", "rid")
    val tie = AsofJoin.asofNearest(l2, r2, "k", "ts")
      .select("rid").as[Long].head()
    assert(tie === 88L)
  }

  test("nearest plans exactly one exchange over the union") {
    val plan = AsofJoin.asofNearest(left, right, "k", "ts")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("payload/left name collisions and reserved names are rejected") {
    val badRight = Seq((1L, ts("2024-01-01 09:30:00"), 7L))
      .toDF("k", "ts", "lid") // lid collides with a left column
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, badRight, "k", "ts")
    }
    assert(e1.getMessage.contains("lid"))
    val reservedLeft = left.withColumn("__tag", lit(9))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(reservedLeft, right, "k", "ts")
    }
    assert(e2.getMessage.contains("__tag"))
    val matchedName = left.withColumn("ts_matched", lit(0L))
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(matchedName, right, "k", "ts")
    }
    assert(e3.getMessage.contains("ts_matched"))
  }

  test("tolerance entry binds non-vacuously at sf0.001") {
    val out = AsofJoin.joinAsofTolerance(spark, sf("sf0.001"))
    val unbounded = AsofJoin.joinAsof(spark, sf("sf0.001"))
    val kept = out.filter($"purchase_id".isNotNull).count()
    val nulled = out.filter($"purchase_id".isNull).count()
    assert(kept > 0, "no match survives the tolerance — bound too tight")
    // the bound must actually null something the unbounded entry matched
    assert(nulled > unbounded.filter($"purchase_id".isNull).count(),
      "tolerance nulled nothing — bound too loose to exercise the branch")
    // every surviving gap respects the bound
    assert(out.filter($"gap_us" > 2L * 3600L * 1000000L).count() === 0)
  }

  test("plan has no nested-loop or cartesian amplification") {
    val plan = AsofJoin.joinAsof(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }

  // ------------------------------------------------- chunked (skew) path
  private val QuarterHour = 15L * 60 * 1000000

  test("chunked: cross-chunk carry-in reproduces the plain semantics") {
    // 15-minute chunks put left 10:00 and its match 09:30 in DIFFERENT
    // chunks (carry-in path), and the equal-ts 12:00 pair in the SAME
    // chunk (within-chunk path) — both must behave exactly like plain
    val out = AsofJoin.asofBackwardChunked(left, right, "k", "ts",
        chunkMicros = QuarterHour)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out === Map(100L -> Some(200L), 101L -> Some(201L),
      102L -> None, 103L -> None))
    val fwd = AsofJoin.asofForwardChunked(left, right, "k", "ts",
        chunkMicros = QuarterHour)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(fwd === Map(100L -> Some(201L), 101L -> Some(201L),
      102L -> Some(202L), 103L -> None))
  }

  test("chunked: tolerance nulls through the carry-in too") {
    val out = AsofJoin.asofBackwardChunked(left, right, "k", "ts",
        chunkMicros = QuarterHour,
        tolerance = Some(expr("INTERVAL 10 MINUTES")))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === None)       // carry-in match is 30min old
    assert(out(101L) === Some(201L)) // within-chunk equal ts survives
  }

  test("chunked equals plain row-for-row at sf0.001, both directions") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))
    for (forward <- Seq(false, true)) {
      val plain = if (forward)
          AsofJoin.asofForward(clicks, purchases, "user_id", "ts")
        else AsofJoin.asofBackward(clicks, purchases, "user_id", "ts")
      val chunked = if (forward)
          AsofJoin.asofForwardChunked(clicks, purchases, "user_id", "ts",
            chunkMicros = 30L * 60 * 1000000)
        else AsofJoin.asofBackwardChunked(clicks, purchases, "user_id", "ts",
            chunkMicros = 30L * 60 * 1000000)
      assert(chunked.count() === plain.count())
      assert(chunked.exceptAll(plain).count() === 0,
        s"forward=$forward: chunked has rows plain lacks")
      assert(plain.exceptAll(chunked).count() === 0,
        s"forward=$forward: plain has rows chunked lacks")
    }
  }

  test("chunked equals plain on a maximally skewed single-key frame") {
    // ONE key, rows spread over many chunks — the exact shape the
    // chunked path exists for: every row lands on the same plain-path
    // task, but splits across ~240 chunked tasks
    val n = 2000
    val l1 = (0 until n).map(i =>
      (7L, new Timestamp(1700000000000L + i * 37000L), i.toLong))
      .toDF("k", "ts", "lid")
    // right rows every ~11 rows, offset so matches cross chunks often
    val r1 = (0 until n by 11).map(i =>
      (7L, new Timestamp(1700000000000L + i * 37000L + 500L), 10000L + i))
      .toDF("k", "ts", "rid")
    val plain = AsofJoin.asofBackward(l1, r1, "k", "ts")
      .select("lid", "rid")
    val chunked = AsofJoin.asofBackwardChunked(l1, r1, "k", "ts",
        chunkMicros = 5L * 60 * 1000000) // 5-min chunks over a ~20h span
      .select("lid", "rid")
    assert(chunked.count() === n.toLong)
    assert(chunked.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(chunked).count() === 0)
    // non-vacuous: the skewed frame exercises both match and no-match
    assert(chunked.filter($"rid".isNotNull).count() > 0)
    assert(chunked.filter($"rid".isNull).count() > 0)
  }

  test("chunked: equal timestamps at a chunk boundary still match") {
    // ts exactly ON the boundary: same ts ⇒ same chunk, so the >=
    // equal-ts tag ordering must be untouched by chunking
    val boundary = new Timestamp(1700000000000L) // epoch ms divisible widely
    val lB = Seq((1L, boundary, 1L)).toDF("k", "ts", "lid")
    val rB = Seq((1L, boundary, 42L)).toDF("k", "ts", "rid")
    val out = AsofJoin.asofBackwardChunked(lB, rB, "k", "ts",
        chunkMicros = 1000000L) // 1-second chunks
      .select("rid").as[Option[Long]].head()
    assert(out === Some(42L))
  }

  test("chunked entry equals the plain entry at sf0.001") {
    val plain = AsofJoin.joinAsof(spark, sf("sf0.001"))
    val chunked = AsofJoin.joinAsofChunked(spark, sf("sf0.001"))
    assert(chunked.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(chunked).count() === 0)
  }

  // ------------------------------------------- C39 band-join range count
  private val Band = 30L * 60 * 1000000 // 30 min, matching the entry

  test("range count: known values across a chunk boundary") {
    // chunks are 30-min aligned from the epoch; pick a base ON a chunk
    // boundary so windows deliberately straddle it
    val base = 1700000000000L - (1700000000000L % 1800000L) // ms, aligned
    def ev(id: Long, offSec: Long) =
      (id, new Timestamp(base + offSec * 1000L))
    val events = Seq(
      ev(1, 0),      // 10:00:00 — alone in its trailing 30m: {1}
      ev(2, 900),    // +15:00 — window [−15m, +15m] sees {1,2}
      ev(3, 1799),   // +29:59 — sees {1,2,3} (1 is 29:59 old — inside)
      ev(4, 1800),   // +30:00 — NEXT chunk; closed bound: {1,2,3,4}
      ev(5, 1801),   // +30:01 — 1 aged out (30:01 > 30m): {2,3,4,5}
      ev(6, 5400)    // +90:00 — everything older than 30m: {6}
    ).toDF("event_id", "ts")
    val out = AsofJoin.rangeCount(events, Band)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 4L, 6L -> 1L))
  }

  test("range count: duplicate timestamps all count (peers-inclusive)") {
    val t0 = new Timestamp(1700000000000L)
    val events = Seq((1L, t0), (2L, t0), (3L, t0)).toDF("event_id", "ts")
    val out = AsofJoin.rangeCount(events, Band)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("range count: empty trailing chunks and gaps do not miscount") {
    // two events many empty chunks apart: each sees only itself, and the
    // query row dropped into the (event-less) previous chunk must resolve
    // tot=0 through the left join
    val events = Seq(
      (1L, new Timestamp(1700000000000L)),
      (2L, new Timestamp(1700000000000L + 10L * 3600 * 1000))
    ).toDF("event_id", "ts")
    val out = AsofJoin.rangeCount(events, Band)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L))
  }

  test("range count equals the global RANGE window at sf0.001") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val fast = AsofJoin.rangeCount(events)
    // the semantics in one line — the single-partition plan the operator
    // exists to avoid (fine at spec scale)
    val w = Window.orderBy(col("s")).rangeBetween(-Band, 0)
    val naive = events
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("s"))
      .withColumn("n_band", count(lit(1)).over(w))
      .select("event_id", "n_band")
    assert(fast.count() === events.count())
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
    // non-vacuous: some events have trailing company, some don't
    assert(fast.filter($"n_band" > 1).count() > 0)
  }

  // ---------------------------------------- C43 interval join (pairs)
  test("interval pairs: inclusive bounds, multi-match, cross-chunk, key isolation") {
    val U = 1000000L // 1-second band for addressable edges
    val baseMs = 1700000000000L // ms, on a chunk boundary
    def t(offMs: Long) = new Timestamp(baseMs + offMs)
    val lft = Seq(
      (1L, t(1000), 10L), // band [0s, 1s]
      (2L, t(500), 20L)   // other key, band [-0.5s, 0.5s]
    ).toDF("k", "ts", "lid")
    val rgt = Seq(
      (1L, t(0), 100L),    // exactly ts - U: inclusive lower bound
      (1L, t(400), 101L),  // inside, PREVIOUS chunk (cross-chunk)
      (1L, t(1000), 102L), // exactly ts: inclusive upper bound
      (1L, t(1001), 103L), // 1ms after: excluded
      (1L, t(-1), 104L),   // 1ms before the band: excluded
      (2L, t(400), 105L)   // key 2's own match — never key 1's
    ).toDF("k", "ts", "rid")
    val out = AsofJoin.intervalJoinPairs(lft, rgt, "k", "ts", U)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 100L), (10L, 101L), (10L, 102L),
      (20L, 105L)))
  }

  test("interval pairs equal the theta join at sf0.001, no duplicates") {
    val out = AsofJoin.joinInterval(spark, sf("sf0.001"))
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val p = events.filter($"event_type" === "purchase")
      .select($"user_id", us($"ts").as("ps"), $"event_id".as("purchase_id"))
    val c = events.filter($"event_type" === "click")
      .select($"user_id".as("cuid"), us($"ts").as("cs"),
        $"event_id".as("click_id"))
    val naive = p.join(c, $"user_id" === $"cuid" &&
        $"cs" >= $"ps" - 1800000000L && $"cs" <= $"ps")
      .select($"purchase_id", $"click_id", ($"ps" - $"cs").as("gap_us"))
    assert(out.count() === naive.count())
    assert(out.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(out).count() === 0)
    // replicas must not double-produce: (purchase, click) pairs unique
    assert(out.select("purchase_id", "click_id").distinct().count()
      === out.count())
    assert(out.count() > 0, "fixture band produced no pairs — vacuous")
  }

  test("interval pairs plan a true equi-join, never a theta amplification") {
    val plan = AsofJoin.joinInterval(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the chunk key must be part of the join keys, not a post-filter:
    // an equi-join on (key, chunk) plans hash/merge join over BOTH keys
    assert(plan.contains("__jc") || plan.contains("__rjc"),
      s"chunk key missing from the executed join:\n$plan")
  }

  test("interval pairs reject reserved and colliding column names") {
    val lft = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "lid")
    val bad = lft.withColumn("__jc", lit(0L))
    val rgt = Seq((1L, ts("2024-01-01 10:00:00"), 2L)).toDF("k", "ts", "rid")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.intervalJoinPairs(bad, rgt, "k", "ts", 1000000L)
    }
    assert(e.getMessage.contains("__jc"))
  }

  test("range count: pre-1970 timestamps floor-divide into the right chunks") {
    // events straddling the epoch: truncating div folds (−U, U) into
    // ONE chunk and breaks the prev-chunk suffix accounting — the
    // floor-div fix makes chunk(ts − W) == chunk(ts) − 1 for any sign
    val events = Seq(
      (1L, new Timestamp(-1500L * 1000)), // −25:00
      (2L, new Timestamp(-100L * 1000)),  // −01:40
      (3L, new Timestamp(600L * 1000)),   // +10:00
      (4L, new Timestamp(1700L * 1000))   // +28:20
    ).toDF("event_id", "ts")
    val out = AsofJoin.rangeCount(events, Band)
      .as[(Long, Long)].collect().toMap
    // 30-min trailing bands: {1}, {1,2}, {2,3}, {2,3,4} (−100s is
    // exactly on e4's closed lower bound 1700−1800 = −100)
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L))
  }

  test("interval pairs: negative-epoch rows still meet exactly one replica") {
    val lft = Seq((1L, new Timestamp(500L), 10L)).toDF("k", "ts", "lid")
    val rgt = Seq(
      (1L, new Timestamp(-400L), 100L), // inside [−0.5s, 0.5s]
      (1L, new Timestamp(-500L), 101L), // exactly on the closed bound
      (1L, new Timestamp(-600L), 102L), // outside
      (1L, new Timestamp(500L), 103L),  // equal ts — inclusive
      (1L, new Timestamp(600L), 104L)   // after left — excluded
    ).toDF("k", "ts", "rid")
    val out = AsofJoin.intervalJoinPairs(lft, rgt, "k", "ts", 1000000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 100L), (10L, 101L), (10L, 103L)))
  }

  test("range count plans no single-partition stage") {
    val events = graft.Tables(spark, sf("sf0.001"), "events")
    val plan = AsofJoin.rangeCount(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global (single-partition) stage in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
