package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C26 HLL sketch: register math vs an independent driver-side HLL,
  * accuracy in the sketch's operating range, merge/semilattice behavior
  * via partition-count invariance, and the plan-shape claim (register
  * rows, not distinct values, cross the exchange). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference HLL over the same md5-derived 60-bit hash. */
  private def referenceHll(values: Seq[String], log2m: Int): (Long, Double) = {
    val m = 1 << log2m
    val restBits = 60 - log2m
    val regs = new Array[Int](m)
    values.foreach { v =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(15), 16)
      val b = (h % m).toInt
      val rest = h >> log2m
      val rho =
        if (rest == 0) restBits + 1
        else restBits + 1 - java.lang.Long.toBinaryString(rest).length
      if (rho > regs(b)) regs(b) = rho
    }
    val alphaM2 = (0.7213 / (1.0 + 1.079 / m.toDouble)) * m.toDouble * m.toDouble
    // same fold shape as the operator: present registers in bucket
    // order, then the empty-register mass as one term
    val present = regs.zipWithIndex.filter(_._1 > 0)
    val s = present.foldLeft(0.0) { case (acc, (r, _)) => acc + math.pow(2.0, -r) }
    val vZero = m - present.length
    (vZero.toLong, alphaM2 / (s + vZero.toDouble))
  }

  test("registers and estimate equal an independent driver-side HLL") {
    val values = (0 until 3000).map(i => s"user-$i")
    val df = values.map(v => ("g", v)).toDF("g", "v").repartition(7)
    val got = Sketch.hllDistinct(df, Seq("g"), "v", log2m = 10)
      .select($"v_zero", $"hll_estimate").as[(Long, Double)].head()
    assert(got === referenceHll(values, 10))
  }

  test("estimate lands within 3 standard errors in the operating range") {
    // n ≈ 5m — comfortably past the linear-counting zone for m=1024,
    // where the raw estimator's relative error is ~1.04/sqrt(m) = 3.25%
    val n = 5000
    val df = (0 until n).map(i => ("g", s"id-$i")).toDF("g", "v")
    val est = Sketch.hllDistinct(df, Seq("g"), "v", log2m = 10)
      .select($"hll_estimate").as[Double].head()
    assert(math.abs(est - n) / n < 3 * 1.04 / math.sqrt(1024.0),
      s"estimate $est for n=$n")
  }

  test("partition-count invariance (register merge is a semilattice)") {
    val rows = (0 until 2000).map(i => (s"t${i % 3}", s"u${i % 700}"))
    def run(parts: Int) =
      Sketch.hllDistinct(rows.toDF("t", "v").repartition(parts), Seq("t"), "v")
        .select($"t", $"v_zero", $"hll_estimate").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(run(1) === run(17))
  }

  test("duplicates do not move the sketch") {
    val once = (0 until 500).map(i => ("g", s"u$i"))
    val dup = once ++ once ++ once
    def est(rows: Seq[(String, String)]) =
      Sketch.hllDistinct(rows.toDF("g", "v"), Seq("g"), "v")
        .select($"hll_estimate").as[Double].head()
    assert(est(once) === est(dup))
  }

  test("merged shard sketches equal the direct sketch exactly") {
    val rows = (0 until 2400).map(i => (s"t${i % 3}", s"u${i % 811}"))
    val df = rows.toDF("t", "v")
    val shards = Seq(0, 1, 2).map(p =>
      Sketch.hllSketch(df.filter(abs(hash($"v")) % 3 === p), Seq("t"), "v"))
    val merged = Sketch.hllEstimate(Sketch.hllMerge(shards, Seq("t")), Seq("t"))
    val direct = Sketch.hllDistinct(df, Seq("t"), "v")
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select($"t", $"v_zero", $"hll_estimate").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(merged) === m(direct))
  }

  test("merge is idempotent and order-insensitive") {
    val df = (0 until 900).map(i => ("g", s"u${i % 333}")).toDF("g", "v")
    val a = Sketch.hllSketch(df.filter(length($"v") <= 3), Seq("g"), "v")
    val b = Sketch.hllSketch(df.filter(length($"v") > 3), Seq("g"), "v")
    def est(s: org.apache.spark.sql.DataFrame) =
      Sketch.hllEstimate(s, Seq("g")).select($"hll_estimate").as[Double].head()
    assert(est(Sketch.hllMerge(Seq(a, b), Seq("g"))) ===
      est(Sketch.hllMerge(Seq(b, a, b), Seq("g"))))
  }

  test("null values are ignored, matching COUNT(DISTINCT)") {
    val withNulls = (0 until 400).map(i => ("g", s"u$i")) :+ (("g", null: String))
    val clean = (0 until 400).map(i => ("g", s"u$i"))
    def run(rows: Seq[(String, String)]) =
      Sketch.hllDistinct(rows.toDF("g", "v"), Seq("g"), "v")
        .select($"v_zero", $"hll_estimate").as[(Long, Double)].head()
    val got = run(withNulls)
    assert(got === run(clean))
    assert(!got._2.isNaN)
  }

  test("logHist: bucket = integer bit length (known values)") {
    val df = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L)
      .map(("g", _)).toDF("g", "v")
    val got = Sketch.logHistSketch(df, Seq("g"), "v")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // 0→bucket 0; 1→1; 2,3→2; 4..7→3; 8→4; 1023→10; 1024→11
    assert(got === Map(0 -> 1L, 1 -> 1L, 2 -> 2L, 3 -> 2L, 4 -> 1L,
      10 -> 1L, 11 -> 1L))
  }

  test("logHist: quantile bounds contain the exact quantile") {
    val rnd = new scala.util.Random(13)
    val values = Seq.fill(5000)(math.abs(rnd.nextLong()) % 1000000L)
    val df = values.map(("g", _)).toDF("g", "v").repartition(11)
    val sk = Sketch.logHistSketch(df, Seq("g"), "v")
    val row = Sketch.logHistQuantile(sk, Seq("g"), Seq(50, 90, 99)).head()
    val sorted = values.sorted
    def exact(p: Int) = sorted((values.size * p + 99) / 100 - 1)
    for ((p, i) <- Seq(50 -> 2, 90 -> 4, 99 -> 6)) {
      val (lo, hi) = (row.getLong(i), row.getLong(i + 1))
      assert(lo <= exact(p) && exact(p) <= hi,
        s"p$p: exact ${exact(p)} outside [$lo, $hi]")
      assert(hi < 2 * math.max(lo, 1), s"p$p bounds wider than a factor of 2")
    }
  }

  test("logHist: shard-merge equals the direct sketch (count monoid)") {
    val rows = (0 until 3000).map(i => (s"t${i % 2}", (i * 37L) % 4096L))
    val df = rows.toDF("t", "v")
    val shards = Seq(0, 1, 2).map(p =>
      Sketch.logHistSketch(df.filter(abs(hash($"v")) % 3 === p), Seq("t"), "v"))
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m(Sketch.logHistMerge(shards, Seq("t"))) ===
      m(Sketch.logHistSketch(df, Seq("t"), "v")))
    // and the merged quantiles equal the direct quantiles exactly
    def q(sk: org.apache.spark.sql.DataFrame) =
      Sketch.logHistQuantile(sk, Seq("t"), Seq(50, 99)).collect()
        .map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(q(Sketch.logHistMerge(shards, Seq("t"))) ===
      q(Sketch.logHistSketch(df, Seq("t"), "v")))
  }

  // ------------------------------------------------------- C30 (CMS)
  /** A skewed item stream with known exact counts: item w<i> appears
    * 2·(51−i) times, i in 1..50 — N = 2550, top item 100×. */
  private lazy val cmsRows: Seq[(String, String)] =
    (1 to 50).flatMap(i => Seq.fill(2 * (51 - i))(("g", s"w$i")))

  test("cms: estimates dominate exact counts and respect the ε·N bound") {
    val df = cmsRows.toDF("g", "item").repartition(9)
    val sketch = Sketch.topkSketch(df, Seq("g"), "item")
    // the sketch is BOUNDED: at most d·w cells per group
    assert(sketch.count() <= 3 * 64)
    val est = Sketch.topkEstimate(sketch,
        df.select($"g", $"item").distinct(), Seq("g"), 50)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    val exact = cmsRows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = cmsRows.size
    val epsN = math.ceil(math.E * n / 64).toLong // the CMS guarantee scale
    exact.foreach { case (item, ex) =>
      val e = est(item)
      assert(e >= ex, s"$item: estimate $e below exact $ex — CMS can never undercount")
      assert(e <= ex + epsN, s"$item: excess ${e - ex} past ε·N = $epsN")
    }
  }

  test("cms: true heavy hitters survive into the estimated top-k") {
    // the sketch separates items whose count GAP exceeds the collision
    // noise (≲ ε·N) — a geometric distribution, the regime heavy-hitter
    // detection exists for (boilerplate vs the long tail). hot<i> has
    // 2^(11−i) occurrences; 200 singletons form the tail.
    val rows = (1 to 6).flatMap(i => Seq.fill(1 << (11 - i))(("g", s"hot$i"))) ++
      (1 to 200).map(i => ("g", s"tail$i"))
    val df = rows.toDF("g", "item")
    val top10 = Sketch.topkEstimate(
        Sketch.topkSketch(df, Seq("g"), "item"),
        df.select($"g", $"item").distinct(), Seq("g"), 10)
      .collect().map(_.getString(2)).toSet
    // estimates only ever round UP, so a heavy hitter separated from
    // the tail by more than the noise floor cannot be displaced out of
    // a k-slack top list
    (1 to 3).foreach(i =>
      assert(top10.contains(s"hot$i"), s"true heavy hitter hot$i missing from top-10"))
  }

  test("cms: shard-merge equals the direct sketch (count monoid)") {
    val df = cmsRows.zipWithIndex
      .map { case ((g, it), i) => (g, it, i.toLong) }.toDF("g", "item", "id")
    val shards = Seq(0, 1, 2).map(p =>
      Sketch.topkSketch(df.filter(pmod($"id", lit(3)) === p), Seq("g"), "item"))
    def cells(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(cells(Sketch.topkMerge(shards, Seq("g"))) ===
      cells(Sketch.topkSketch(df, Seq("g"), "item")))
  }

  test("cms: partition-count invariance") {
    val a = cmsRows.toDF("g", "item").repartition(2)
    val b = cmsRows.toDF("g", "item").repartition(17)
    def m(d: org.apache.spark.sql.DataFrame) =
      Sketch.topkEstimate(Sketch.topkSketch(d, Seq("g"), "item"),
          d.select($"g", $"item").distinct(), Seq("g"), 10)
        .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(m(a) === m(b))
  }

  test("cms: the JVM-side bucket twin equals the Column-side bucket") {
    import spark.implicits._
    // includes the hash delimiter char, non-ascii (UTF-8 byte parity),
    // digits, and the empty string
    val items = Seq("the", "x|y", "éclair", "", "42", "naïve",
      "a" * 100)
    items.foreach { it =>
      val cells = Sketch
        .topkSketch(Seq(("g", it)).toDF("g", "item"), Seq("g"), "item")
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
      (0 until Sketch.CmsDepth).foreach { r =>
        assert(cells(r) === Sketch.cmsBucketLocal(r, it).toLong,
          s"bucket divergence for item '$it' at row $r")
      }
    }
  }

  test("entry: plan aggregates registers, not distinct values") {
    val df = Sketch.hllDistinct(
      graft.Tables(spark, sf("sf0.001"), "events"), Seq("event_type"), "user_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("CartesianProduct"))
    // the register table is bounded: ≤ groups × m rows reach the final agg
    assert(df.count() === 5)
  }

  // ------------------------------------------------------ C47 KMV sketch
  import org.apache.spark.sql.graft.Bridge
  import graft.functions.KmvAgg

  private def kmvOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    df.agg(Bridge.column(
        KmvAgg(Bridge.expression(col("h")), k).toAggregateExpression())
        .as("sk"))
      .head().getSeq[Long](0)
  }

  test("kmv: bottom-k of the distinct set, ascending, deduped") {
    import spark.implicits._
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 9L, 8L, 2L, 1L, 5L)
    val df = vals.toDF("h")
    assert(kmvOf(df, 4) === Seq(1L, 2L, 3L, 5L))
    // k larger than the distinct count: the whole distinct set
    assert(kmvOf(df, 100) === vals.distinct.sorted)
  }

  test("kmv: partition invariance and shard-merge semilattice") {
    import spark.implicits._
    val vals = (0 until 3000).map(i => (i.toLong * 2654435761L) % 100000L)
    val df = vals.toDF("h")
    val direct = kmvOf(df, 64)
    assert(kmvOf(df.repartition(13), 64) === direct)
    // merging per-shard bottom-k arrays driver-side ≡ the direct sketch
    val shards = Seq(vals.take(1000), vals.slice(1000, 2000), vals.drop(2000))
      .map(s => kmvOf(s.toDF("h"), 64))
    val merged = shards.flatten.distinct.sorted.take(64)
    assert(merged === direct)
  }

  test("kmv: distinct estimate lands inside the sampling band") {
    val out = Sketch.kmvDistinct(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val events = graft.Tables(spark, sf("sf0.01"), "events")
    import org.apache.spark.sql.functions.{col, countDistinct}
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) =>
      val (nKept, dHat) = out(g)
      if (d < 64) assert(dHat === d, s"$g: below K must be exact")
      else {
        assert(nKept === 64L, g)
        // KMV with K=64: σ ≈ D/√(K−2) ≈ 12.7% — assert a 3σ band
        assert(math.abs(dHat - d) <= 0.4 * d,
          s"$g: d_hat=$dHat exact=$d — outside the sampling band")
      }
    }
  }

  test("kmv: overlap stats — known values, disjoint, empty, exact regime") {
    // exact regime: fewer than K in the union → everything exact
    val (l, theta, rho, dU, j, inter) =
      Sketch.kmvOverlapStats(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))
    assert((l, theta, rho, dU) === ((4L, 4L, 2L, 4L)))
    assert(j === 500000L)  // J = 2/4
    assert(inter === 2L)   // exact
    // disjoint and empty
    assert(Sketch.kmvOverlapStats(Seq(1L), Seq(9L))._3 === 0L)
    assert(Sketch.kmvOverlapStats(Seq.empty, Seq.empty) ===
      ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("kmv: intersection estimate tracks the exact overlap on the corpus") {
    val row = Sketch.kmvIntersect(spark, sf("sf0.01")).head()
    val (jPpm, interHat) = (row.getLong(5), row.getLong(6))
    val events = graft.Tables(spark, sf("sf0.01"), "events")
    import org.apache.spark.sql.functions.col
    def users(t: String) = events.filter(col("event_type") === t)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val (a, b) = (users("click"), users("purchase"))
    val exactJ = a.intersect(b).size.toDouble / a.union(b).size
    // ρ/K is a K-sample estimate of J: allow a generous 4σ ≈ 4·√(J(1−J)/K)
    val tol = 4 * math.sqrt(exactJ * (1 - exactJ) / 64) + 0.02
    assert(math.abs(jPpm / 1e6 - exactJ) <= tol,
      s"j=${jPpm / 1e6} exact=$exactJ tol=$tol")
    val exactI = a.intersect(b).size
    assert(math.abs(interHat - exactI) <= math.max(6.0, 0.6 * exactI),
      s"inter_hat=$interHat exact=$exactI")
  }
}
