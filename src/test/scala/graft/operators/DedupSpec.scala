package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Dedup/ANN operator specs: planted-near-dup recovery, LSH recall vs
  * the exact ground truth, and no-cartesian plan guarantees. */
class DedupSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("minhash-LSH finds exactly the exact-Jaccard>=0.8 pairs (recall 1 on planted dups)") {
    val lsh = Dedup.minhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(lsh.nonEmpty) // the corpus has planted near-dups
  }

  test("minhash-LSH plan has no cartesian product") {
    val plan = Dedup.minhashLsh(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("simhash: hamming<=3 pairs always share a band; near-dups mostly do") {
    val sim = Dedup.simhash(spark, dir)
    val pairs = Dedup.ngramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val byId = sim.collect().map(r => r.getLong(0) -> r).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    var close = 0
    var bandClose = 0
    var bandNear = 0
    pairs.foreach { case (a, b) =>
      val ra = byId(a); val rb = byId(b)
      val sharesBand = (1 to 4).exists(i => ra.getLong(i + 1) === rb.getLong(i + 1))
      if (hamming(ra.getLong(1), rb.getLong(1)) <= 3) {
        close += 1
        if (sharesBand) bandClose += 1
      }
      if (sharesBand) bandNear += 1
    }
    // pigeonhole: hamming<=3 over 4 bands MUST share one
    assert(bandClose === close)
    // and the banding must recover the bulk of the planted near-dups
    assert(bandNear.toDouble / pairs.length > 0.8,
      s"band recall $bandNear/${pairs.length}")
  }

  test("simhash pairs: banded extraction equals brute-force hamming<=3, no cartesian") {
    val banded = Dedup.simhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sim = Dedup.simhash(spark, dir).select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sim; (b, sb) <- sim if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded === brute)
    val plan = Dedup.simhashPairs(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("cluster assignment is transitive and canonical-per-component") {
    import spark.implicits._
    // doc 1 ~ doc 2 ~ doc 3 (chain; 1 and 3 differ more) + isolated doc 4
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val mid = (1 to 60).map(i => if (i == 30) "XX" else s"tok$i").mkString(" ")
    val far = (1 to 60).map(i => if (i == 30 || i == 31) "XX" else s"tok$i").mkString(" ")
    val other = (100 to 160).map(i => s"z$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-clu").toString
    Seq((1L, base), (2L, mid), (3L, far), (4L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val res = Dedup.clusters(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(res(1L) === ((1L, true)))
    assert(res(2L) === ((1L, false)))
    assert(res(3L) === ((1L, false))) // transitivity through doc 2
    assert(res(4L) === ((4L, true)))
  }

  test("broadcast union-find and distributed propagation paths agree") {
    val pairs = Dedup.minhashLsh(spark, dir).select(col("doc_a"), col("doc_b")).cache()
    val fast = Dedup.broadcastComponents(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.propagateComponents(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.unpersist()
    assert(fast.nonEmpty) // the corpus has planted dup clusters
    assert(fast === dist)
  }

  test("exact dedup is skew-proof: one hot text collapses map-side") {
    import spark.implicits._
    // pathological duplicate mass: one text with 100k copies among
    // 50k distincts — the hot md5 key must collapse in partial
    // aggregation (each map task ships ONE row per hash), not melt a
    // single reducer
    val hot = (1L to 100000L).map(i => (i, "the same hot document text"))
    val uniq = (200001L to 250000L).map(i => (i, s"unique text $i"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-skew").toString
    (hot ++ uniq).toDF("doc_id", "text")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val res = Dedup.exact(spark, tmp)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), "map-side combine expected")
    val rows = res.collect()
    assert(rows.length === 50001)
    val hotRow = rows.find(_.getLong(2) == 100000L).get
    assert(hotRow.getLong(1) === 1L, "keep-first = min doc_id of the hot cluster")
  }

  test("exact dedup groups identical texts") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tmp_docs")
    val res = docs.select(md5(col("text")).as("h"), col("doc_id"))
      .groupBy("h").agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(res === Set((1L, 2L), (3L, 1L)))
  }

  test("embedding dedup is pure (no synthetic rows), finds high-cosine pairs, no cartesian") {
    import spark.implicits._
    // v0 ≈ v1 (cosine ~1), v2 orthogonal-ish; v0's id is divisible by
    // PlantMod, so a leaked in-operator plant would surface immediately
    val dim = 64
    val base = Array.tabulate(dim)(i => math.sin(i + 1))
    val near = base.map(x => (x * 1.0001).toFloat)
    val far = Array.tabulate(dim)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq(
      (0L, base.map(_.toFloat).toSeq), (1L, near.toSeq), (2L, far.toSeq)
    ).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-emb").toString
    df.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val res = Dedup.embeddingDedup(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the PURE operator on a clean corpus: only the genuine near-dup
    // pair — no fabricated ids (the planted-twin fixture lives in the
    // entry layer, not the operator)
    assert(res === Set((0L, 1L)))
    val plan = Dedup.embeddingDedup(spark, tmp).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("plantTwins entry fixture adds the 0.5-scaled twins the driver gate needs") {
    import spark.implicits._
    val dim = 64
    val base = Array.tabulate(dim)(i => math.sin(i + 1))
    val near = base.map(x => (x * 1.0001).toFloat)
    val far = Array.tabulate(dim)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq(
      (0L, base.map(_.toFloat).toSeq), (1L, near.toSeq), (2L, far.toSeq)
    ).toDF("vec_id", "embedding")
    // the registered dedup_embedding entry = plantTwins ∘ embeddingDedup:
    // vec 0 (id % PlantMod == 0) gets a half-scale twin at max+1 = 3
    // with a bit-identical signature → (0,3) exact, (1,3) via near-dup
    val res = Dedup.embeddingDedup(Dedup.plantTwins(df))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res === Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("containment: subset pairs invisible to Jaccard; hand fixture; direction laws") {
    import spark.implicits._
    // hand fixture: B's shingles are a strict subset of A's (full
    // containment, Jaccard 0.5); D sits exactly ON the 0.9 gate against
    // C (9 of C's 10 shingles); E is unrelated
    val a = "t1 t2 t3 t4 t5 t6"            // shingles: 4
    val b = "t1 t2 t3 t4"                  // 2, both in A
    val c = (1 to 12).map("c" + _).mkString(" ")       // 10 shingles
    val d = (1 to 11).map("c" + _).mkString(" ")       // 9, all in C
    val e = "x1 x2 x3 x4 x5"
    val fx = Seq((1L, a), (2L, b), (3L, c), (4L, d), (5L, e)).toDF("doc_id", "text")
    val out = Dedup.ngramContainment(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6)))
    assert(out.toSet === Set(
      (1L, 2L, 2L, 500000L, 1000000L),  // B fully inside A
      (3L, 4L, 9L, 900000L, 1000000L))) // D on the 0.9 boundary (kept)
    // the planted truncated copy on the real corpus: containment flags
    // (orig, orig+off) at cb = 1e6 while C4's Jaccard gate does not
    val base = graft.Tables(spark, dir, "documents")
    val off = base.agg(max(col("doc_id"))).head.getLong(0) + 1
    val planted = Dedup.ngramContainment(Dedup.plantSubsets(base)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val plantPair = planted.find(p => p._1 === 0L && p._2 === off)
    assert(plantPair.nonEmpty, "planted subset pair must surface")
    assert(plantPair.get._7 === 1000000L, "truncation is FULLY contained")
    val jacc = Dedup.ngramJaccard(Dedup.plantSubsets(base)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jacc.contains((0L, off)),
      "the subset pair must be invisible to the symmetric 0.5 Jaccard gate")
    // direction laws on the corpus output
    planted.foreach { case (da, db, sh, na, nb, ca, cb) =>
      assert(sh <= math.min(na, nb), s"($da,$db) shared exceeds a side")
      assert(ca <= 1000000L && cb <= 1000000L, s"($da,$db) ppm out of range")
      assert(math.max(ca, cb) >= 900000L, s"($da,$db) below the gate")
    }
  }

  private def dd(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  /** Driver-side replay of the whole semantic-dedup algorithm
    * (assignment argmin + within-cluster earlier-member cosine rule)
    * over an arbitrary codebook — shared by the seed-convention
    * differential and the trained-codebook composition test. */
  private def expectedSemantic(rows: Seq[(Long, Array[Double])],
      cents: Seq[(Long, Array[Double])]): Set[(Long, Long, Boolean)] = {
    val assign = rows.map { case (id, e) =>
      val (_, cid) = cents.map { case (c, ce) =>
        (dd(ce, ce) - 2.0 * dd(e, ce), c) }.min
      (id, cid, e)
    }
    assign.map { case (id, cid, e) =>
      val hit = assign.exists { case (id2, cid2, e2) =>
        cid2 == cid && id2 < id &&
          dd(e, e2) / (math.sqrt(dd(e, e)) * math.sqrt(dd(e2, e2))) >= 0.8
      }
      (id, cid, !hit)
    }.toSet
  }

  test("semantic dedup: brute-force differential on the planted corpus, twins drop, keep-first") {
    // replay the WHOLE algorithm driver-side (assignment argmin + the
    // within-cluster earlier-member cosine rule) and compare
    // decision-for-decision on the real sf0.001 corpus with the
    // entry's planted fixture aboard
    val planted = Dedup.plantSemTwins(Tables(spark, dir, "embeddings"))
    val res = Dedup.semanticDedup(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val rows = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val k = math.max(8L, (rows.length + 511) / 512)
    val cents = rows.filter { case (id, _) => id >= 10L && id < 10L + k }
    assert(res.toSet === expectedSemantic(rows, cents))
    // non-vacuous: every planted EXACT twin is in its original's
    // cluster (identical vector => identical argmin) and drops
    val off = Tables(spark, dir, "embeddings")
      .agg(max(col("vec_id"))).head.getLong(0) + 1
    val exactTwins = res.filter { case (id, _, _) => id >= off && id < 2 * off }
    assert(exactTwins.nonEmpty && exactTwins.forall(!_._3),
      s"exact twins must all drop: ${exactTwins.filter(_._3).mkString(",")}")
    // keep-first: the smallest vec_id of every cluster has no earlier
    // member, so it is always kept
    res.groupBy(_._2).values.foreach { members =>
      assert(members.minBy(_._1)._3, "cluster-min vec_id must be kept")
    }
  }

  test("semantic dedup composes with a TRAINED codebook (the C38 -> C48 production path)") {
    import spark.implicits._
    // one driver-side Lloyd step over the seed codebook stands in for
    // the C38 trainer's output: centroids are now cluster MEANS, not
    // corpus rows, with their own cid space — the codebook overload
    // must accept any (cid, ce) frame and the result must match the
    // driver-side replay under that codebook
    val emb = Tables(spark, dir, "embeddings")
    val rows = emb.select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val seeds = rows.filter { case (id, _) => id >= 10L && id < 18L }
    val assign0 = rows.map { case (id, e) =>
      seeds.map { case (c, ce) => (dd(ce, ce) - 2.0 * dd(e, ce), c) }.min._2 -> e
    }
    val trained = assign0.groupBy(_._1).toSeq.map { case (c, members) =>
      val dim = members.head._2.length
      val m = new Array[Double](dim)
      members.foreach { case (_, e) =>
        var i = 0; while (i < dim) { m(i) += e(i); i += 1 } }
      var i = 0
      while (i < dim) { m(i) /= members.length; i += 1 }
      (c * 1000L + 7L) -> m // fresh cid space: codebook ids need not be vec_ids
    }.sortBy(_._1)
    val codebook = trained.map { case (c, m) => (c, m.toSeq) }
      .toDF("cid", "ce")
    val res = Dedup.semanticDedup(emb, codebook).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(res === expectedSemantic(rows, trained))
    // every vector assigned to a trained cid, none to a vec_id
    assert(res.forall(_._2 % 1000L === 7L))
  }

  test("semantic dedup is layout-invariant and the codebook overload binds") {
    val planted = Dedup.plantSemTwins(Tables(spark, dir, "embeddings"))
    val base = Dedup.semanticDedup(planted).collect().toSeq
    val shuffled = Dedup.semanticDedup(planted.repartition(7)).collect().toSeq
    assert(base === shuffled)
    // production form: passing the seed codebook explicitly is the
    // identical computation
    val emb = planted.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val k = math.max(8L, (emb.count() + 511) / 512)
    val codebook = emb
      .filter(col("vec_id") >= 10L && col("vec_id") < 10L + k)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    val viaCodebook = Dedup.semanticDedup(planted, codebook).collect().toSeq
    assert(base === viaCodebook)
  }

  test("library forms accept any frame shape (extra columns, shuffled order)") {
    import spark.implicits._
    // extra columns + non-canonical column order: the scaladoc contract
    // is "any frame with doc_id, text"
    val docs = Seq(
      ("x", 10L, "alpha beta gamma delta epsilon zeta", 1),
      ("y", 11L, "alpha beta gamma delta epsilon zeta", 2),
      ("z", 12L, "totally different words here now ok", 3)
    ).toDF("noise", "doc_id", "text", "more_noise")
    val ex = Dedup.exact(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(ex === Set((10L, 2L), (12L, 1L)))
    // minhashLsh on the same frame: identical texts are jaccard-1 pairs
    val lsh = Dedup.minhashLsh(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === Set((10L, 11L)))
    // clusters: the pair collapses to one component, extra cols ignored
    val clu = Dedup.clusters(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(clu === Map(10L -> ((10L, true)), 11L -> ((10L, false)),
      12L -> ((12L, true))))
  }

  test("forced-distributed clusters equals the gated path on the test corpus") {
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val gated = Dedup.clusters(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val dist = Dedup.clusters(docsDf, forceDistributed = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(dist === gated)
    assert(dist.exists(!_._3), "corpus has planted dup clusters (non-canonical rows)")
  }

  test("ann-lsh finds a planted near neighbor that bruteforce ranks #1") {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(3)
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = base.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
    // queries are vec_id < 5; make vec_id 0 the query and 99 its neighbor
    val noise = (1L to 98L).filter(_ != 0L).map { i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }
    val df = (Seq((0L, base.map(_.toFloat).toSeq), (99L, near.toSeq)) ++ noise)
      .toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann").toString
    df.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val bfTop = Ann.bruteforce(spark, tmp)
      .filter(col("q_id") === 0 && col("nn_rank") === 1).head
    assert(bfTop.getLong(2) === 99L)
    val lshHits = Ann.lsh(spark, tmp).filter(col("q_id") === 0)
      .collect().map(_.getLong(2)).toSet
    assert(lshHits.contains(99L), "LSH must recover the planted near neighbor")
    // IVF: the near-identical pair lands in the same inverted list, and
    // the query probes its own list first — the planted neighbor must
    // survive the nprobe pruning
    val ivfHits = Ann.ivf(spark, tmp).filter(col("q_id") === 0)
      .collect().map(_.getLong(2)).toSet
    assert(ivfHits.contains(99L), "IVF must recover the planted near neighbor")
  }

  test("paragraph dedup: shared boilerplate demoted once, reassembly md5 exact") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ") // exactly one 16-token paragraph
    val u1 = (1 to 16).map(i => s"u$i").mkString(" ")
    val u2 = (1 to 16).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $u1"), // paragraphs: boiler, u1 — first occurrence keeps both
      (2L, s"$boiler $u2"), // boiler already seen at (1,0) → demoted
      (3L, boiler)          // fully demoted doc
    ).toDF("doc_id", "text")
    val res = Dedup.exactParagraphs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(res(1L) === ((2L, 2L, md5hex(s"$boiler $u1"))))
    assert(res(2L) === ((2L, 1L, md5hex(u2))))
    assert(res(3L) === ((1L, 0L, md5hex(""))))
  }

  test("ngram-jaccard ppjoin prefix filter is exact: brute-force parity incl. hot boilerplate and a threshold-boundary pair") {
    import spark.implicits._
    def toks(prefix: String, n: Int): Seq[String] = (1 to n).map(i => s"$prefix$i")
    val corpus = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    // a true near-dup pair: one substitution in 50 tokens (jacc ≈ 0.88)
    val base = toks("nd", 50)
    corpus += ((1L, base.mkString(" ")))
    corpus += ((2L, base.updated(25, "ndX").mkString(" ")))
    // exact-threshold subset pair: A's 10 shingles ⊂ B's 20 → jacc =
    // 10/(10+20-10) = 0.5 exactly — must be INCLUDED (>= comparison),
    // and exercises the prefix lemma's c = ⌈t·n⌉ equality edge
    val subA = toks("sub", 12)
    corpus += ((3L, subA.mkString(" ")))
    corpus += ((4L, (subA ++ toks("sx", 10)).mkString(" ")))
    corpus += ((5L, "a b")) // <3 tokens: dropped on both sides
    // 20 docs sharing a 30-token boilerplate block + 60 unique tokens:
    // pairwise jacc ≈ 28/148 < 0.5 — none may pair, even though the
    // boilerplate grams are the hottest in the corpus (df=20). This is
    // the pattern whose df² blow-up the prefix filter exists to kill.
    val boiler = toks("hot", 30)
    for (i <- 0 until 20)
      corpus += ((100L + i, (boiler ++ toks(s"u${i}_", 60)).mkString(" ")))
    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ")
      if (t.length < 3) Set.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val all = corpus.toSeq
    val expect = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      if sa.nonEmpty && sb.nonEmpty
      c = sa.intersect(sb).size
      j = c.toDouble / (sa.size + sb.size - c) if j >= 0.5
    } yield (ia, ib, j)).toSet
    assert(expect.exists(_._3 == 0.5), "corpus must include an exact-threshold pair")
    assert(expect.size >= 2)
    val frame = all.toDF("doc_id", "text")
    for (result <- Seq(Dedup.ngramJaccard(frame), Dedup.ngramJaccardPrefix(frame))) {
      val plan = result.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
      val got = result.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expect)
      assert(!got.exists { case (a, b, _) => a >= 100L && b >= 100L },
        "sub-threshold boilerplate-sharing docs must not pair")
    }
    // the prefix variant at a higher threshold, against its own oracle
    val expect07 = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      if sa.nonEmpty && sb.nonEmpty
      c = sa.intersect(sb).size
      j = c.toDouble / (sa.size + sb.size - c) if j >= 0.7
    } yield (ia, ib, j)).toSet
    val got07 = Dedup.ngramJaccardPrefix(frame, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got07 === expect07)
    assert(expect07.size < expect.size, "0.7 must prune the boundary pair")
  }

  test("native minhash signature equals the explode+min-agg formulation bit-for-bit") {
    import org.apache.spark.sql.graft.{Bridge, MinhashSignature, WordShingles}
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("shingles", Bridge.column(WordShingles(Bridge.expression(col("text")))))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("shingles"))
    val native = sh.select(col("doc_id"),
        Bridge.column(MinhashSignature(Bridge.expression(col("shingles")), 64)).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val exploded = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val hashCols = (0 until 64).map(j => xxhash64(lit(j), col("s")).as(s"h$j"))
    val legacy = exploded.select(col("doc_id") +: hashCols: _*)
      .groupBy(col("doc_id"))
      .agg(min(col("h0")).as("m0"), (1 until 64).map(j => min(col(s"h$j")).as(s"m$j")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 64).map(r.getLong(_)).toVector).toMap
    assert(native === legacy)
    assert(native.nonEmpty)
  }

  test("native simhash signature equals the explode+bit-sum formulation bit-for-bit") {
    import org.apache.spark.sql.graft.{Bridge, SimhashSignature}
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val native = docsDf.select(col("doc_id"),
        Bridge.column(SimhashSignature(Bridge.expression(split(col("text"), " ")))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tok = docsDf
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"s$b")
    }
    val agged = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 60).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val legacy = agged.select(col("doc_id"), sim.as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === legacy)
    assert(native.nonEmpty)
  }

  test("ppjoin prefix variant equals the count-based C4 on the test corpus") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = pairs(Dedup.ngramJaccard(spark, dir))
    val b = pairs(Dedup.ngramJaccardPrefix(spark, dir))
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("auto dispatcher: both regimes exact, cost factor steers, boilerplate corpus trips the prefix path") {
    import spark.implicits._
    // boilerplate-heavy corpus: one 40-token block shared by 30 docs →
    // df=30 grams dominate; the count path's co-gram join would emit
    // ~df²/2 rows per boilerplate gram while the prefix-candidate
    // estimate stays an order of magnitude smaller
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val boiler = toks("bp", 40)
    val near = toks("nd", 40)
    val corpus = ((1 to 30).map(i => (i.toLong, (boiler ++ toks(s"u${i}_", 10)).mkString(" "))) ++
      Seq((100L, near.mkString(" ")), (101L, near.updated(20, "ndX").mkString(" "))))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // forced through each regime: identical output
    val viaPrefix = pairs(Dedup.ngramJaccardAuto(corpus, 0.5, prefixCostFactor = 0.0))
    val viaCount = pairs(Dedup.ngramJaccardAuto(corpus, 0.5, prefixCostFactor = 1e18))
    assert(viaPrefix === viaCount)
    assert(viaPrefix.nonEmpty)
    // the default cost factor must route this corpus to the prefix
    // plan and still produce the same exact result
    assert(pairs(Dedup.ngramJaccardAuto(corpus)) === viaCount)
    // higher threshold post-filters losslessly on the count path too
    val high = pairs(Dedup.ngramJaccardAuto(corpus, 0.8, prefixCostFactor = 1e18))
    assert(high === viaCount.filter(_._3 >= 0.8))
  }

  test("auto dispatcher threshold-awareness: t=0.8 picks prefix, t=0.5 picks count on the bench corpus") {
    // the r10 defect: a fixed amplification cutoff ignored `threshold`
    // and dispatched the measured-2×-slower count plan at the entry's
    // registered t=0.8. The volume estimator must be threshold-aware:
    // prefixes shrink as (1−t)·n, so V_prefix collapses at high t
    // while V_count is threshold-blind.
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val at08 = Dedup.ngramDispatchStats(docs, 0.8)
    val at05 = Dedup.ngramDispatchStats(docs, 0.5)
    // V_count is a pure df-distribution statistic — identical across
    // thresholds; V_prefix must shrink strictly as t rises
    assert(at08.vCount === at05.vCount)
    assert(at08.vPrefix <= at05.vPrefix)
    // the registered entry's regime: at t=0.8 on the bench corpus the
    // candidate estimate collapses far below the co-gram volume, so
    // the default factor dispatches PREFIX — the r10 warm artifacts
    // measured that plan ~2× faster than the count plan it used to pick
    assert(at08.prefixWins(5.0),
      s"t=0.8 must dispatch prefix: $at08")
    // at sf0.1 the decision genuinely FLIPS with the threshold: the
    // larger corpus's shared-gram mass makes t=0.5 prefixes half of
    // every doc (V_prefix ≈ V_count/3, inside the 5× verify-cost
    // factor) while t=0.8 prefixes hold a tenth of the volume
    val big = Tables(spark, sf("sf0.1"), "documents")
    val big08 = Dedup.ngramDispatchStats(big, 0.8)
    val big05 = Dedup.ngramDispatchStats(big, 0.5)
    assert(big08.prefixWins(5.0), s"sf0.1 t=0.8 must dispatch prefix: $big08")
    assert(!big05.prefixWins(5.0), s"sf0.1 t=0.5 must dispatch count: $big05")
    // both dispatches stay exact against the forced variants
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto08 = pairs(Dedup.ngramJaccardAuto(docs, 0.8))
    assert(auto08 === pairs(Dedup.ngramJaccardAuto(docs, 0.8, prefixCostFactor = 0.0)))
    assert(auto08 === pairs(Dedup.ngramJaccardAuto(docs, 0.8, prefixCostFactor = 1e18)))
    assert(auto08.nonEmpty)
  }

  test("prefix variant at 0.8 equals the exact-verified LSH pair set (the registered entry's contract)") {
    val prefix = Dedup.ngramJaccardPrefix(Tables(spark, dir, "documents"), 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix === lsh)
    assert(prefix.nonEmpty)
  }

  test("spanCoverage: overlapping duplicated spans union, short docs score zero") {
    import spark.implicits._
    // docs 1 and 2 share the 8-grams at positions 1 and 2 → covered
    // positions 1..9 of 10 (the two spans MERGE, not double-count);
    // doc 3 is under the span length and must still emit a zero row
    val docs = Seq(
      (1L, "a b c d e f g h x y"),
      (2L, "a b c d e f g h x w"),
      (3L, "p q r")
    ).toDF("doc_id", "text")
    val r = Dedup.spanCoverage(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r(1L) === ((10L, 9L, 0.9)))
    assert(r(2L) === ((10L, 9L, 0.9)))
    assert(r(3L) === ((3L, 0L, 0.0)))
  }

  test("spanCoverage: non-vacuous on testdata, coverage bounded by 1") {
    val r = Dedup.spanCoverage(spark, sf("sf0.01"))
    assert(r.filter(col("n_dup_positions") > 0).count() > 0)
    assert(r.filter(col("dup_coverage") > 1.0).count() === 0)
    assert(r.count() === 500) // every doc present, including zero rows
  }

  test("spanCoverage: differential vs a plain-Scala reference on a seeded corpus") {
    import spark.implicits._
    // small vocabulary forces genuine cross-doc 8-gram collisions;
    // lengths 1..24 cover short-doc, exact-8 and multi-span cases;
    // two planted exact copies guarantee full-coverage rows
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d")
    val base = (0 until 80).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(24))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = base ++ Seq((80L, base(3)._2), (81L, base(7)._2))
    val n = 8
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, text) <- docs) {
      val t = text.split(" ", -1)
      for (i <- 0 to t.length - n)
        gramDocs.updateWith(t.slice(i, i + n).mkString(" "))(s => Some(s.getOrElse(Set.empty) + id))
    }
    val expected = docs.map { case (id, text) =>
      val t = text.split(" ", -1)
      val covered = (0 to t.length - n)
        .filter(i => gramDocs(t.slice(i, i + n).mkString(" ")).size > 1)
        .flatMap(i => i until i + n).toSet
      id -> ((t.length.toLong, covered.size.toLong,
        covered.size.toDouble / t.length))
    }.toMap
    val got = Dedup.spanCoverage(docs.toDF("doc_id", "text")).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(got === expected)
    assert(expected.values.count(_._2 > 0) >= 2) // differential is non-vacuous
  }

  test("spanRewrite: each duplicated span survives exactly once corpus-wide") {
    import spark.implicits._
    // planted: passage P (12 tokens → 5 duplicated 8-grams) appears in
    // doc 1 (winner), doc 2 (later doc), and TWICE more in doc 2 — all
    // occurrences after the corpus-wide first must vanish
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val doc1 = ((1 to 5).map(i => s"a$i") :+ p) ++ (6 to 15).map(i => s"a$i")
    val doc2 = ((1 to 3).map(i => s"b$i") :+ p) ++ (4 to 9).map(i => s"b$i") :+ p
    val doc3 = (1 to 25).map(i => s"c$i") // untouched control
    // doc 4: a WITHIN-doc-only repeat (never crosses docs) must be kept
    val q = (1 to 9).map(i => s"q$i").mkString(" ")
    val doc4 = (Seq(q) ++ (1 to 4).map(i => s"d$i")) :+ q
    val docs = Seq(
      (1L, doc1.mkString(" ")), (2L, doc2.mkString(" ")),
      (3L, doc3.mkString(" ")), (4L, doc4.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.spanRewrite(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // winner doc keeps P intact; control and within-doc-repeat docs unchanged
    assert(out(1L)._2 === 0L)
    assert(out(1L)._3 === doc1.mkString(" "))
    assert(out(3L)._2 === 0L && out(3L)._3 === doc3.mkString(" "))
    assert(out(4L)._2 === 0L && out(4L)._3 === doc4.mkString(" "),
      "within-doc-only repeats are not >1-doc spans and must be kept")
    // doc 2 drops exactly its two P occurrences (24 positions)
    assert(out(2L)._2 === 24L)
    assert(!out(2L)._3.contains("p1"))
    assert(out(2L)._3.split(" ").count(_.nonEmpty) === out(2L)._1 - 24)
    // THE law: every originally->1-doc 8-gram appears exactly once
    // across the rewritten corpus
    def grams(s: String): Seq[String] = {
      val t = s.split(" ")
      if (t.length < 8) Nil else (0 to t.length - 8).map(i => t.slice(i, i + 8).mkString(" "))
    }
    val originalDup = Seq(doc1, doc2, doc3, doc4).map(_.mkString(" "))
      .zipWithIndex.flatMap { case (s, d) => grams(s).map((_, d)) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    val rewrittenAll = out.values.toSeq.flatMap(v => grams(v._3))
    originalDup.foreach { g =>
      assert(rewrittenAll.count(_ == g) === 1,
        s"duplicated gram '$g' must appear exactly once after rewrite")
    }
  }

  test("spanRewrite: entry parity with a brute-force reference on testdata") {
    // differential on the real corpus: n_dropped from the operator
    // equals a driver-side recomputation of the position semantics
    val documents = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val n = 8
    val occs = documents.flatMap { case (d, t) =>
      val toks = t.split(" ")
      if (toks.length < n) Nil
      else (0 to toks.length - n).map(i => (toks.slice(i, i + n).mkString(" "), d, i + 1))
    }
    val byGram = occs.groupBy(_._1).filter(_._2.map(_._2).distinct.length > 1)
    val winners = byGram.map { case (_, os) => os.minBy(o => (o._2, o._3)) }.toSet
    val winCover = winners.flatMap(o => (o._3 until o._3 + n).map((o._2, _)))
    val loseCover = byGram.values.flatten.filterNot(winners)
      .flatMap(o => (o._3 until o._3 + n).map((o._2, _))).toSet
    val drops = (loseCover -- winCover).groupBy(_._1).view.mapValues(_.size).toMap
    val got = Dedup.spanRewrite(Tables(spark, dir, "documents")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    documents.foreach { case (d, _) =>
      assert(got(d) === drops.getOrElse(d, 0).toLong, s"doc $d n_dropped mismatch")
    }
    assert(drops.nonEmpty, "the fixture corpus must contain cross-doc spans")
  }

  test("spanRewrite: plan has no cartesian product") {
    val plan = Dedup.spanRewrite(Tables(spark, dir, "documents"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("operators release every cache they take (no persist leaks in a long-lived session)") {
    val dir = sf("sf0.001")
    Dedup.ngramJaccard(spark, dir).count()
    Dedup.ngramJaccardPrefix(spark, dir).count()
    Dedup.minhashLsh(spark, dir).count()
    Dedup.simhashPairs(spark, dir).count()
    Dedup.clusters(spark, dir).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager must be empty after the operators return")
  }
}
