package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Library-form (DataFrame-in/DataFrame-out) contracts: every C-suite
  * operator must be a pure function of a hand-built in-memory frame —
  * extra columns, non-canonical column order, data that never came from
  * the Tables test layout. The (spark, dir) forms are thin adapters; these
  * specs pin the frame-first surface the scaladoc promises. */
class LibraryApiSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docsFrame: DataFrame = {
    import spark.implicits._
    // stopword-heavy English text (kept), its exact dup (demoted), and a
    // mislabeled doc (language gate drops it) — plus noise columns and a
    // column order that differs from the documents table
    val en = Array.fill(10)("the a and of to").mkString(" ")
    Seq(
      (9, "n1", 1L, en, "web", "en"),
      (8, "n2", 2L, en, "web", "en"),
      (7, "n3", 3L, en, "books", "de")
    ).toDF("more_noise", "noise", "doc_id", "text", "source", "lang")
  }

  test("Text.* library forms run on an in-memory frame with extra columns") {
    val d = docsFrame
    val lang = Text.langId(d).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(lang === Map(1L -> "en", 2L -> "en", 3L -> "en"))
    val q = Text.quality(d).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q === Map(1L -> 50L, 2L -> 50L, 3L -> 50L)) // n_words
    val t = Text.tokens(d).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t === Map(1L -> 50L, 2L -> 50L, 3L -> 50L)) // ws_tokens
    val f = Text.fingerprint(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f(1L) === f(2L)) // identical text, identical fingerprint
    assert(f.size === 3) // every doc id fingerprinted
  }

  test("Pipeline curation library forms: kept/keptDocs/curate on an in-memory frame") {
    val d = docsFrame
    // doc 1 survives every gate; doc 2 is an exact dup (min-id loses);
    // doc 3 fails the language gate (pred en != lang de)
    val keptIds = Pipeline.keptDocs(d).collect().map(_.getLong(0)).toSeq
    assert(keptIds === Seq(1L))
    val stats = Pipeline.curate(d).collect()
    assert(stats.map(_.getString(0)).toSeq === Seq("web"))
    assert(stats.head.getLong(1) === 1L) // n_docs
    val nd = Pipeline.curateNearDup(d).collect()
    assert(nd.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("web", 1L)))
  }

  test("Pipeline.sampleCap/mixSources/packSequences library forms") {
    import spark.implicits._
    // 12 docs in one source (cap is 10), 3 in another
    val d = (1L to 12L).map(i => (i, "s_big", s"w$i words here", "x")) ++
      (20L to 22L).map(i => (i, "s_small", s"w$i words here", "x"))
    val df = d.toDF("doc_id", "source", "text", "junk")
    val cap = Pipeline.sampleCap(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cap === Map("s_big" -> ((10L, 12L)), "s_small" -> ((3L, 3L))))
    val mix = Pipeline.mixSources(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // s_small is under the 10-doc budget: keep_ppm = 1e6 keeps all 3
    assert(mix("s_small") === 3L)
    assert(mix("s_big") <= 12L)
    val packed = Pipeline.packSequences(df).collect()
    // 3-token docs, 256-token budget, one shard: everything packs into
    // seq 0 per source
    assert(packed.map(r => (r.getString(0), r.getLong(2))).toSet ===
      Set(("s_big", 0L), ("s_small", 0L)))
    assert(packed.map(_.getLong(3)).sum === 15L) // n_docs adds up
  }

  test("Pipeline.decontaminate library form flags shared-gram docs; bloom variant agrees") {
    import spark.implicits._
    // doc 0 (id % 97 == 0) is the benchmark doc; doc 1 shares 3 distinct
    // 3-grams with it (= the contamination floor); doc 2 shares none
    val df = Seq(
      (0L, "a b c d e f", "k"),
      (1L, "a b c d e zz", "k"),
      (2L, "p q r s t u", "k")
    ).toDF("doc_id", "text", "junk")
    val exact = Pipeline.decontaminate(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact === Seq((1L, 3L)))
    val bloom = Pipeline.decontaminateBloom(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloom === exact)
  }

  test("decontaminateBloom fails fast when the benchmark gram set exceeds the cap") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d e f", "k"), // benchmark doc: 4 distinct grams > cap 2
      (1L, "a b c d e zz", "k")
    ).toDF("doc_id", "text", "junk")
    spark.conf.set("graft.bloom.maxGrams", "2")
    try {
      val e = intercept[IllegalArgumentException] {
        Pipeline.decontaminateBloom(df)
      }
      assert(e.getMessage.contains("bloom"))
    } finally spark.conf.unset("graft.bloom.maxGrams")
  }

  test("decontaminateBloom rejects a cap that would overflow limit()'s Int argument") {
    import spark.implicits._
    val df = Seq((0L, "a b c d e f", "k"), (1L, "a b c d e zz", "k"))
      .toDF("doc_id", "text", "junk")
    // cap + 1 > Int.MaxValue used to truncate negative inside limit();
    // now it must fail fast with the range message
    spark.conf.set("graft.bloom.maxGrams", (Int.MaxValue.toLong + 5).toString)
    try {
      val e = intercept[IllegalArgumentException] {
        Pipeline.decontaminateBloom(df)
      }
      assert(e.getMessage.contains("graft.bloom.maxGrams"))
    } finally spark.conf.unset("graft.bloom.maxGrams")
  }

  test("simhash drops null-text docs (pinned: native expr, explode plan and oracle diverge)") {
    import spark.implicits._
    val df = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, null.asInstanceOf[String]),
      (2L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val out = Dedup.simhash(df).select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(0L, 2L), "null-text doc must be dropped, not NULL/0-signed")
    assert(out(0L) === out(2L))
  }

  test("Ann library forms run on an in-memory embeddings frame with extra columns") {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(7)
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = base.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
    // queries are vec_id < 5; vec 19 is the planted neighbor of query 0;
    // ids 10..17 exist (the fixed IVF centroid seeds)
    val rows = Seq((0L, base.map(_.toFloat).toSeq, "q")) ++
      (1L to 18L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq, "c")) ++
      Seq((19L, near.toSeq, "c"))
    val df = rows.toDF("vec_id", "embedding", "role")
    val bfTop = Ann.bruteforce(df)
      .filter(col("q_id") === 0 && col("nn_rank") === 1).head
    assert(bfTop.getLong(2) === 19L)
    val lshHits = Ann.lsh(df).filter(col("q_id") === 0)
      .collect().map(_.getLong(2)).toSet
    assert(lshHits.contains(19L))
    val ivfHits = Ann.ivf(df).filter(col("q_id") === 0)
      .collect().map(_.getLong(2)).toSet
    assert(ivfHits.contains(19L))
  }

  test("Ann.pq surfaces a planted near neighbor through real ADC pruning + exact rerank") {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(11)
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = base.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
    // 150 corpus vectors >> the 50-candidate ADC shortlist, so the
    // shortlist genuinely prunes; ids 20..35 are the codebook sample.
    // The twin's sub-vectors encode onto the query's own codes, so its
    // ADC distance is near the attainable minimum — it must survive
    // the shortlist and win the exact rerank.
    val rows = Seq((0L, base.map(_.toFloat).toSeq)) ++
      (1L to 148L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)) ++
      Seq((149L, near.toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val top = Ann.pq(df).filter(col("q_id") === 0 && col("nn_rank") === 1).head
    assert(top.getLong(2) === 149L, "planted twin must rank first for its query")
    // every query returns a full top-k (the shortlist is never starved)
    val counts = Ann.pq(df).groupBy(col("q_id")).count().collect()
    assert(counts.length === 5 && counts.forall(_.getLong(1) === 10L))
    // IVF-PQ: the twin shares the query's nearest lists (near-identical
    // vector ⇒ same coarse assignment), survives the list restriction
    // AND the ADC shortlist, and wins the exact rerank
    val ivfpqTop = Ann.ivfPq(df).filter(col("q_id") === 0 && col("nn_rank") === 1).head
    assert(ivfpqTop.getLong(2) === 149L, "planted twin must rank first through IVF-PQ")
  }

  test("residual IVF-PQ: planted twins surface; recall >= raw encoding (C18b)") {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(13)
    // five planted twins (one per query); 405 corpus vectors so a
    // query's ~2/8 probed lists hold ~100 vectors — MORE than the
    // 50-candidate shortlist, so the ADC ordering genuinely prunes
    // and encoding quality (raw vs residual) can change recall
    val bases = (0 until 5).map(_ => Array.fill(dim)(rnd.nextGaussian()))
    val rows =
      bases.zipWithIndex.map { case (b, i) => (i.toLong, b.map(_.toFloat).toSeq) } ++
      (5L to 399L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)) ++
      bases.zipWithIndex.map { case (b, i) =>
        (400L + i, b.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat).toSeq) }
    val df = rows.toDF("vec_id", "embedding")
    def hits(res: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      res.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val truth = hits(Ann.bruteforce(df))
    val raw = hits(Ann.ivfPq(df))
    val residual = hits(Ann.ivfPqResidual(df))
    // every query's near-identical twin must come through the residual
    // pipeline: same coarse list as its query, near-minimal ADC
    (0 until 5).foreach { q =>
      assert(residual.contains((q.toLong, 400L + q)), s"query $q must recover its twin")
    }
    val rawRecall = (raw intersect truth).size
    val resRecall = (residual intersect truth).size
    assert(resRecall >= rawRecall,
      s"residual encoding recall $resRecall must be >= raw $rawRecall")
    // C18c: per-list codebooks spend the same index bytes on each
    // list's LOCAL residual geometry — on this fixture (~50 vectors,
    // hence full 16-codeword books, per list) that must not lose the
    // planted twins and must at least match the shared-codebook recall
    val perlist = hits(Ann.ivfPqPerList(df))
    (0 until 5).foreach { q =>
      assert(perlist.contains((q.toLong, 400L + q)),
        s"query $q must recover its twin through per-list codebooks")
    }
    val perlistRecall = (perlist intersect truth).size
    assert(perlistRecall >= resRecall,
      s"per-list recall $perlistRecall must be >= shared-codebook $resRecall")
  }

  test("per-list Lloyd round cuts quantization distortion; C18c holds the nprobe ceiling (r11)") {
    val emb = graft.Tables(spark, sf("sf0.01"), "embeddings")
    val resid = Ann.perListResiduals(emb)
    val (cw0, cw) = Ann.perListCodebooks(resid)
    // total sub-vector quantization distortion Σ min_j ||sv − cw_j||²
    // — the objective a Lloyd round provably never increases; here it
    // must drop MATERIALLY (measured −29% at sf0.01), proving the
    // round is live and the refined books beat the raw seeds
    def distortion(book: org.apache.spark.sql.DataFrame): Double = {
      val subm = resid.select(col("cid"), col("vec_id"),
          explode(sequence(lit(0), lit(7))).as("m"), col("e"))
        .select(col("cid"), col("vec_id"), col("m"),
          slice(col("e"), col("m") * 8 + 1, lit(8)).as("sv"))
      subm.join(book, Seq("cid", "m"))
        .select(col("vec_id"), col("m"),
          aggregate(zip_with(col("sv"), col("cwv"), (a, b) => (a - b) * (a - b)),
            lit(0.0), _ + _).as("d2"))
        .groupBy(col("vec_id"), col("m")).agg(min(col("d2")).as("d"))
        .agg(sum(col("d"))).head.getDouble(0)
    }
    val d0 = distortion(cw0)
    val d1 = distortion(cw)
    assert(d1 < d0 * 0.95, s"Lloyd round must reduce distortion: $d0 -> $d1")
    // recall@10 at sf0.01 is bounded by the nprobe=2 list restriction,
    // not encoding quality: C18c's truth overlap must EQUAL IVF-Flat's
    // (exact scoring inside the same probed lists). This is why the
    // recall curve's perlist figure cannot move at this fixture — the
    // quantizer is already lossless at the probing ceiling.
    def hits(res: org.apache.spark.sql.DataFrame): Long = {
      val truth = Ann.bruteforce(emb).select(col("q_id"), col("vec_id"))
      res.select(col("q_id"), col("vec_id")).join(truth, Seq("q_id", "vec_id")).count()
    }
    val ceiling = hits(Ann.ivf(emb))
    assert(hits(Ann.ivfPqPerList(emb)) === ceiling,
      s"per-list IVF-PQ must reach the IVF-Flat probing ceiling ($ceiling)")
  }

  test("Multimodal round-trips REAL PNG/BMP payloads and the decode is load-bearing") {
    import spark.implicits._
    // known image: "ab" → 2×4 gray, pixel(x,y) = (char+y)%256
    // sum = 4·(97+98) + 2·(0+1+2+3) = 792, via the real ImageIO decode
    for (fmt <- Seq("png", "bmp")) {
      val (w, h, sum) = Multimodal.ImageCodec.decode(
        Multimodal.ImageCodec.encode("ab", fmt))
      assert((w, h, sum) === ((2, 4, 792L)), fmt)
    }
    val df = Seq((1L, "abcd", "x"), (2L, "", "y")).toDF("doc_id", "text", "junk")
    // payloads are genuine container bytes, not a fake: PNG magic /
    // 'BM' header on the actual content column
    val media = Multimodal.mediaFrame(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content")).toMap
    assert((media(2L)(1) & 0xff, media(2L)(2) & 0xff) === ((0x50, 0x4e)), "PNG magic") // 'P','N'
    assert((media(1L)(0) & 0xff, media(1L)(1) & 0xff) === ((0x42, 0x4d)), "BM header")
    val out = Multimodal.pipeline(df).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getDouble(6))).toMap
    // "abcd": w=4, sum = 4·(97+98+99+100) + 4·6 = 1600, mean 100.0
    assert(out(1L) === (("bmp", 4L, 4L, 1600L, 100.0)))
    // empty text: w clamps to 1, pixels are (0+y)%256 → sum 6
    assert(out(2L) === (("png", 1L, 4L, 6L, 1.5)))
    // fused extractors: ONE decode feeds stats + range + histogram.
    // "abcd" pixels are (97..100)+(0..3) → [97, 103]: all 16 in
    // bucket 1 ([64,128)); empty text's pixels are 0..3 → bucket 0
    val fused = Multimodal.features(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(fused(1L).getLong(7) === 97L && fused(1L).getLong(8) === 103L)
    assert((9 to 12).map(fused(1L).getLong) === Seq(0L, 16L, 0L, 0L))
    assert((9 to 12).map(fused(2L).getLong) === Seq(4L, 0L, 0L, 0L))
  }

  test("PerceptualHash: known aHash values; same content hashes equal across containers") {
    import spark.implicits._
    // docs 1 (bmp) and 2 (png) carry IDENTICAL content in different
    // containers — a perceptual hash must see through the container
    val df = Seq((1L, "abcd"), (2L, "abcd"), (3L, "")).toDF("doc_id", "text")
    val r = Multimodal.phash(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === r(2L))
    // "abcd": sample(cx,cy) = 97 + cx/2 + cy/2, mean 100 → bit set iff
    // cx/2 + cy/2 >= 4, which is 6 of 16 (x,y) pairs × 4 cells = 24
    assert(java.lang.Long.bitCount(r(1L)._1) +
      java.lang.Long.bitCount(r(1L)._2) === 24)
    // empty text: w=1, samples are the row index cy/2 (mean 1.5) → the
    // top four rows exactly = bits 32..63 → hi all-ones, lo zero
    assert(r(3L) === ((0xFFFFFFFFL, 0L)))
  }

  test("phashPairs: the banded Hamming join equals brute force over distinct hashes (C8d)") {
    // exhaustiveness of the d+1-band pigeonhole join, proven against
    // the quadratic scan the operator exists to avoid — on the real
    // corpus, where exact-dup image groups make raw pairs quadratic
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val hashes = Multimodal.phash(docs).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    val groups = hashes.groupBy(x => (x._2, x._3)).map { case ((hi, lo), g) =>
      (hi, lo, g.length.toLong, g.map(_._1).min)
    }.toSeq
    val brute = (for {
      a <- groups; b <- groups
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      ham = java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
      if ham >= 1 && ham <= 3
    } yield (a._4, b._4, a._3, b._3, ham.toLong))
      .sortBy(p => (p._1, p._2))
    val banded = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(brute.nonEmpty, "fixture: the corpus must contain near-dup images")
    assert(banded === brute)
  }

  test("multimodal decode fusion: prewarmed bench path derives all four entries exactly") {
    val dir = sf("sf0.001")
    // standalone forms FIRST (no memo yet — these pay their own decode)
    val alone = Seq("multimodal_pipeline", "multimodal_features",
      "multimodal_phash", "multimodal_dedup_phash").map { name =>
      name -> Multimodal.queries(name)(spark, dir).collect().map(_.toSeq).toSet
    }
    Multimodal.prewarmFused(spark, dir)
    try {
      alone.foreach { case (name, expected) =>
        val fused = Multimodal.queries(name)(spark, dir)
          .collect().map(_.toSeq).toSet
        assert(fused === expected,
          s"$name must be identical off the shared decoded frame")
      }
    } finally Multimodal.clearFused(spark, dir)
  }
}
