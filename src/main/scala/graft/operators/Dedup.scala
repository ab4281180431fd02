package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §2
  * C1–C5): exact hash dedup, MinHash+LSH, SimHash, exact n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedup shuffles only (hash, doc_id) pairs — the text never
  *    moves after the map-side md5.
  *  - MinHash-LSH and embedding-LSH never compare all pairs: candidates
  *    come from an equi-join on band/bucket keys, which Spark executes as
  *    a hash join on the bucket key. The candidate count is bounded by
  *    the LSH collision structure, not |docs|².
  *  - exact n-gram Jaccard (C4) IS quadratic in the worst case by
  *    definition (it's the exact-verification primitive); at scale it is
  *    only ever run on LSH-candidate pairs. The standalone entry exists
  *    because it is the SQL-oracle-checkable ground truth.
  *
  * Hash parity: signatures that the ORACLE recomputes (simhash) are
  * md5-derived — identical in Spark and DuckDB by definition. LSH
  * internals that only select candidates (minhash seeds, band keys)
  * use Spark's codegen'd xxhash64: they need determinism and
  * independence, not cross-engine parity, because every candidate is
  * exactly verified before it reaches a result.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Distinct word-3-gram shingles (0-based token indexing). Documents
    * with <3 tokens are dropped on BOTH engines (an empty shingle array
    * here ⇔ len(toks) >= 3 in the oracle — ≥3 tokens always produce ≥1
    * shingle). Native one-pass
    * [[org.apache.spark.sql.graft.WordShingles]] — same split/concat/
    * distinct semantics as the declarative chain it replaced. */
  private def withShingles(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, WordShingles}
    d.withColumn("shingles",
        Bridge.column(WordShingles(Bridge.expression(col("text")))))
      .filter(size(col("shingles")) > 0)
  }

  /** The shingled doc-id universe (C2's candidate domain) — shared
    * with the streaming near-dup gate (D3c), whose kept set is defined
    * over exactly the docs that produce shingles. */
  private[graft] def shingled(documents: DataFrame): DataFrame =
    withShingles(documents).select(col("doc_id"))

  private[graft] val shinglesSql =
    """SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(toks) - 2),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |WHERE len(toks) >= 3""".stripMargin

  /** Exact Jaccard pairs over distinct shingle sets at `threshold`,
    * shared by the C4 oracle and the C2 oracle (LSH + exact verification
    * returns exactly the true-pair set when band recall is 1, which holds
    * for the planted near-dup structure — verified empirically at every
    * test SF; see DedupSpec). */
  private[graft] def jaccardPairsSql(threshold: Double): String =
    s"""WITH sh AS ($shinglesSql),
       |g AS (SELECT doc_id, unnest(shingles) AS gram FROM sh),
       |sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jacc AS jaccard FROM (
       |  SELECT doc_a, doc_b, c / (sa.n + sb.n - c) AS jacc
       |  FROM shared JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
       |WHERE jacc >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- C1
  /** Exact dedup: md5 groupBy, keep-first. Only (hash, doc_id) shuffles.
    * Library form: pure function of the documents frame (any frame with
    * `doc_id`, `text`); the (spark, dir) overload is the test-table
    * adapter. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(md5(col("text")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  def exact(spark: SparkSession, dir: String): DataFrame =
    exact(docs(spark, dir))

  val exactSql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- C1b
  /** Tokens per paragraph. The synthetic corpus is a flat token stream
    * (no newline/sentence structure), so "paragraph" is the structural
    * proxy a packing pipeline would use: fixed 16-token chunks. A real
    * corpus would split on blank lines first and chunk only oversized
    * paragraphs — the plan below is identical either way. */
  private val ParaTokens = 16

  /** Paragraph-level exact dedup — the most common real training-data
    * cleanup beyond whole-doc dedup (boilerplate headers/footers repeat
    * across documents that are NOT duplicates themselves): explode docs
    * into paragraphs, md5 each, keep the globally-first occurrence
    * (min (doc_id, para_idx)), reassemble per doc. Output per doc:
    * paragraph counts and the md5 of the reassembled (kept-only) text —
    * proof of reassembly without hauling the text through the gate.
    *
    * Scale: paragraph rows are bounded (≤ [[ParaTokens]] tokens each);
    * the winner table is one skew-proof map-side-combined groupBy on the
    * paragraph hash (a boilerplate paragraph with 10⁹ copies collapses
    * to one row per map task — the C1 argument); the join back on `h`
    * is AQE-skew-splittable; reassembly groups by doc_id, bounded by
    * doc size. Three shuffles of paragraph-mass data, corpus text never
    * rides a shuffle twice. */
  def exactParagraphs(documents: DataFrame): DataFrame = {
    val paras = documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          expr(s"sequence(0, ((size(toks) + ${ParaTokens - 1}) div $ParaTokens) - 1)"),
          i => concat_ws(" ", slice(col("toks"), i * ParaTokens + 1, lit(ParaTokens))))))
      .select(col("doc_id"), col("pos").as("para_idx"), col("col").as("para"))
      .withColumn("h", md5(col("para")))
    // keep-first winner per paragraph hash: min over the (doc_id,
    // para_idx) struct — partial aggregation makes the hot-paragraph
    // case map-side-collapse exactly like C1's exact()
    val winners = paras.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("w"))
    val flagged = paras.join(winners, Seq("h"))
      .withColumn("kept",
        col("doc_id") === col("w.doc_id") && col("para_idx") === col("w.para_idx"))
    flagged.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        // reassemble kept paragraphs in para_idx order (collect_list
        // drops the nulls the `when` leaves for demoted paragraphs;
        // sort_array orders the struct by its leading para_idx field)
        md5(concat_ws(" ",
          transform(
            sort_array(collect_list(when(col("kept"),
              struct(col("para_idx"), col("para"))))),
            x => x.getField("para")))).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  def exactParagraphs(spark: SparkSession, dir: String): DataFrame =
    exactParagraphs(docs(spark, dir))

  /** Oracle: same chunking (DuckDB inclusive-end list slice ≡ Spark
    * length-bounded slice, both clamped), same keep-first rule
    * (row_number over (h) ordered by (doc_id, para_idx) = 1 ≡ the
    * min-struct winner), same space-joined reassembly. string_agg
    * skips the non-kept NULLs like collect_list; coalesce('') matches
    * Spark's md5 of the empty concat for fully-demoted docs. */
  val exactParagraphsSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |p AS (SELECT doc_id,
       |    unnest(generate_series(0, (len(toks) + ${ParaTokens - 1}) // $ParaTokens - 1)) AS para_idx,
       |    toks
       |  FROM t),
       |p2 AS (SELECT doc_id, para_idx,
       |    array_to_string(toks[(para_idx * $ParaTokens + 1):(para_idx * $ParaTokens + $ParaTokens)], ' ') AS para
       |  FROM p),
       |w AS (SELECT doc_id, para_idx, para,
       |    row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, para_idx) AS rn
       |  FROM p2)
       |SELECT doc_id, count(*) AS n_paras,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN para END, ' ' ORDER BY para_idx), '')) AS kept_md5
       |FROM w
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- C4
  /** Exact n-gram-Jaccard near-dup pairs at 0.5 — explode + equi-join on
    * gram + group. Exact by construction; the oracle is the same algebra
    * in DuckDB.
    *
    * This count-based algebra is the right primitive for NEAR-DUP-DENSE
    * corpora (every test SF here): the co-gram join output is ~the true
    * pair mass, each row is three longs, and c falls out of one
    * map-side-combined groupBy — measured 2-3× faster than the PPJoin
    * candidate+verify shape on the same data. Its weakness is the df²
    * blow-up on globally-hot grams; for boilerplate-dominant corpora use
    * [[ngramJaccardPrefix]], whose prefix filter eliminates exactly that
    * blow-up (identical output, lemma-exact). */
  def ngramJaccard(documents: DataFrame): DataFrame =
    ngramJaccardImpl(documents, None)

  /** Shared body: persists the shingle table for the plan's multiple
    * consumers (sizes + hot-gram set + both self-join sides) —
    * MEMORY_AND_DISK spills rather than OOMs at scale — and releases
    * it deterministically even when the plan throws (the returned
    * frame is localCheckpoint-materialized, so the release is safe).
    * `hot` is an optional caller-persisted `(gram, df>=2)` frame
    * ([[ngramJaccardAuto]]'s probe output) standing in for the plan's
    * own hot-gram aggregate. */
  private def ngramJaccardImpl(documents: DataFrame, hot: Option[DataFrame]): DataFrame = {
    val sh = withShingles(documents).select(col("doc_id"), col("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ngramJaccardFromShingles(sh, hot) finally sh.unpersist()
  }

  /** [[ngramJaccard]] over a CALLER-persisted `(doc_id, shingles)`
    * frame. The caller owns the persist/unpersist; the returned frame
    * is localCheckpoint-materialized, so releasing `sh` afterwards is
    * safe. */
  private def ngramJaccardFromShingles(sh: DataFrame,
                                       hot: Option[DataFrame] = None): DataFrame = {
    // join/shuffle on the 64-bit gram hash, not the gram string: ~5×
    // fewer shuffle bytes and long-key joins. Distinctness per doc is
    // preserved by array_distinct upstream; a cross-gram collision
    // (p ≈ n²/2⁶⁴ ≈ 1e-7 here) would surface instantly as an oracle
    // mismatch — it is checked at every test SF.
    val grams = sh.select(col("doc_id"), explode(col("shingles")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gram"))
    val sizes = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
    // exact prefilter: a gram occurring in a single document joins only
    // with itself and contributes no (a<b) pair — semi-join against the
    // df>=2 gram set before the self-join. The hot set is tiny on
    // mostly-unique corpora (only genuinely shared content survives), so
    // AQE broadcasts it and the self-join input shrinks by an order of
    // magnitude without changing any result. A caller-supplied hot
    // frame (the auto-dispatcher's already-persisted probe aggregate)
    // replaces the groupBy — one full-gram-mass shuffle saved.
    val hotGrams = hot.map(_.select(col("gram"))).getOrElse(
      grams.groupBy(col("gram"))
        .agg(count(lit(1)).as("df")).filter(col("df") >= 2).select(col("gram")))
    // no persist on pruned: both self-join sides are identical
    // subplans and ReuseExchange shares the materialized shuffle —
    // measured equal to an explicit cache without the write overhead
    val pruned = grams.join(hotGrams, Seq("gram"), "left_semi")
    val shared = pruned.as("a")
      .join(pruned.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jacc", col("c") / (col("sa.n") + col("sb.n") - col("c")))
      .filter(col("jacc") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jacc").as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
      // eager-materialize the (small: dup-pair mass) result so the
      // shingle cache can be released NOW instead of leaking into the
      // session (localCheckpoint blocks live outside the CacheManager
      // and are reclaimed by the ContextCleaner when the frame is GC'd)
      .localCheckpoint()
  }

  // --------------------------------------------------------------- C4b
  /** Exact n-gram-Jaccard pairs at `threshold` with PPJoin-style prefix
    * filtering (Xiao et al., WWW'08; Chaudhuri et al., ICDE'06) — the
    * variant for BOILERPLATE-DOMINANT corpora, where [[ngramJaccard]]'s
    * co-gram join blows up as df² on the crawl-header grams repeated
    * across millions of non-duplicate pages. Identical output.
    *
    * Candidates come from a self-join restricted to each document's
    * PREFIX — its (n − ⌈t·n⌉ + 1) globally-rarest grams. Losslessness:
    * jaccard(a,b) ≥ t implies |a∩b| ≥ t·max(|a|,|b|) (the union is at
    * least the larger set), so a qualifying pair's overlap exceeds
    * ⌈t·n⌉ on both sides; if every shared gram sat outside a prefix,
    * all of them would fit in that doc's last ⌈t·n⌉ − 1 slots —
    * pigeonhole contradiction. Shared grams carry the SAME global key
    * (df, gram) in both docs, so the smallest shared gram lands in both
    * prefixes (the prefix-filtering lemma).
    *
    * Prefix extraction never ranks the full gram mass: under the global
    * order (df, gram), a doc's u df==1 grams all sort BEFORE its df≥2
    * grams, and df==1 grams cannot join — so the effective join input
    * is the doc's (p − u) smallest-df hot grams when p > u, and NOTHING
    * otherwise (computed with array ops over the small per-doc hot-gram
    * list; no window, no full-mass sort). Ascending-df order pushes
    * boilerplate grams to the END of every doc's order, so a df≈10⁶
    * gram lands in a prefix only for docs made almost entirely of even
    * hotter grams — the df² blow-up disappears while the result stays
    * exact. Verification is the C2 array-intersect shape over the
    * cached shingle table, costed by candidate-pair mass only. */
  def ngramJaccardPrefix(documents: DataFrame, threshold: Double = 0.5): DataFrame =
    ngramJaccardPrefixImpl(documents, threshold, None)

  /** [[ngramJaccardImpl]]'s persist/try-finally shape for the prefix
    * variant. */
  private def ngramJaccardPrefixImpl(documents: DataFrame, threshold: Double,
                                     hot: Option[DataFrame]): DataFrame = {
    val sh = withShingles(documents).select(col("doc_id"), col("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ngramJaccardPrefixFromShingles(sh, threshold, hot) finally sh.unpersist()
  }

  /** [[ngramJaccardPrefix]] over a CALLER-persisted shingle frame (the
    * [[ngramJaccardFromShingles]] contract). */
  private def ngramJaccardPrefixFromShingles(sh: DataFrame, threshold: Double,
                                             hot: Option[DataFrame] = None): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val grams = sh.select(col("doc_id"), explode(col("shingles")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gram"))
    // a cross-gram hash collision can only ADD a candidate (verification
    // recounts real shared grams), never lose one: equal strings always
    // hash equal, and the lemma's order just needs global consistency.
    // The auto-dispatcher hands its persisted probe aggregate in as
    // `hot` — identical values, one full-gram-mass shuffle saved.
    val hotDf = hot.getOrElse(
      grams.groupBy(col("gram"))
        .agg(count(lit(1)).as("df")).filter(col("df") >= 2))
    val hotPerDoc = grams.join(hotDf, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("df"), col("gram"))).as("hot"))
    // p = n − ⌈t·n⌉ + 1; join input = the (p − u) smallest hot grams,
    // each carrying its 0-based rank k in the doc's hot-gram order (the
    // doc's full-order position is u + k + 1, so the count of grams
    // AFTER it is hotSz − k − 1 — every gram after a hot gram is hot)
    val prefix = sh
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
      .join(hotPerDoc, Seq("doc_id")) // inner: all-unique docs vanish here
      .withColumn("hotSz", size(col("hot")).cast("long"))
      .withColumn("take",
        (col("n") - ceil(col("n") * lit(threshold)).cast("long") + 1 -
          (col("n") - col("hotSz"))).cast("int"))
      .filter(col("take") >= 1)
      .select(col("doc_id"), col("n"), col("hotSz"),
        posexplode(expr("slice(array_sort(hot), 1, take)")))
      .select(col("doc_id"), col("n"), col("hotSz"),
        col("pos").as("k"), col("col.gram").as("gram"))
    // candidate pairs + PPJoin POSITIONAL filter: within a doc,
    // position is monotone in the gram key, so min(k) over a pair's
    // matched rows lands on the globally-smallest shared gram in BOTH
    // docs; every shared gram is ≥ it, hence inside both suffixes from
    // that position — overlap ≤ 1 + min(suffix lengths). A pair whose
    // overlap BOUND cannot reach the threshold is pruned before any
    // verification; on a corpus where rare grams link many
    // low-similarity pairs this cuts the verify mass by orders of
    // magnitude. The prune compares bound/(na+nb−bound) ≥ t — the SAME
    // correctly-rounded division the final filter applies to the true
    // c, which is monotone in the numerator, so float rounding can
    // never prune a pair the final filter would keep.
    val bound = lit(1L) +
      least(col("ha") - col("ka") - 1, col("hb") - col("kb") - 1)
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"),
        first(col("a.hotSz")).as("ha"), first(col("b.hotSz")).as("hb"),
        min(col("a.k")).cast("long").as("ka"), min(col("b.k")).cast("long").as("kb"))
      .filter(bound / (col("na") + col("nb") - bound) >= threshold)
      .select(col("doc_a"), col("doc_b"))
    // exact verification on the cached shingle arrays (the C2 verify
    // shape): candidate-pair mass only, two doc-keyed joins against the
    // persisted sh — measured several times cheaper than replaying the
    // gram table through a (doc, gram) count join at the same candidate
    // count. The division matches C4's c/(na+nb−c) operand order so an
    // identical pair hashes identically across the two entries.
    cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("c",
        size(array_intersect(col("sa.shingles"), col("sb.shingles"))).cast("long"))
      .withColumn("jacc",
        col("c") / (size(col("sa.shingles")).cast("long") +
          size(col("sb.shingles")).cast("long") - col("c")))
      .filter(col("jacc") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jacc").as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint()
  }

  def ngramJaccardPrefix(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPrefix(docs(spark, dir))

  /** Regime AUTO-dispatcher for exact n-gram Jaccard: probes the gram
    * document-frequency distribution, estimates BOTH plans' join-output
    * volumes, and picks the smaller — the count-based co-gram join
    * ([[ngramJaccard]]) when shared grams are rare (near-dup-dense
    * corpora at permissive thresholds), the prefix+positional variant
    * ([[ngramJaccardPrefix]]) when hot grams dominate (boilerplate
    * crawls) or the threshold is high (prefixes shrink as (1−t)·n, so
    * prefix's candidate mass collapses while the co-gram join's Σdf²
    * output is threshold-blind). Both plans are exact and
    * output-identical, so the choice is pure optimization — the
    * statistics-then-plan step a SQL optimizer runs. The probe scans
    * the corpus twice (one narrow no-shuffle mass aggregate, one
    * full-gram-mass groupBy) — at 100 TB that is ANALYZE, paid once
    * and amortized over the dedup it steers. Threshold ≥ 0.5 (the
    * count path's published primitive; its ≥0.5 output post-filters
    * losslessly to any higher t).
    *
    * Cost model (r11 — replaces a fixed Σdf²/Σdf amplification cutoff
    * that ignored `threshold` and, at t=0.8, dispatched the measured-2×
    * -slower count plan on the bench corpus):
    *  - count plan's co-gram join emits EXACTLY
    *    V_count = Σ_{df≥2} df(df−1)/2 = (Σdf² − Σdf)/2 rows;
    *  - prefix plan's candidate join input is, per doc,
    *    max(0, p − u) hot grams (p = n − ⌈t·n⌉ + 1 prefix slots, u
    *    unique grams, which sort first and never join). Globally that
    *    is ≈ H = max(0, Σp − Σu) occurrences — Σu = mass − Σdf from
    *    the same two probe aggregates (a Jensen-style underestimate
    *    when corpora mix all-unique docs with near-dup docs; measured
    *    within 4% of exact on the bench corpus, where unique mass is
    *    tiny);
    *  - each doc takes its RAREST hot grams, so H is spent over the df
    *    distribution ascending: V_prefix ≈ Σ C(df,2) over the rarest
    *    grams whose occurrence mass fits in H (fully-consumed
    *    power-of-two df buckets contribute their exact pair sums; the
    *    marginal bucket scales by fraction² — measured 0.74-0.90× of
    *    the exact prefix-candidate count at sf0.1).
    * A prefix candidate costs more than a count row (group + two
    * doc-keyed verify joins + array_intersect vs one counted long), so
    * prefix wins only when `prefixCostFactor`·V_prefix < V_count. The
    * factor is calibrated against clean-machine A-vs-B phase timings
    * at THREE scale points (r12, `bench_points_r12/ngram_ab_sf{1,3}
    * .json` + the r11 sf10 probe; t=0.8, V_prefix ≈ 0.087·V_count at
    * all three): prefix measures 2.2-2.4× faster at sf1/sf3 and
    * statistically TIES count at sf10 — so the prefix pick's regret
    * is 0 / 0 / ~0.7s, while a count pick would have cost +8.5s /
    * +19.8s / −0.7s. The t=0.5 sf0.1 flip (count wins at V_prefix ≈
    * 0.33·V_count) bounds K from below at ~3; the t=0.8 data bounds
    * it above at ~11.5 — K = 5 sits inside with margin both sides.
    * Known model limit, measured not guessed: the count plan's
    * per-row cost FALLS with scale (a codegen'd grouped count
    * amortizes its fixed overheads: 1.1 µs/row at sf1 → 0.25 µs/row
    * at sf10) while prefix's per-candidate verify cost stays ~3-5 µs,
    * so the linear rule overestimates count's cost at 100× and the
    * predicted 11× prefix advantage at sf10 is really a tie — an
    * error in the cheap direction (the tie makes either pick
    * harmless), but on a corpus far past the tie point count can win
    * outright; re-probe rather than extrapolate there. Forcing
    * values used by specs: 0.0 dispatches prefix whenever the count
    * plan would emit anything at all; a huge value always dispatches
    * count.
    *
    * K RECALIBRATED r18 (K = 5 → 32, bench_points_r18/
    * ngram_il_sf10_opt.json): the r18 interleaved sf10 A/B on the
    * current Spark/host reads count at 0.4-0.6 µs/row against prefix
    * at 12-42 µs/candidate in the COLD-to-first-warm regime (cold
    * 77 s vs 468 s; first warm rep 50 s vs 138 s) — prefix only
    * reaches its 1.9 µs/candidate steady state after two back-to-back
    * warm replays of the same corpus, a regime a 100 TB single-pass
    * dedup never enters (the corpus cannot be page-cache-resident).
    * K = 32 prices prefix at its first-pass cost, which on this
    * corpus family (V_prefix ≈ 0.087·V_count) dispatches the stable
    * count plan at every probed SF: the measured regret is ~0.3 s at
    * sf0.1 (tie band), −39 s cold / +9 s steady-warm at sf10. The
    * prefix plan stays first-class (its own gated entry C4b) and
    * still dispatches on hot-gram-dominated corpora, where V_prefix
    * collapses orders of magnitude below V_count.
    *
    * What is (and is NOT) persisted: the probe materializes only the
    * SMALL `(gram, df≥2)` aggregate — two longs per genuinely-shared
    * gram — and hands that same frame to the dispatched plan as its
    * hot-gram input, so the probe's full-gram-mass shuffle is spent
    * once and reused, never discarded. The driver sees only bounded
    * data: two single-row aggregates and a ≤64-row bucket histogram.
    * The per-doc shingle arrays are deliberately NOT persisted across
    * the probe: r8 cached them MEMORY_AND_DISK to share one
    * tokenization, and at sf10 the arrays overflowed local storage
    * memory and the spill thrash cost 2.4× the dispatched plan itself
    * (207s vs 86s) — tokenization is a cheap narrow map, re-run by the
    * plan's own scoped persist; the expensive global aggregate is the
    * thing worth keeping. */
  def ngramJaccardAuto(documents: DataFrame, threshold: Double = 0.5,
                       prefixCostFactor: Double = 32.0): DataFrame = {
    require(threshold >= 0.5 && threshold <= 1,
      s"auto dispatch supports thresholds in [0.5, 1]: $threshold")
    // narrow probe: total gram mass and prefix-slot mass — no shuffle,
    // one scan, two longs out
    val massRow = withShingles(documents)
      .select(size(col("shingles")).cast("long").as("n"))
      .agg(
        coalesce(sum(col("n")), lit(0L)).as("mass"),
        coalesce(sum(col("n") - ceil(col("n") * lit(threshold)).cast("long") + 1),
          lit(0L)).as("slots"))
      .head()
    val hotDf = withShingles(documents)
      .select(explode(col("shingles")).as("gram"))
      .select(xxhash64(col("gram")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df")).filter(col("df") >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = dispatchStats(hotDf, massRow.getLong(0), massRow.getLong(1))
      // both branches return an EAGERLY checkpoint-materialized frame
      // (the trailing filter reads checkpoint blocks, not hotDf's
      // lineage), so the probe cache is released on every path
      if (stats.prefixWins(prefixCostFactor))
        ngramJaccardPrefixImpl(documents, threshold, Some(hotDf))
      else
        ngramJaccardImpl(documents, Some(hotDf)).filter(col("jaccard") >= threshold)
    } finally hotDf.unpersist()
  }

  /** The auto-dispatcher's decision inputs: both plans' estimated join
    * output volumes. Exposed so specs (and operators debugging a
    * dispatch choice in production) can interrogate the decision the
    * probe would make without running either plan. */
  final case class NgramDispatchStats(vCount: Double, vPrefix: Double) {
    /** The dispatch rule: prefix iff K·max(V_prefix, 1) < V_count.
      * max(·,1) keeps the forcing values total (K=1e18 must pick count
      * even when the estimate rounds to zero candidates) and is noise
      * against any real volume. */
    def prefixWins(prefixCostFactor: Double): Boolean =
      prefixCostFactor * math.max(vPrefix, 1.0) < vCount
  }

  /** Computes [[NgramDispatchStats]] from the persisted hot-gram frame
    * plus the two narrow-scan totals. Driver-side data is bounded: one
    * ≤64-row power-of-two df-bucket histogram (a raw per-df histogram
    * is O(√Σdf) rows — collectable at test SFs, not at 100 TB). */
  private def dispatchStats(hotDf: DataFrame, mass: Long, slots: Long): NgramDispatchStats = {
    val buckets = hotDf
      .groupBy(floor(log(2.0, col("df"))).as("b"))
      .agg(sum(col("df")).as("m"), sum(col("df") * col("df")).as("m2"))
      .orderBy(col("b"))
      .collect()
    val s1 = buckets.map(_.getLong(1)).sum
    val s2 = buckets.map(_.getLong(2)).sum
    // the count plan's co-gram join output, EXACT: Σ df(df−1)/2
    val vCount = (s2 - s1) / 2.0
    // prefix-candidate estimate: hot occurrence mass that fits in the
    // prefix slots after unique grams (mass − s1 of them) fill first,
    // spent over the df buckets rarest-first; fully-consumed buckets
    // contribute their exact pair sums, the marginal one scales by
    // fraction²
    var rem = math.max(0L, slots - (mass - s1)).toDouble
    var vPrefix = 0.0
    buckets.foreach { r =>
      val m = r.getLong(1).toDouble
      val pairs = (r.getLong(2) - r.getLong(1)) / 2.0
      if (rem >= m) { vPrefix += pairs; rem -= m }
      else if (rem > 0) { vPrefix += pairs * (rem / m) * (rem / m); rem = 0 }
    }
    NgramDispatchStats(vCount, vPrefix)
  }

  /** Standalone probe: the decision [[ngramJaccardAuto]] would make for
    * `documents` at `threshold`, without dispatching either plan. Runs
    * the same two probe scans (narrow mass aggregate + hot-gram
    * groupBy). */
  def ngramDispatchStats(documents: DataFrame, threshold: Double): NgramDispatchStats = {
    require(threshold >= 0.5 && threshold <= 1,
      s"auto dispatch supports thresholds in [0.5, 1]: $threshold")
    val massRow = withShingles(documents)
      .select(size(col("shingles")).cast("long").as("n"))
      .agg(
        coalesce(sum(col("n")), lit(0L)).as("mass"),
        coalesce(sum(col("n") - ceil(col("n") * lit(threshold)).cast("long") + 1),
          lit(0L)).as("slots"))
      .head()
    val hotDf = withShingles(documents)
      .select(explode(col("shingles")).as("gram"))
      .select(xxhash64(col("gram")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    dispatchStats(hotDf, massRow.getLong(0), massRow.getLong(1))
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccard(docs(spark, dir))

  val ngramJaccardSql: String = jaccardPairsSql(0.5)

  // --------------------------------------------------------------- C4d
  /** Containment threshold (ppm): flag a pair when the SMALLER side is
    * ≥90% contained in the other. */
  private val ContainPpm = 900000L
  private[operators] val SubsetPlantMod = 150

  /** ENTRY-LAYER FIXTURE for `dedup_ngram_containment`: every
    * [[SubsetPlantMod]]-th doc gets a TRUNCATED copy (its first
    * max(3, ⌊tokens/2⌋) tokens) at `doc_id + max+1` — a strict
    * near-SUBSET whose shingles all appear in the original, so its
    * containment is exactly 10⁶ ppm while its JACCARD is ≈ ½ and
    * below C4's 0.5 gate: precisely the pair class the symmetric
    * measure misses, guaranteed present at every SF. */
  private[graft] def plantSubsets(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"))
    val off = base
      .agg(coalesce(max(col("doc_id")), lit(-1L))).head().getLong(0) + 1L
    base.unionAll(base.filter(col("doc_id") % SubsetPlantMod === 0)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select((col("doc_id") + off).as("doc_id"),
        array_join(slice(col("toks"), lit(1),
          greatest(lit(3), expr("size(toks) div 2").cast("int"))), " ")
          .as("text")))
  }

  /** Exact n-gram CONTAINMENT pairs (C4d) — the ASYMMETRIC complement
    * of C4's Jaccard: C(A→B) = |A∩B| / |A| (Broder 1997's containment;
    * the measure Lee et al. 2022-style curation uses for
    * subset/boilerplate structure). A page-inside-page+boilerplate
    * pair sits at containment ≈ 1 but Jaccard ≈ |A|/|B| — invisible to
    * every symmetric gate in C2/C4. Emits each pair with shared-gram
    * count, both set sizes, and BOTH directed containments as exact
    * integer ppm (c·10⁶ div n — floor division both engines), kept
    * when either direction reaches [[ContainPpm]].
    *
    * Plan shape is C4's verbatim (xxhash64 gram keys, df≥2 hot-gram
    * semi-join prefilter, ReuseExchange self-join, size join, eager
    * localCheckpoint releasing the shingle cache): the same exact
    * ground-truth primitive with a different final measure, and the
    * same 100 TB regime — run standalone it IS worst-case quadratic by
    * definition; production runs it on LSH candidates (C2's banding,
    * or C4b's prefix filter applied to the smaller side, whose
    * prefix-size bound tightens as the containment threshold rises). */
  def ngramContainment(documents: DataFrame): DataFrame = {
    val sh = withShingles(documents).select(col("doc_id"), col("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // xxhash64 gram keys match the C4 pattern; the accepted (and
      // astronomically small) risk is a 64-bit collision inflating
      // `shared` vs the raw-string oracle join. Birthday-bound corpora
      // would join on the gram string (or a wider hash) in both engines.
      val grams = sh.select(col("doc_id"), explode(col("shingles")).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("gram"))
      val sizes = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
      val hotGrams = grams.groupBy(col("gram"))
        .agg(count(lit(1)).as("df")).filter(col("df") >= 2).select(col("gram"))
      val pruned = grams.join(hotGrams, Seq("gram"), "left_semi")
      val shared = pruned.as("a")
        .join(pruned.as("b"),
          col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("shared"),
          col("sa.n").as("na"), col("sb.n").as("nb"),
          expr("shared * 1000000 div na").as("ca_ppm"),
          expr("shared * 1000000 div nb").as("cb_ppm"))
        .filter(greatest(col("ca_ppm"), col("cb_ppm")) >= ContainPpm)
        .orderBy(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    } finally sh.unpersist()
  }

  def ngramContainment(spark: SparkSession, dir: String): DataFrame =
    ngramContainment(plantSubsets(docs(spark, dir)))

  val ngramContainmentSql: String =
    s"""WITH d0 AS (SELECT doc_id, text FROM documents),
       |pl AS (SELECT doc_id, text FROM d0
       |  UNION ALL
       |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM d0),
       |    array_to_string(toks[1:greatest(3, len(toks) // 2)], ' ')
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM d0)
       |  WHERE doc_id % $SubsetPlantMod = 0),
       |sh AS (SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(toks) - 2),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM pl)
       |  WHERE len(toks) >= 3),
       |g AS (SELECT doc_id, unnest(shingles) AS gram FROM sh),
       |sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, c AS shared, sa.n AS na, sb.n AS nb,
       |  (c * 1000000) // sa.n AS ca_ppm, (c * 1000000) // sb.n AS cb_ppm
       |FROM shared JOIN sz sa ON doc_a = sa.doc_id
       |  JOIN sz sb ON doc_b = sb.doc_id
       |WHERE greatest((c * 1000000) // sa.n, (c * 1000000) // sb.n)
       |  >= $ContainPpm
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- C2
  /** The near-dup Jaccard gate threshold, shared by the batch LSH
    * verify ([[minhashLsh]]/[[minhashLshSql]]), the candidate verify
    * behind the streaming gate ([[nearDupKept]]), and the D3c oracle —
    * hoisted (r18 ADVICE) so the streaming gate's verify cannot
    * silently desynchronize from the batch operator and oracle. */
  private[graft] val NearDupThreshold = 0.8
  private val MinhashK = 64
  private val MinhashBands = 16
  private val MinhashRows = 4 // K / Bands

  /** doc_id + 64 independent 64-bit minhashes via seeded xxhash64 — the
    * LSH hash needs determinism and independence, NOT oracle parity (the
    * oracle is the pure exact-Jaccard SQL; minhash only selects
    * candidates), so the native codegen'd hash beats md5 hex-slicing by
    * an order of magnitude. (An earlier derived-double-hashing variant
    * h1+j·h2 broke the 1-(1-s⁴)ᵇ recall bound on a real 0.95-Jaccard
    * pair — per-seed hashes are genuinely independent.)
    *
    * One native [[org.apache.spark.sql.graft.MinhashSignature]]
    * projection per doc — value-identical to the explode → 64-hash
    * projection → 64-MIN groupBy it replaces (see its scaladoc), but
    * with no row blow-up and no aggregation machinery: the signature
    * never leaves the scan stage, and only (doc_id, 64 longs) exists
    * downstream. */
  private def withMinhashes(sh: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, MinhashSignature}
    sh.select(col("doc_id"),
      Bridge.column(
        MinhashSignature(Bridge.expression(col("shingles")), MinhashK)).as("minhashes"))
  }

  /** C2's per-doc LSH band projection: one row per (doc, band)
    * holding `(doc_id, band_key)` — the shape the STREAMING near-dup
    * gate (D3c, Streams.scala) keys its bucket state by. Same
    * seeded-xxhash64 band keys as [[minhashLsh]]; works on a batch OR
    * streaming frame (every stage is a stateless projection).
    *
    * r18 opt (guide §2.3/§8 — shuffle keys, not payloads): the first
    * form CARRIED each doc's shingle array through the 16× band
    * explode so the gate could verify Jaccard inside the bucket fold;
    * that shipped and RocksDB-persisted every shingle set 16 times.
    * The gate now buckets 16-byte (doc_id, band_key) rows only and
    * exact-verifies its candidates through [[nearDupKept]]'s codegen
    * join — the batch operator's own candidates-then-verify split. */
  private[graft] def lshBandRows(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, MinhashSignature}
    withShingles(documents)
      .select(col("doc_id"),
        Bridge.column(MinhashSignature(
          Bridge.expression(col("shingles")), MinhashK)).as("minhashes"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(MinhashBands - 1)),
          b => xxhash64(b, slice(col("minhashes"), b * MinhashRows + 1,
            lit(MinhashRows))))).as("band_key"))
  }

  /** Exact-verify LSH candidate pairs `(doc_a, doc_b)` (doc_a earlier)
    * and return the near-dup KEPT set: shingled docs that are nobody's
    * later verified near-duplicate. The verify is [[minhashLsh]]'s own
    * codegen equi-join + array_intersect/array_union quotient — the
    * SAME double compare at the SAME threshold — so a candidate set
    * with band recall 1 yields exactly the batch operator's kept set.
    * One shingle pass serves both join sides and the kept universe. */
  private[graft] def nearDupKept(documents: DataFrame,
      cand: DataFrame): DataFrame = {
    val sh = withShingles(documents).select(col("doc_id"), col("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dropped = cand
        .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
        .withColumn("jacc",
          size(array_intersect(col("sa.shingles"), col("sb.shingles"))) /
          size(array_union(col("sa.shingles"), col("sb.shingles"))))
        .filter(col("jacc") >= NearDupThreshold)
        .select(col("doc_b").as("doc_id")).distinct()
      sh.select(col("doc_id"))
        .join(dropped, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
        // eager-materialize (ids only) so the caller's action never
        // replays the shingle pass after the unpersist below
        .localCheckpoint()
    } finally sh.unpersist(false)
  }

  /** MinHash + LSH banding: 16 bands × 4 rows; candidates = pairs
    * sharing any band key (equi-join, never cross-join); candidates are
    * then exactly verified on their shingle sets and filtered at 0.8.
    * The oracle is the pure exact-Jaccard SQL — equal because band
    * recall at the planted similarity level (≥0.9) is 1-(1-s⁴)¹⁶ ≈
    * 1-6e-14 and the data is fixed. */
  def minhashLsh(documents: DataFrame): DataFrame = {
    // persist: shingles feed the minhash pipeline and both exact-verify
    // joins; the band table feeds both sides of the candidate self-join
    val sh = withShingles(documents).select(col("doc_id"), col("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mh = withMinhashes(sh).select(col("doc_id"), col("minhashes"))
    // band key = xxhash64(band ordinal, the band's 4 minhash values):
    // one LONG instead of a 4-value string — ~4× fewer shuffle bytes
    // through the candidate self-join, and the band ordinal is folded
    // into the hash so the join needs a single key column. A key
    // collision (p ≈ 1e-19 per pair) can only ADD a candidate, and
    // every candidate is exactly verified below — correctness is
    // collision-immune by construction.
    val bands = mh.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(MinhashBands - 1)),
          b => xxhash64(b, slice(col("minhashes"), b * MinhashRows + 1, lit(MinhashRows)))))
          .as("band_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verification on shingle sets
    cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jacc",
        size(array_intersect(col("sa.shingles"), col("sb.shingles"))) /
        size(array_union(col("sa.shingles"), col("sb.shingles"))))
      .filter(col("jacc") >= NearDupThreshold)
      .select(col("doc_a"), col("doc_b"), col("jacc").as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
      // eager-materialize (pairs only) → release both caches before
      // returning; also makes the downstream clusters() reuse free
      .localCheckpoint()
    } finally { bands.unpersist(); sh.unpersist() }
  }

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLsh(docs(spark, dir))

  val minhashLshSql: String = jaccardPairsSql(NearDupThreshold)

  // ---------------------------------------------------------------- C3
  private val SimhashBits = 60

  /** 60-bit SimHash over md5 token hashes (15 hex chars = 60 bits), plus
    * four 15-bit band keys for hamming-distance bucketing: two docs with
    * hamming distance ≤ 3 share at least one of the 4 bands (pigeonhole).
    * One shuffle of map-side-combined (doc_id, 60 bit-sums) rows. */
  def simhash(documents: DataFrame): DataFrame = {
    // one native SimhashSignature projection per doc — value-identical
    // to the explode → 60 ±1-sum aggregates → recombination plan it
    // replaces (see its scaladoc; a DedupSpec test pins the parity on
    // the real corpus), md5-based as the oracle requires, with no token
    // row blow-up and no aggregation machinery.
    // null text is DROPPED, pinned on both sides (oracle CTE filters
    // identically): the native signature would yield NULL, the replaced
    // explode plan dropped the doc, and the oracle's list_sum-of-CASE
    // yields 0 — three divergent behaviors unless filtered here
    import org.apache.spark.sql.graft.{Bridge, SimhashSignature}
    documents
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        Bridge.column(
          SimhashSignature(Bridge.expression(split(col("text"), " ")))).as("simhash"))
      .select(col("doc_id"), col("simhash"),
        col("simhash").bitwiseAND((1L << 15) - 1).as("band0"),
        shiftright(col("simhash"), 15).bitwiseAND((1L << 15) - 1).as("band1"),
        shiftright(col("simhash"), 30).bitwiseAND((1L << 15) - 1).as("band2"),
        shiftright(col("simhash"), 45).bitwiseAND((1L << 15) - 1).as("band3"))
  }

  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhash(docs(spark, dir))

  /** Shared CTEs computing (doc_id, simhash) — consumed by the per-doc
    * signature oracle and the pair-extraction oracle. */
  private val simhashCtes: String =
    s"""WITH t AS (SELECT doc_id,
       |  list_transform(string_split(text, ' '),
       |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS th
       |FROM documents WHERE text IS NOT NULL),
       |s AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, ${SimhashBits - 1}),
       |  b -> CASE WHEN list_sum(list_transform(th,
       |         h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       |       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
       |FROM t)""".stripMargin

  val simhashSql: String = {
    val bandSel = (0 until 4)
      .map(i => s"CAST((simhash >> ${i * 15}) & ${(1L << 15) - 1} AS BIGINT) AS band$i")
      .mkString(",\n  ")
    s"""$simhashCtes
       |SELECT doc_id, simhash,
       |  $bandSel
       |FROM s""".stripMargin
  }

  /** SimHash near-dup PAIRS — the usable output of C3: candidate pairs
    * from a band equi-join (docs sharing any of the four 15-bit bands),
    * then exact hamming verification at ≤ 3. Recall is EXACTLY 1 by
    * pigeonhole (≤3 differing bits cannot touch all 4 bands), so the
    * result equals the brute-force all-pairs hamming join — which is
    * the oracle — while the plan never compares all pairs. */
  def simhashPairs(documents: DataFrame): DataFrame = {
    val s = simhash(documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // band ordinal folded into a long key, like the minhash bands
    val bands = s.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3)),
        b => xxhash64(b, call_function("shiftright", col("simhash"), b * 15)
          .bitwiseAND((1L << 15) - 1)))).as("band_key"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint() // eager: release the signature cache now
    } finally s.unpersist()
  }

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(docs(spark, dir))

  /** Oracle: ground-truth all-pairs hamming join (exact because banded
    * recall is 1 at distance ≤ 3). */
  val simhashPairsSql: String =
    s"""$simhashCtes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- C5
  private val EmbPlanes = 60
  private val EmbDim = 64
  private val CosineThreshold = 0.8

  /** Deterministic ±1 random hyperplanes (fixed seed — same planes on
    * every executor and every run). 60 planes: bit 63 is unusable
    * (DuckDB BIGINT `1<<63` overflows) and 60 divides evenly into the
    * 4×15-bit banding below — the same layout simhash uses. */
  private[operators] val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(EmbPlanes, EmbDim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sequential-fold dot product (bit-identical to the oracle's
    * list_inner_product) — native [[org.apache.spark.sql.graft.VecDot]]
    * loop (NOT unrolled: a 64-term expression × 60 planes blows
    * generated code past JIT method limits — measured 12× slower). */
  private def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, VecDot}
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
  }

  /** 60-bit sign signature from the fixed hyperplanes, as the native
    * codegen [[org.apache.spark.sql.graft.SignSignature]] expression:
    * one tight 60×64 multiply-add loop per row instead of 60
    * interpreted HOF dot products re-evaluated per consumer (the
    * PolyFingerprint precedent; bit-identical fold order). */
  private[operators] def signBits(e: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, SignSignature}
    Bridge.column(SignSignature(Bridge.expression(e), planes))
  }

  /** 4 bands × 15 bits from the 60-bit signature. Per-band bucket space
    * is 2¹⁵ = 32,768 (× the xxhash64 band-ordinal fold below, which
    * spreads the four bands over disjoint 64-bit key ranges) — candidate
    * pairs grow O(N²/2¹⁵) per band, vs O(N²/256) with the r3 8-bit
    * bands whose fixed 1,024-bucket space was the 100 TB scale-killer.
    * Recall trade-off (per-bit agreement p = 1-acos(c)/π): at c→1
    * recall →1 (a true near-dup pair at c=0.9999 passes with
    * p≈0.996 ⇒ 1-(1-p¹⁵)⁴ ≈ 1); at the 0.8 verification threshold
    * banded recall is <1 by design — empirically 1 on the fixed test
    * data at every SF (vacuously: no pair reaches cosine 0.75). */
  private[operators] val EmbBands = 4
  private[operators] val EmbBandBits = 15

  /** Planted near-dup controls: every [[PlantMod]]-th vector gets a
    * 0.5-scaled twin at `vec_id + max(vec_id) + 1`. 0.5 is a power of
    * two, so the scaling is IEEE-exact and commutes with addition —
    * the twin's plane dots are exactly half the original's, its sign
    * signature is bit-identical, every band matches, and the pair is
    * GUARANTEED to surface with cosine ≈ 1. This keeps the driver's
    * gate non-vacuous (the r4 artifact hash-matched 0 rows vs 0 rows,
    * which proves nothing about the pipeline); the natural corpus has
    * no pair above cosine 0.75 at any SF. The id offset is derived
    * from the DATA (`max+1`, one column-pruned aggregate both engines
    * compute identically) rather than a fixed constant, so twin ids
    * can never alias real vec_ids however large the corpus grows. */
  private[operators] val PlantMod = 100

  /** ENTRY-LAYER FIXTURE, not part of the operator: union the planted
    * twins into an embeddings frame. Lives outside [[embeddingDedup]]
    * so the production operator never fabricates rows — only the
    * registered `dedup_embedding` driver entry (and its oracle, which
    * applies the same UNION ALL) plants. The one driver action here
    * (`max(vec_id)`, a bounded scalar of a column-pruned aggregate) is
    * fixture cost, paid only by the gate. */
  private[graft] def plantTwins(embeddings: DataFrame): DataFrame = {
    val base = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("embedding"))
    val plantOffset = base
      .agg(coalesce(max(col("vec_id")), lit(-1L))).head().getLong(0) + 1L
    base.unionAll(
      base.filter(col("vec_id") % PlantMod === 0)
        .select((col("vec_id") + plantOffset).as("vec_id"),
          transform(col("embedding"), _ * 0.5).as("embedding")))
  }

  /** Embedding-cosine near-dup: sign-random-projection LSH → candidate
    * pairs by band equi-join → exact cosine verification at 0.8. Corpus
    * is never cross-joined. The oracle is ALGORITHM-PARITY SQL (the
    * ann_lsh precedent): the same fixed hyperplanes, signature, 4×15-bit
    * band match and exact cosine verify reproduced in DuckDB — banded
    * recall at the 0.8 threshold is < 1 by design (sign-LSH prunes), and
    * a ground-truth oracle would only match on data with no pairs in
    * the recall gap; the parity oracle checks the algorithm end-to-end
    * on ANY data.
    *
    * Plan shape (the r3 version was 9× slower than this): the band
    * table is ids-only — `(vec_id, band_key)` — so the 60-plane
    * signature is evaluated once per row inside the single projection
    * feeding the band-key shuffle, and both self-join sides reuse that
    * ONE exchange (ReuseExchange: identical subplans shuffling on the
    * same key — no persist, nothing to leak). Candidates leave the join
    * as id pairs, are de-duplicated, and only then re-join the vectors
    * for the exact verify — full 64-double vectors never ride the
    * candidate shuffle (the minhashLsh pattern).
    *
    * Library form: a PURE function of any `(vec_id, embedding)` frame —
    * no synthetic rows, no driver actions (the planted-twin fixture the
    * driver gate relies on lives in [[plantTwins]] and is applied only
    * by the entry registration below). */
  def embeddingDedup(embeddings: DataFrame): DataFrame = {
    val emb = embeddings
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    // one projection computes sig, then 4 hashed band keys from it;
    // explode → (vec_id, band_key) rows only
    val bands = emb
      .select(col("vec_id"), signBits(col("e")).as("sig"))
      .select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(EmbBands - 1)),
          b => xxhash64(b, call_function("shiftright", col("sig"), b * EmbBandBits)
            .bitwiseAND((1L << EmbBandBits) - 1)))).as("band_key"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(emb.as("va"), col("vec_a") === col("va.vec_id"))
      .join(emb.as("vb"), col("vec_b") === col("vb.vec_id"))
      .withColumn("cos",
        dot(col("va.e"), col("vb.e")) /
          (sqrt(dot(col("va.e"), col("va.e"))) * sqrt(dot(col("vb.e"), col("vb.e")))))
      .filter(col("cos") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("cos").as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Test-table adapter — pure (no planting; the driver entry plants
    * explicitly via [[plantTwins]]). */
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame =
    embeddingDedup(Tables(spark, dir, "embeddings"))

  val embeddingDedupSql: String = {
    // actual plane values (±1 today, but the oracle must not silently
    // sign-quantize if the plane distribution ever changes)
    val planesLit = planes
      .map(p => p.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",\n  ", "]")
    val mask = (1L << EmbBandBits) - 1
    val bandMatch = (0 until EmbBands)
      .map(b => s"((a.sig >> ${EmbBandBits * b}) & $mask) = " +
        s"((b.sig >> ${EmbBandBits * b}) & $mask)")
      .mkString(" OR ")
    s"""WITH p AS (SELECT $planesLit AS ps),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
       |      UNION ALL
       |      SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings),
       |             list_transform(embedding::DOUBLE[], x -> x * 0.5)
       |      FROM embeddings WHERE vec_id % $PlantMod = 0),
       |s AS (SELECT vec_id, e,
       |  CAST(list_sum(list_transform(generate_series(1, ${planes.length}),
       |    i -> CASE WHEN list_inner_product(e, ps[i]) > 0
       |         THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
       |  FROM v CROSS JOIN p),
       |cand AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    list_inner_product(a.e, b.e) /
       |      (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) AS cos
       |  FROM s a JOIN s b ON a.vec_id < b.vec_id AND ($bandMatch))
       |SELECT vec_a, vec_b, cos AS cosine FROM cand
       |WHERE cos >= $CosineThreshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // --------------------------------------------------------------- C48
  /** Semantic-dedup tuning: clusters are sized so a cluster holds
    * ~[[SemClusterTarget]] vectors on average — k grows with the corpus
    * (k = ⌈n/512⌉, floor 8), which is what keeps the within-cluster
    * pair mass LINEAR in n (Σ|c|² ≈ n·512 when balanced) instead of the
    * quadratic n²/k a fixed k degrades to. SemDeDup's published runs use
    * the same shape (k ≈ n/1000 at 100M-doc scale). */
  private[operators] val SemClusterTarget = 512L
  private[operators] val SemSeed = 10L
  private[operators] val SemTau = 0.8
  private[operators] val SemTwinMod = 50

  /** ENTRY-LAYER FIXTURE for `dedup_semantic` (the [[plantTwins]]
    * discipline — the operator stays pure, only the registered entry
    * and its oracle plant): every [[SemTwinMod]]-th vector gets an
    * EXACT copy at `vec_id + off` (same quantized assignment ⇒ same
    * cluster ⇒ guaranteed within-cluster drop — non-vacuous gate), and
    * every (SemTwinMod k + 25)-th gets a NEAR copy at `vec_id + 2·off`
    * with its first coordinate scaled by 0.75 (exactly representable,
    * so the perturbed vector is bit-identical cross-engine). The near
    * twin's cosine stays ≈1 but its centroid can differ — landing
    * cross-cluster is SemDeDup's documented recall trade, and the
    * oracle replays whichever way the assignment falls. */
  private[graft] def plantSemTwins(embeddings: DataFrame): DataFrame = {
    val base = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("embedding"))
    val off = base
      .agg(coalesce(max(col("vec_id")), lit(-1L))).head().getLong(0) + 1L
    base
      .unionAll(base.filter(col("vec_id") % SemTwinMod === 0)
        .select((col("vec_id") + off).as("vec_id"), col("embedding")))
      .unionAll(base.filter(col("vec_id") % SemTwinMod === 25)
        .select((col("vec_id") + 2 * off).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x * 0.75).otherwise(x)).as("embedding")))
  }

  /** Semantic dedup (C48) — SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-bucketed within-cluster cosine dedup,
    * the cluster-bucketed complement of C5's LSH banding (C5 finds
    * near-IDENTICAL pairs anywhere; this drops semantically redundant
    * docs that share a centroid — the form production curation runs
    * with a trained codebook). A vector is DROPPED iff a smaller
    * vec_id in its cluster has cosine ≥ [[SemTau]] — keep-first
    * against all earlier members, a total, order-free rule (the greedy
    * sequential variant is chain-dependent and neither distributable
    * nor SQL-expressible). Output: (vec_id, cid, kept) for every row.
    *
    * Plan shape: assignment is a PURE PROJECTION — the k-row codebook
    * collects bounded and rides into every task inside the native
    * codegen [[org.apache.spark.sql.graft.NearestCentroid]] expression
    * (one tight k×d loop per row; per-row distance = cn − 2·dot, the
    * row's own norm being assignment-invariant; ties (d, cid)). No
    * join, no aggregate: the broadcast-probe crossJoin + min(struct)
    * form it replaced materialized k×n vector-carrying rows into a
    * struct-min SortAggregate — 324s at sf10 (measured) vs
    * projection cost here.
    * The within-cluster verify joins the assigned frame to itself ON
    * cid — both sides the same object, so ReuseExchange materializes
    * the one corpus shuffle once — with the cosine predicate INSIDE the
    * join (pairs are never materialized as a frame; C5 must re-join
    * vectors because banding makes candidates sparse — here every
    * same-cluster pair is a candidate, so vectors ride the one cid
    * shuffle instead). A pathological hot cluster (all vectors on one
    * centroid) degrades to that cluster's |c|² — AQE skew-join splits
    * the straggler, and the production fix is the trained codebook
    * (balanced k-means / k-means‖ via [[graft.operators.Ann]]'s C38
    * trainer), whose whole job is bounding |c|.
    *
    * Exactness: distances and cosines are [[dot]] folds (bit-identical
    * to list_inner_product, the C5 precedent) combined by exactly-
    * rounded IEEE ops in the SAME tree shape as the oracle; argmin
    * ties break (d, cid). No quantization needed — both engines
    * compute the same doubles, whatever they are. */
  def semanticDedup(embeddings: DataFrame, codebook: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{Bridge, NearestCentroid}
    val emb = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    // bounded collect: the codebook is k ≈ n/SemClusterTarget rows (the
    // C34/C42 bounded-scalar pattern); it rides into every task as an
    // expression constant. A broadcast-probe crossJoin + min(struct)
    // argmin computed the same assignment but materialized k×n
    // VECTOR-CARRYING rows into a struct-min SortAggregate — 324s at
    // sf10 vs projection-speed here (see NearestCentroid's scaladoc).
    val cb = codebook.select(col("cid").cast("long"), col("ce"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(cb.nonEmpty, "semanticDedup: empty codebook — the seed " +
      s"convention needs vec_ids [$SemSeed, $SemSeed+k) present; pass " +
      "a trained codebook to the 2-arg overload otherwise")
    val assigned = emb
      .select(col("vec_id"), col("e"),
        Bridge.column(NearestCentroid(Bridge.expression(col("e")),
          cb.map(_._1), cb.map(_._2))).as("cid"))
      // explicit null guards (no-ops under the input contract): the
      // left-outer self-join below pushes isnotnull(vec_id)/isnotnull(cid)
      // into its BUILD side only, which would de-canonicalize the two
      // sides and re-run the assignment scan per side — stating the same
      // filters on the shared frame keeps both subtrees identical so
      // ReuseExchange fires (PlanAuditSpec pins this)
      .filter(col("vec_id").isNotNull && col("cid").isNotNull)
    val cos = dot(col("x.e"), col("y.e")) /
      (sqrt(dot(col("x.e"), col("x.e"))) * sqrt(dot(col("y.e"), col("y.e"))))
    // kept = "no earlier same-cluster member above SemTau", computed as
    // a grouped existence over ONE left-outer self-join — exactly two
    // consumers of `assigned`, so the plan evaluates the codebook probe
    // once and reuses its exchange (a semi-join + back-join variant
    // planned a third, column-pruned copy of the probe: the pruned
    // aggregate no longer canonicalized with the self-join sides' and
    // re-scanned the corpus — caught by PlanAuditSpec in development).
    // All rows of a vec_id share its cid partition, so the count
    // collapses map-side and only n narrow rows cross the final agg
    // exchange.
    assigned.as("x").join(assigned.as("y"),
        col("x.cid") === col("y.cid") && col("y.vec_id") < col("x.vec_id") &&
          cos >= SemTau, "left_outer")
      .groupBy(col("x.vec_id"), col("x.cid"))
      .agg(count(col("y.vec_id")).as("hits"))
      .select(col("vec_id"), col("cid"), (col("hits") === 0).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** Seed-codebook form: centroids are the vectors with vec_id in
    * [[[SemSeed]], SemSeed + k), k = max(8, ⌈n/[[SemClusterTarget]]⌉) —
    * the ivf/pq deterministic-sample convention (requires those ids to
    * exist; the test tables' vec_ids are contiguous from 0). The one
    * driver action (count) is a bounded scalar sizing the codebook.
    * Production passes a trained codebook to the 2-arg overload. */
  def semanticDedup(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val n = emb.count()
    val k = math.max(8L, (n + SemClusterTarget - 1) / SemClusterTarget)
    semanticDedup(embeddings, emb
      .filter(col("vec_id") >= SemSeed && col("vec_id") < SemSeed + k)
      .select(col("vec_id").as("cid"), col("e").as("ce")))
  }

  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(Tables(spark, dir, "embeddings"))

  val semanticDedupSql: String =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |raw AS (
       |  SELECT vec_id, e FROM base
       |  UNION ALL
       |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM base), e
       |  FROM base WHERE vec_id % $SemTwinMod = 0
       |  UNION ALL
       |  SELECT vec_id + 2 * (SELECT max(vec_id) + 1 FROM base),
       |    list_transform(generate_series(1, len(e)),
       |      i -> CASE WHEN i = 1 THEN e[i] * 0.75 ELSE e[i] END)
       |  FROM base WHERE vec_id % $SemTwinMod = 25),
       |c AS (SELECT vec_id AS cid, e AS ce, list_inner_product(e, e) AS cn
       |  FROM raw WHERE vec_id >= $SemSeed AND vec_id < $SemSeed +
       |    greatest(8, (SELECT (count(*) + ${SemClusterTarget - 1})
       |      // $SemClusterTarget FROM raw))),
       |a AS (SELECT vec_id, e, cid FROM (
       |  SELECT r.vec_id, r.e, c.cid,
       |    row_number() OVER (PARTITION BY r.vec_id
       |      ORDER BY c.cn - 2.0 * list_inner_product(r.e, c.ce), c.cid) AS rn
       |  FROM raw r, c) WHERE rn = 1),
       |d AS (SELECT DISTINCT x.vec_id FROM a x JOIN a y
       |  ON x.cid = y.cid AND y.vec_id < x.vec_id
       |  AND list_inner_product(x.e, y.e) /
       |    (sqrt(list_inner_product(x.e, x.e)) *
       |     sqrt(list_inner_product(y.e, y.e))) >= $SemTau)
       |SELECT a.vec_id, a.cid, d.vec_id IS NULL AS kept
       |FROM a LEFT JOIN d ON a.vec_id = d.vec_id
       |ORDER BY a.vec_id""".stripMargin

  // --------------------------------------------------------------- C13
  /** Near-dup cluster assignment: connected components over the
    * LSH-verified pair graph by iterative min-label propagation — the
    * standard large-scale CC algorithm (each round: label ← min(label,
    * neighbors' labels); rounds ≈ component diameter, which for dup
    * clusters is tiny). Output: every doc with its cluster id (the
    * smallest doc_id in its component) and whether it is the kept
    * canonical. The driver-side loop checks only a changed-count per
    * round — O(diameter) tiny actions, data never collected. */
  /** Above this many verified pairs the component computation stays
    * fully distributed (label propagation); at or below it the pair
    * graph is collected and solved with union-find on the driver — the
    * same size-gated tradeoff as Spark's broadcast-join threshold, and
    * safe for the same reason: the gate is on the DUP-PAIR mass (tiny on
    * real corpora — only verified near-dup pairs survive), never on the
    * corpus. 1M collected Rows of two boxed longs ≈ 100 MB of driver
    * heap (GenericRow overhead dominates the 16 bytes of payload — the
    * r3 4M limit underestimated that by ~6× and could OOM the driver
    * the gate exists to protect). */
  private val BroadcastPairLimit = 1000 * 1000

  /** The pair-graph label map `(doc_id, cluster_id)` — covers only
    * docs that appear in a verified near-dup pair (dup-graph-sized) —
    * plus whether the size gate proved it broadcast-small. Shared by
    * [[clusters]] and [[Pipeline.curateNearDup]]. `forceDistributed`
    * skips the probe entirely and takes the label-propagation scale
    * path unconditionally (the `dedup_clusters_dist` entry — the
    * 100 TB path exercised on gate-sized data). */
  private[operators] def labelMap(documents: DataFrame,
                                  forceDistributed: Boolean = false): (DataFrame, Boolean) = {
    val spark = documents.sparkSession
    // minhashLsh returns a localCheckpoint'd (already materialized)
    // frame, so re-reading it costs a block scan, not a lineage replay —
    // no extra cache needed. The size gate and the fast-path collect
    // collapse into ONE bounded action: limit(N+1) caps driver transfer
    // at the same ~100 MB the gate was sized for (CollectLimitExec stops
    // scanning once it has N+1 rows, so an over-limit graph ships only
    // the first N+1, never the whole thing), and a probe that comes back
    // ≤ N is by construction the COMPLETE pair set.
    val pairs = minhashLsh(documents).select(col("doc_a"), col("doc_b"))
    if (forceDistributed) (propagateComponents(spark, pairs), false)
    else {
      val probe = pairs.limit(BroadcastPairLimit + 1).collect()
      val small = probe.length <= BroadcastPairLimit
      val labels: DataFrame =
        if (small) broadcastComponents(spark, probe)
        else propagateComponents(spark, pairs)
      (labels, small)
    }
  }

  /** Library form: cluster assignment over any `(doc_id, text)` frame. */
  def clusters(documents: DataFrame, forceDistributed: Boolean = false): DataFrame = {
    val (labels, small) = labelMap(documents, forceDistributed)
    // every doc outside the pair graph is trivially its own canonical
    // singleton — a left join against the label map. The broadcast hint
    // is only attached when the size gate proved the map small; on the
    // scale path AQE decides (a forced broadcast of an unbounded side
    // is exactly the r1 scale-killer).
    val labelSide = if (small) broadcast(labels) else labels
    documents.select(col("doc_id"))
      .join(labelSide, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", (col("doc_id") === col("cluster_id")))
  }

  def clusters(spark: SparkSession, dir: String): DataFrame =
    clusters(docs(spark, dir))

  /** Fast path: union-find over the collected pair list (exact, one
    * job). Only reachable under [[BroadcastPairLimit]]. */
  private[operators] def broadcastComponents(spark: SparkSession, pairs: DataFrame): DataFrame =
    broadcastComponents(spark, pairs.collect())

  private[operators] def broadcastComponents(spark: SparkSession,
                                             collected: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    collected.foreach { row =>
      val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
      // record both endpoints (roots included — the label map must
      // cover every pair-graph vertex, not just the demoted ones)
      parent.getOrElseUpdate(ra, ra)
      parent.getOrElseUpdate(rb, rb)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // roots are unioned min-first, so find() is the min doc_id directly
    val rows = parent.keysIterator.map(v => (v, find(v))).toSeq
    import spark.implicits._
    rows.toDF("doc_id", "cluster_id")
  }

  /** Scale path: iterative min-label propagation over the pair graph
    * (each round: label ← min(label, neighbors' labels); rounds ≈
    * component diameter, tiny for dup clusters). Frames are
    * dup-graph-sized, so at 100 TB the cost tracks the duplicate mass,
    * not the corpus. */
  private[operators] def propagateComponents(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val edges = pairs
      .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .cache()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .cache()
    var cached = labels // the DataFrame whose plan is actually cached
    var changed = 1L
    // no round cap: rounds ≈ component diameter (tiny for dup
    // clusters), and a cap that exits with changed > 0 would silently
    // emit non-transitive cluster ids on a long chain
    while (changed > 0) {
      // min label over self ∪ neighbors in ONE aggregation: the self
      // branch carries the old label through the same groupBy (min over
      // the flagged branch), so a round is one join + one shuffle and
      // the changed-count needs no second join.
      val contrib = labels
        .select(col("doc_id"), col("cluster_id"), lit(true).as("self"))
        .unionAll(labels.join(edges, col("doc_id") === col("dst"))
          .select(col("src"), col("cluster_id"), lit(false)))
      val next = contrib.groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"),
          min(when(col("self"), col("cluster_id"))).as("old"))
        .cache()
      changed = next.filter(col("cluster_id") =!= col("old")).count()
      // unpersist the frame that was actually cached: from round 2 on,
      // `labels` is a Project over the cached aggregate, and
      // Project.unpersist would find no matching cache entry (leaking
      // one full label table per round on the scale path)
      cached.unpersist()
      cached = next
      labels = next.select(col("doc_id"), col("cluster_id"))
    }
    // materialize the converged labels outside the CacheManager so the
    // final round's cache can be released too (dup-graph-sized — the
    // same rows that were cached)
    val out = labels.localCheckpoint()
    cached.unpersist()
    edges.unpersist()
    out
  }

  /** The transitive-closure CTE list (recursive — must sit in a
    * `WITH RECURSIVE`): exact-Jaccard pair graph (equal to the LSH
    * graph at band recall 1) closed by `reach`. Shared with
    * [[Pipeline.curateNearDupSql]]. */
  private[operators] val clustersCtes: String =
    s"""sh AS ($shinglesSql),
       |g AS (SELECT doc_id, unnest(shingles) AS gram FROM sh),
       |sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM shared
       |  JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       |  WHERE c / (sa.n + sb.n - c) >= 0.8),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)""".stripMargin

  /** Oracle: transitive closure by recursive CTE over the exact-Jaccard
    * pair graph (equal to the LSH graph at band recall 1). */
  val clustersSql: String =
    s"""WITH RECURSIVE $clustersCtes
       |SELECT a AS doc_id, min(b) AS cluster_id,
       |       a = min(b) AS is_canonical
       |FROM reach GROUP BY a""".stripMargin

  // --------------------------------------------------------------- C23
  /** Span-level duplication coverage — the substring-dedup signal (cf.
    * the suffix-array substring dedup of Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", 2022): for each doc,
    * the fraction of token POSITIONS covered by at least one
    * `SpanTokens`-gram that also occurs in another document. Distinct
    * from pairwise Jaccard (which scores doc PAIRS): this localizes
    * duplication inside each doc, the number a filtering policy
    * thresholds ("drop docs >50% duplicated span mass") and the exact
    * declarative equivalent of the paper's suffix-array pass at span
    * granularity k.
    *
    * Plan, stage by stage (100 TB shape): positional k-gram explode
    * (corpus-token-sized map-side stream, the same mass any tokenizer
    * pass moves); per-gram distinct-doc count (two-phase aggregate on
    * gram — partial distinct map-side; per-gram key space, no hot
    * keys beyond genuinely viral spans); equi-join of doc-grams to the
    * df>1 gram set on gram (hash join — the duplicated-gram set is
    * near-dup-mass-sized, NOT assumed broadcastable); coverage union
    * via explode(pos..pos+k−1) + distinct — bounded by k × duplicated
    * positions, skew-bounded per doc by doc length. No driver
    * collection, no cartesian anywhere. Outputs are exact integers
    * plus one raw IEEE quotient.
    *
    * The groupBy/join key is the codegen'd `xxhash64` of the 8-token
    * gram, not the gram string (r12): 8-byte keys cross the two
    * exchanges instead of ~50-byte strings. The r11-verdict-suggested
    * cross-engine md5-prefix BIGINT key (the C26/C27 conv idiom, which
    * would have kept the oracle keyed on the identical hash) measured
    * a clean-machine 47.1s at sf3 vs the raw string's 32.5-36.9s —
    * md5+conv per token-scale row costs 1.4× MORE than the string
    * shuffle it saves; xxhash64 measured 28.6-30.8s (interleaved
    * solo-warm medians, idle machine). The oracle keys the raw gram,
    * so gate parity is exact unless a 64-bit xxhash collision merges
    * two distinct grams' df-counts (odds ~n²/2⁶⁵: ~10⁻⁹ at gate SFs;
    * a few hundred merged grams at a 10¹¹-gram corpus — noise for a
    * thresholded coverage signal, the same accepted-collision class as
    * C1's md5 keep-first and the minhash band keys). */
  private val SpanTokens = 8

  def spanCoverage(documents: DataFrame): DataFrame = {
    val n = SpanTokens
    val tk = documents.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = tk
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (n - 1)),
        // r19: hash the token SLICE directly — tokens are space-free
        // (split on ' '), so array equality ≡ the joined string's, and
        // the per-position string build (alloc + copy at corpus-token
        // scale) disappears from the map side
        i => struct(i.as("pos"),
          xxhash64(slice(col("toks"), i, lit(n))).as("gram")))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"),
        col("pg.gram").as("gram"))
    val dup = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") > 1)
      .select(col("gram"))
    val covered = grams.join(dup, "gram")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup"))
    documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup"))
      .select(col("doc_id"), col("n_tokens"),
        col("n_dup").as("n_dup_positions"),
        (col("n_dup") / col("n_tokens")).as("dup_coverage"))
  }

  def spanCoverage(spark: SparkSession, dir: String): DataFrame =
    spanCoverage(docs(spark, dir))

  // -------------------------------------------------------------- C23b
  /** Span REWRITE (r13 verdict slate #4) — the operator a curation
    * pipeline actually runs where C23 only scores: every occurrence of
    * a >1-doc 8-token span is DROPPED except the corpus-wide first
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better" — exact substring dedup at span granularity,
    * keep-first like C1/C1b). Returns the rewritten doc: `(doc_id,
    * n_tokens, n_dropped, kept_text)`.
    *
    * Position semantics (the overlap rule): a token position is
    * dropped iff it is covered by some NON-winner occurrence of a
    * duplicated gram AND NOT covered by any WINNER occurrence — the
    * winner-rescue keeps every kept span INTACT even when a distinct
    * duplicated span overlaps it from another alignment, so the spec
    * law holds: after rewrite each duplicated 8-gram appears exactly
    * once corpus-wide (DedupSpec plants and proves it; adversarial
    * all-alignments overlap could in principle let a loser fragment
    * survive inside two winners' rescue shadows — the same
    * maximal-match approximation Lee et al. accept by deduplicating
    * 50-token windows instead of all substrings).
    *
    * Scale shape (the C23/C1b argument): gram keys are codegen'd
    * xxhash64 8-byte longs (winner/dup selection needs determinism,
    * not cross-engine parity — the oracle re-derives winners from the
    * raw gram text, the C23 accepted-collision class); the winner
    * table is ONE map-side-combined groupBy on the gram key (a
    * boilerplate span with 10⁹ copies collapses per map task); the
    * join back is AQE-skew-splittable; coverage is bounded by 8 ×
    * duplicated occurrences; the final anti-join + reassembly group by
    * doc_id, bounded per doc by doc length. Corpus text crosses a
    * shuffle once (the reassembly), never twice. */
  def spanRewrite(documents: DataFrame, n: Int = SpanTokens): DataFrame = {
    val tk = documents.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = tk
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (n - 1)),
        // r19: hash the token slice directly (see spanCoverage) — the
        // same 64-bit-key equivalence classes without building a gram
        // string per position
        i => struct(i.as("pos"),
          xxhash64(slice(col("toks"), i, lit(n))).as("g")))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"),
        col("pg.g").as("g"))
    // per duplicated gram: the corpus-wide first occurrence
    val winners = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("ndocs"),
        min(struct(col("doc_id"), col("pos"))).as("w"))
      .filter(col("ndocs") > 1)
      .select(col("g"), col("w"))
    val occ = grams.join(winners, Seq("g"))
      .withColumn("is_w",
        col("doc_id") === col("w.doc_id") && col("pos") === col("w.pos"))
    def cover(d: DataFrame) = d
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    val winnerCover = cover(occ.filter(col("is_w")))
    val loserCover = cover(occ.filter(!col("is_w")))
    val dropPos = loserCover.join(winnerCover, Seq("doc_id", "p"), "left_anti")
    val toks = tk.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("p0", "tok")))
      .withColumn("p", col("p0") + 1)
    val kept = toks.join(dropPos, Seq("doc_id", "p"), "left_anti")
    tk.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(
        kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept_i"),
            concat_ws(" ", transform(
              sort_array(collect_list(struct(col("p"), col("tok")))),
              x => x.getField("tok"))).as("kept_text")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept_i"), lit(0L))).as("n_dropped"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Entry: counts + reassembly-md5 per doc (the C1b proof shape — the
    * gate checks the rewritten text without hauling it through). */
  def spanRewriteEntry(spark: SparkSession, dir: String): DataFrame =
    spanRewrite(docs(spark, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_dropped"),
        md5(col("kept_text")).as("kept_md5"))
      .orderBy(col("doc_id"))

  /** Oracle: identical algebra on the raw gram text — winners via
    * row_number over (doc_id, pos) like C1b, coverage via
    * generate_series, winner-rescue via EXCEPT, reassembly via
    * position-ordered string_agg. */
  val spanRewriteSql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+${SpanTokens - 1}], ' ') AS gram
       |      FROM tk, unnest(generate_series(1, len(toks) - ${SpanTokens - 1})) AS u(i)
       |      WHERE len(toks) >= $SpanTokens),
       |w AS (SELECT doc_id, pos,
       |        row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
       |        count(DISTINCT doc_id) OVER (PARTITION BY gram) AS nd
       |      FROM g),
       |occ AS (SELECT * FROM w WHERE nd > 1),
       |wc AS (SELECT DISTINCT doc_id, p
       |       FROM occ, unnest(generate_series(pos, pos + ${SpanTokens - 1})) AS pp(p)
       |       WHERE rn = 1),
       |lc AS (SELECT DISTINCT doc_id, p
       |       FROM occ, unnest(generate_series(pos, pos + ${SpanTokens - 1})) AS pp(p)
       |       WHERE rn > 1),
       |dp AS (SELECT doc_id, p FROM lc EXCEPT SELECT doc_id, p FROM wc),
       |t AS (SELECT doc_id, i AS p, toks[i] AS tok
       |      FROM tk, unnest(generate_series(1, len(toks))) AS u(i)),
       |kept AS (SELECT t.doc_id, t.p, t.tok
       |         FROM t LEFT JOIN dp ON t.doc_id = dp.doc_id AND t.p = dp.p
       |         WHERE dp.doc_id IS NULL)
       |SELECT tk.doc_id,
       |  CAST(len(tk.toks) AS BIGINT) AS n_tokens,
       |  CAST(len(tk.toks) - count(kept.p) AS BIGINT) AS n_dropped,
       |  md5(coalesce(string_agg(kept.tok, ' ' ORDER BY kept.p), '')) AS kept_md5
       |FROM tk LEFT JOIN kept ON tk.doc_id = kept.doc_id
       |GROUP BY tk.doc_id, len(tk.toks)
       |ORDER BY tk.doc_id""".stripMargin

  val spanCoverageSql: String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+${SpanTokens - 1}], ' ') AS gram
       |      FROM tk, unnest(generate_series(1, len(toks) - ${SpanTokens - 1})) AS u(i)
       |      WHERE len(toks) >= $SpanTokens),
       |df AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
       |cov AS (SELECT DISTINCT g.doc_id, p.p
       |        FROM g JOIN df USING (gram), unnest(generate_series(g.pos, g.pos + ${SpanTokens - 1})) AS p(p)),
       |n AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
       |SELECT n.doc_id AS doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
       |  COALESCE(c.n_dup, 0) AS n_dup_positions,
       |  COALESCE(c.n_dup, 0) / CAST(n.n_tokens AS BIGINT) AS dup_coverage
       |FROM n LEFT JOIN (SELECT doc_id, count(*) AS n_dup FROM cov GROUP BY 1) c
       |  ON n.doc_id = c.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_span_coverage" -> (spanCoverage(_, _)),
    "dedup_span_rewrite" -> (spanRewriteEntry(_, _)),
    "dedup_clusters" -> clusters _,
    // same data, same oracle, but forced through the distributed
    // min-label-propagation path — the 100 TB path gets its own
    // correctness row instead of living only behind the size gate
    "dedup_clusters_dist" ->
      ((s: SparkSession, d: String) => clusters(docs(s, d), forceDistributed = true)),
    "dedup_exact" -> exact _,
    "dedup_exact_paragraph" -> exactParagraphs _,
    "dedup_ngram_jaccard" -> ngramJaccard _,
    // the PPJoin variant at 0.8 is output-identical to the exact-verified
    // LSH (lemma-exact), so it shares C2's oracle — a deterministic
    // exact-recall alternative to probabilistic banding. 0.8 is also the
    // right bench regime: at t the prefix is n − ⌈t·n⌉ + 1 grams, so a
    // LOW threshold on a near-dup-dense corpus (this fixture) degenerates
    // toward the all-pairs mass the filter exists to avoid — prefix
    // filtering earns its keep at high thresholds or on boilerplate-
    // dominant corpora (its scaladoc regime discussion).
    "dedup_ngram_prefix" ->
      ((s: SparkSession, d: String) => ngramJaccardPrefix(docs(s, d), 0.8)),
    // the production API: probe-then-dispatch between the two exact
    // regimes. Output-identical to whichever plan it picks (both are
    // exact at the same threshold), so it shares the t=0.8 oracle —
    // this row proves the probe+dispatch COMPOSITION under the driver
    // gate, not just its two component plans
    "dedup_ngram_auto" ->
      ((s: SparkSession, d: String) => ngramJaccardAuto(docs(s, d), 0.8)),
    // asymmetric containment (C4d): planted truncated-copy fixture in
    // the entry layer — the near-SUBSET pair class Jaccard misses
    "dedup_ngram_containment" -> (ngramContainment(_, _)),
    "dedup_minhash_lsh" -> minhashLsh _,
    "dedup_simhash" -> simhash _,
    "dedup_simhash_pairs" -> simhashPairs _,
    // the driver entry is the PLANTED composition (fixture in the entry
    // layer, operator pure) — the oracle applies the same UNION ALL, so
    // the gate stays non-vacuous without the operator fabricating rows
    "dedup_embedding" ->
      ((s: SparkSession, d: String) =>
        embeddingDedup(plantTwins(Tables(s, d, "embeddings")))),
    // SemDeDup (C48): planted composition like dedup_embedding — exact
    // twins guarantee within-cluster drops, so the gate is non-vacuous
    "dedup_semantic" ->
      ((s: SparkSession, d: String) =>
        semanticDedup(plantSemTwins(Tables(s, d, "embeddings")))))

  val oracles: Map[String, String] = Map(
    "dedup_span_coverage" -> spanCoverageSql,
    "dedup_span_rewrite" -> spanRewriteSql,
    "dedup_clusters" -> clustersSql,
    "dedup_clusters_dist" -> clustersSql,
    "dedup_exact" -> exactSql,
    "dedup_exact_paragraph" -> exactParagraphsSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_ngram_prefix" -> minhashLshSql,
    "dedup_ngram_auto" -> minhashLshSql,
    "dedup_ngram_containment" -> ngramContainmentSql,
    "dedup_minhash_lsh" -> minhashLshSql,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" -> simhashPairsSql,
    "dedup_embedding" -> embeddingDedupSql,
    "dedup_semantic" -> semanticDedupSql)
}
