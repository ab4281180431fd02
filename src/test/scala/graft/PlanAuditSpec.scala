package graft

import org.apache.spark.sql.functions._

/** Blanket plan audit over EVERY registered entry: nothing may plan a
  * cartesian product or a broadcast-nested-loop join — the two shapes
  * that silently turn into O(N²) work at scale. The ann_* entries are
  * exempt BY DESIGN: they broadcast the tiny fixed query set across the
  * corpus (queries × corpus scoring is their semantics, bounded by
  * |queries|, and TopKAgg keeps the shuffle at queries×k×partitions).
  *
  * Entries that eagerly materialize (localCheckpoint / streaming
  * sinks) have already executed their interesting plan by the time the
  * frame returns; their O(N²)-freedom is asserted by their own specs
  * (DedupSpec "no cartesian" tests) — this audit still covers their
  * final composition plus every lazy entry.
  */
class PlanAuditSpec extends SparkSpec {
  private val dir = sf("sf0.001")
  private val exempt = Set("ann_bruteforce", "ann_lsh", "ann_ivf", "ann_pq",
    "ann_ivfpq", "ann_ivfpq_residual", "ann_ivfpq_perlist", "ann_recall_curve",
    "ann_mips_ivf", "ann_graph_beam", "ann_graph_nndescent",
    "ann_ivf_filtered")

  test("no entry plans a cartesian product or nested-loop join") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!exempt(name)) {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"),
          s"$name plans a cartesian product:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a broadcast nested-loop join:\n$p")
      }
    }
  }

  test("ann entries never shuffle a join: every join side is broadcast") {
    // the exemption above is from the BNLJ/cartesian sweep (broadcast
    // query-cross-corpus IS their semantics); what they must still
    // never do is SHUFFLE-join the corpus — a SortMergeJoin anywhere
    // in an ANN plan means a fact-scale exchange that the broadcast
    // design exists to avoid, and a CartesianProduct means a
    // non-broadcast cross (both sides fact-scale)
    // ann_graph_beam/_nndescent are carved out of the SMJ sweep: the
    // kNN-graph BUILD is a blocked corpus×corpus EQUI self-join on
    // (cid, gb) — at scale that join legitimately shuffles (Σ|block|²
    // is the design, not an accident) — and the NN-descent candidate
    // and embedding-lookup joins are corpus-linear shuffles by the
    // same design; their own tests below pin the rest
    exempt.toSeq.sorted
      .filterNot(n => n == "ann_graph_beam" || n == "ann_graph_nndescent")
      .foreach { name =>
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin"), s"$name shuffle-joins:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("ann_graph_beam: no cartesian; search-side joins broadcast; only the build self-join may shuffle") {
    val p = SparkEntry.queries("ann_graph_beam")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"graph_beam cartesian:\n$p")
    // every SortMergeJoin (if the optimizer picks one over
    // shuffled-hash) must be the blocked build join keyed on (cid, gb)
    // — never a frontier or embedding-lookup join, which the operator
    // broadcasts explicitly
    val smjKeys = "SortMergeJoin \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(smjKeys.forall(k => k.contains("cid") && k.contains("gb")),
      s"a non-build join shuffled (keys: $smjKeys):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"search-side joins must broadcast:\n$p")
  }

  test("ann_graph_nndescent: no cartesian; round shuffles only candidate/lookup keys; search broadcasts") {
    // the entry checkpoints its build (the blanket-audit note on
    // eager entries applies), so the final plan is the search
    // composition — audit it, plus the LAZY round shape on a
    // synthetic state frame
    val p = SparkEntry.queries("ann_graph_nndescent")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"nndescent cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"search-side joins must broadcast:\n$p")
    val e = spark.range(0, 64).selectExpr("id AS vec_id",
      "(id * 7) % 64 AS nbr", "CAST(id AS DOUBLE) / 64 AS cos")
      .filter(col("vec_id") =!= col("nbr"))
    val emb = spark.range(0, 64).selectExpr("id AS vec_id",
      "array(CAST(id AS DOUBLE), 1.0d) AS e")
    val rp = graft.operators.Ann.nndRound(e, emb)
      .queryExecution.executedPlan.toString
    assert(!rp.contains("CartesianProduct") &&
      !rp.contains("BroadcastNestedLoopJoin"),
      s"nn-descent round plans an O(N²) join:\n$rp")
    // every join in the round is keyed on vec_id/nbr — the candidate
    // local join and the two embedding lookups; nothing else may join
    val keys = "(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[([^\\]]*)\\]".r
      .findAllMatchIn(rp).map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(k =>
      k.contains("vec_id") || k.contains("nbr")),
      s"a round join is off-key (keys: $keys):\n$rp")
  }

  test("distributed-pagerank superstep plans no single-partition stage and no O(N²) join") {
    // the C55 loop's per-round work is the superstep join + the
    // per-destination sum; audit the lazy round shape the way the
    // nn-descent round is audited (the entry itself executes eagerly).
    // A SinglePartition anywhere in the superstep means the iteration
    // serializes on one task at every round — T times the cost of the
    // C52 scale-killer the r15 verdict flagged
    val edges = spark.range(0, 512).selectExpr("id % 37 AS u",
      "(id * 11) % 37 AS v", "1 + id % 5 AS w")
      .filter(col("u") =!= col("v"))
    val (rank, _) = graft.operators.Graph.kleeneDist(edges)
    val p = rank.queryExecution.executedPlan.toString
    // the returned frame is the checkpointed fixed point — audit the
    // superstep by rebuilding one round lazily over it
    val tw = edges.groupBy(col("u").as("node"))
      .agg(sum(col("w")).as("tw"))
    val ew = edges.join(tw, edges("u") === tw("node"))
      .select(col("u"), col("v"), col("w"), col("tw"))
    // the audited round expression is built from Graph's OWN constants
    // so it cannot drift from the production superstep
    val (tele, damp, scale) = (graft.operators.Graph.PrcTeleport,
      graft.operators.Graph.PrcDamp, graft.operators.Graph.PrcScale)
    val round = ew.join(rank, ew("u") === rank("node"))
      .groupBy(col("v").as("node"))
      .agg(expr(s"$tele + ($damp * sum((r * w) div tw)) div $scale").as("r"))
    val rp = round.queryExecution.executedPlan.toString
    for ((nm, pl) <- Seq(("fixed point", p), ("superstep", rp))) {
      assert(!pl.contains("SinglePartition"),
        s"$nm plans a single-partition stage:\n$pl")
      assert(!pl.contains("CartesianProduct") &&
        !pl.contains("BroadcastNestedLoopJoin"),
        s"$nm plans an O(N²) join:\n$pl")
    }
  }

  test("dedup_semantic: projection-only assignment, self-join reuses one exchange") {
    val df = SparkEntry.queries("dedup_semantic")(spark, dir)
    df.collect() // finalize the adaptive plan so ReuseExchange is visible
    // audit only what actually ran (the adaptive plan string appends
    // the pre-AQE "Initial Plan")
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), s"dedup_semantic cartesian:\n$p")
    // assignment is the NearestCentroid projection — any join-shaped
    // assignment (the 324s-at-sf10 broadcast-probe + struct-min
    // SortAggregate draft) shows up as a BNLJ here
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"dedup_semantic assignment must be a projection:\n$p")
    assert(p.contains("graft_nearest_centroid"),
      s"dedup_semantic must assign via the codegen kernel:\n$p")
    // the self-join must be hash-based: at gate scale the build side
    // broadcasts (the assignment is recomputed per side — a cheap
    // scan+kernel projection now that no aggregate sits between scan
    // and join); at shuffle scale the two identical sides reuse one
    // cid exchange (the explicit null guards keep them canonical)
    assert(p.contains("BroadcastHashJoin") || p.contains("ReusedExchange"),
      s"dedup_semantic self-join must broadcast or reuse one exchange:\n$p")
  }

  test("text_pii plans zero exchanges (pure per-row projection)") {
    // the PII scan is a map-only compliance pass — a single Exchange
    // anywhere means something (a repartition, an accidental
    // aggregate) broke the embarrassingly-parallel contract that
    // makes it free at 100 TB
    val p = SparkEntry.queries("text_pii")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"text_pii shuffles:\n$p")
  }

  test("text_rarity's token-frequency join keeps the doc side un-sorted") {
    // pass-1 (tok, count) is vocabulary-bounded; at sf0.001 the stats
    // make it broadcast directly, and at any scale AQE does the same
    // conversion post-aggregate — the doc-token explode must never be
    // the sorted side of a merge join (a corpus-scale sort)
    val p = SparkEntry.queries("text_rarity")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), s"text_rarity merge-joins:\n$p")
  }

  test("chunk_overlap plans zero exchanges (pure per-row map)") {
    // chunk ids, slices, and the md5 chain are all computed inside the
    // row via transform/sequence — an Exchange anywhere means the
    // chunker stopped being the free map-only pass it is at 100 TB
    val p = SparkEntry.queries("pipeline_chunk_overlap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunk_overlap shuffles:\n$p")
  }

  test("dsir scoring pass is shuffle-free (models ride as literals)") {
    // the bucket-count models are collected (bounded, ≤4096 rows) and
    // re-broadcast as literal arrays during construction; the RETURNED
    // scoring frame must then be a pure per-row fold — an Exchange in
    // it means the model went back through a join and the two-pass
    // zero-corpus-shuffle design regressed
    val p = SparkEntry.queries("pipeline_dsir_weights")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"dsir scoring shuffles:\n$p")
  }

  test("skyline joins only against the broadcast bucket frame") {
    // skyline2d's grid prune joins the corpus points to the ≤~1001-row
    // bucket-minimum frame, which is explicitly broadcast — a
    // SortMergeJoin would mean the corpus got sorted against a frame
    // three orders of magnitude smaller (and the blanket sweep above
    // already proves it never degenerates to the O(n²) cartesian)
    val p = SparkEntry.queries("pipeline_pareto_skyline")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), s"skyline shuffle-joins:\n$p")
  }

  test("quality_train θ-argmin plans no single-partition stage") {
    // the exact threshold search runs over thetaCandidates'
    // histogram+refine frame: cross-bucket prefixes ride as a
    // broadcast literal and the within-bucket cumulative window is
    // PARTITIONED by bucket — a SinglePartition Window/Sort here is
    // the one task every other score waits on at 100× train-set
    // scale (the C39 no-SinglePartition precedent)
    val ts = spark.range(0, 512).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0, 1L).otherwise(-1L).as("y"),
      ((col("id") * 37) % 101).cast("long").as("s"))
    val p = graft.operators.Pipeline.thetaCandidates(ts)
      .orderBy(col("err"), col("th")).limit(1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"θ-argmin plans a single-partition stage:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"θ-argmin plans an O(N²) join:\n$p")
  }

  test("whitelisted SinglePartition windows run over bounded aggregated frames") {
    // The no-SinglePartition audits above (C52 θ-argmin, C55
    // superstep) treat a global window as a scale-killer. Exactly two
    // entries DO plan one: pipeline_shard_balance (a prefix sum over
    // the n_tok histogram) and pipeline_pareto_skyline (a running min
    // over the per-bucket minima). They are whitelisted HERE with the
    // row bound ASSERTED, not silently exempted — both windows consume
    // an already-aggregated frame that stays bounded at any corpus SF.
    val docs = Tables(spark, dir, "documents")
    val corpus = docs.count()
    // shardBalance: input = the DISTINCT token-length histogram; rows
    // = distinct lengths « corpus (the shardBalance scaladoc documents
    // the (n_tok, doc_id-bucket) sub-key escape hatch should one
    // length class ever dominate the histogram)
    val hist = docs
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .distinct().count()
    assert(hist <= 1024 && hist <= corpus,
      s"shard-balance window input must stay bounded, got $hist rows")
    // skyline2d: input = one row per SkyBucket-wide quality bucket;
    // quality_micro ≤ 10⁶ by construction ⇒ ≤ 1001 rows at ANY SF
    val buckets = graft.operators.Pipeline
      .paretoSkylinePoints(docs)
      .select((col("quality_micro") / lit(graft.operators.Pipeline.SkyBucket))
        .cast("long").as("b"))
      .distinct().count()
    assert(buckets <= 1001,
      s"skyline bucket window input must stay ≤ 1001 rows, got $buckets")
  }

  test("q7's rank filter plans a partial top-k below the shuffle (WindowGroupLimit)") {
    // the rn<=3 predicate must sit directly above the rank Window so
    // InferWindowGroupLimit fires — measured 3.7x at sf1; at cluster
    // scale it is the difference between shuffling 3 rows per key per
    // map partition and shuffling the whole fact table
    val p = SparkEntry.queries("q7_window_rank")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"q7 lost its WindowGroupLimit:\n$p")
  }
}
