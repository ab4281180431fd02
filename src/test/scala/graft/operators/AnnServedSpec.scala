package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C58 served IVF: the build-once/serve-many split. Pins (1) served ≡
  * the in-memory C15 build row-for-row (the entry additionally runs
  * under C15's algorithm-parity oracle), and (2) the REAL file skip —
  * a probe batch touching 2 of the 8 inverted lists must make Spark's
  * parquet reader open exactly the files under those 2 list
  * directories (the LayoutSpec real-reader method: the scan's numFiles
  * metric, not a stats simulation). */
class AnnServedSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("served results are identical to the in-memory IVF build") {
    val mem = Ann.ivf(spark, dir).collect().map(_.toSeq)
    val served = Ann.queries("ann_ivf_served")(spark, dir)
      .collect().map(_.toSeq)
    assert(served.length === mem.length)
    assert(served.toSeq === mem.toSeq)
  }

  test("the probe scan reads ONLY the probed list directories (real reader metric)") {
    val c = Ann.corpus(spark, dir)
    val out = graft.Scratch.dir("ivf_served_spec")
    try {
      Ann.ivfIndexWrite(c, out)
      val listDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
      assert(listDirs.length === 8, "fixture: 8 inverted lists")
      def filesUnder(d: java.io.File): Int =
        d.listFiles().count(_.getName.endsWith(".parquet"))
      val totalFiles = listDirs.map(filesUnder).sum
      // one query → nprobe=2 of 8 lists
      val probes = Ann.ivfProbes(c, Ann.ivfCents(c))
        .filter(col("q_id") === 0L)
      val served = Ann.ivfServeFrom(spark, out, probes)
      served.collect()
      val probedCids = probes.select("cid").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(probedCids.size === 2, "fixture: 2 probed lists")
      val expectedFiles = listDirs
        .filter(d => probedCids.contains(d.getName.stripPrefix("cid=").toLong))
        .map(filesUnder).sum
      assert(expectedFiles < totalFiles,
        "fixture must actually skip (probed lists ⊂ all lists)")
      // the adaptive plan nests materialized stages — recurse through
      // them to reach the index scan
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
      }.flatten
      val scan = scans(served.queryExecution.executedPlan).headOption
        .getOrElse(fail("no FileSourceScanExec in the served plan"))
      assert(scan.metadata("PartitionFilters").contains("cid"),
        s"the probe predicate must be a partition filter: ${scan.metadata}")
      val scanned = scan.metrics("numFiles").value
      assert(scanned === expectedFiles,
        s"reader opened $scanned files; the probed lists hold " +
          s"$expectedFiles (of $totalFiles) — partition pruning failed")
    } finally graft.Scratch.delete(out)
  }

  test("serve-many: a later batch's scan opens ZERO files outside its own probed dirs (C58c)") {
    val c = Ann.corpus(spark, dir)
    val cents = Ann.ivfCents(c)
    val out = graft.Scratch.dir("ivf_many_spec")
    try {
      Ann.ivfIndexWrite(c, out) // build ONCE
      // batch 0 is served first — the same files must then answer a
      // DISTINCT later batch with its own (and only its own) pruning
      Ann.ivfServeFrom(spark, out,
        Ann.ivfProbesRange(c, cents, 0L, 5L)).collect()
      // a narrow later batch (2 queries) so its probed set is a strict
      // subset of the 8 lists even when queries disagree on lists
      val probes2 = Ann.ivfProbesRange(c, cents, 5L, 7L)
      val served2 = Ann.ivfServeFrom(spark, out, probes2)
      served2.collect()
      val probedCids = probes2.select("cid").distinct()
        .collect().map(_.getLong(0)).toSet
      val listDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
      def filesUnder(d: java.io.File): Int =
        d.listFiles().count(_.getName.endsWith(".parquet"))
      val totalFiles = listDirs.map(filesUnder).sum
      val expectedFiles = listDirs
        .filter(d => probedCids.contains(d.getName.stripPrefix("cid=").toLong))
        .map(filesUnder).sum
      assert(expectedFiles < totalFiles,
        "fixture must skip: batch 2's probed lists ⊂ all lists")
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
      }.flatten
      val scan = scans(served2.queryExecution.executedPlan).headOption
        .getOrElse(fail("no FileSourceScanExec in the served plan"))
      val scanned = scan.metrics("numFiles").value
      assert(scanned === expectedFiles,
        s"batch 2 opened $scanned files; its own probed lists hold " +
          s"$expectedFiles (of $totalFiles) — a later batch must not " +
          "pay for any other batch's lists")
    } finally graft.Scratch.delete(out)
  }

  test("append grows ONLY delta-assigned lists; served-after-append ≡ in-memory on the union (C58d)") {
    val c = Ann.corpus(spark, dir)
    val cents = Ann.ivfCents(c)
    val base = c.filter(col("vec_id") % 4 =!= 3)
    val delta = c.filter(col("vec_id") % 4 === 3)
    val out = graft.Scratch.dir("ivf_append_spec")
    def filesPerCid(): Map[Long, Set[String]] =
      new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
        .map { d =>
          d.getName.stripPrefix("cid=").toLong ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
        }.toMap
    try {
      Ann.ivfIndexWriteWith(base, cents, out) // day-0 build
      val before = filesPerCid()
      Ann.ivfIndexWriteWith(delta, cents, out, "append")
      val after = filesPerCid()
      val deltaCids = Ann.ivfAssign(delta, cents)
        .select("cid").distinct().collect().map(_.getLong(0)).toSet
      // every pre-existing file survives untouched (no list rewritten)
      before.foreach { case (cid, files) =>
        assert(files.subsetOf(after(cid)),
          s"append must never rewrite list $cid")
      }
      // growth (new files / new dirs) lands under delta-assigned lists ONLY
      val grown = after.keySet.filter(cid =>
        after(cid) != before.getOrElse(cid, Set.empty[String]))
      assert(grown === deltaCids,
        s"files grew under $grown; the delta touches exactly $deltaCids")
      // the maintained index serves the same rows as an in-memory
      // build over the unioned corpus (append ≡ rebuild)
      val served = Ann.ivfServeFrom(spark, out, Ann.ivfProbes(c, cents))
        .collect().map(_.toSeq)
      val mem = Ann.ivf(spark, dir).collect().map(_.toSeq)
      assert(served.toSeq === mem.toSeq)
    } finally graft.Scratch.delete(out)
  }

  test("served-filtered results are identical to the in-memory filtered build (C58b)") {
    val mem = Ann.ivfFiltered(spark, dir).collect().map(_.toSeq)
    val served = Ann.queries("ann_ivf_served_filtered")(spark, dir)
      .collect().map(_.toSeq)
    assert(served.length === mem.length)
    assert(served.toSeq === mem.toSeq)
  }

  test("the filtered serve opens ONLY probed cid=X/label=Y directories (two-level skip)") {
    val cl = Ann.ivfLabeledCorpus(graft.Tables(spark, dir, "embeddings"))
    val out = graft.Scratch.dir("ivf_flt_spec")
    try {
      Ann.ivfFilteredIndexWrite(cl, out)
      def parquets(d: java.io.File): Seq[java.io.File] = {
        val kids = Option(d.listFiles()).getOrElse(Array.empty)
        kids.filter(_.isDirectory).flatMap(parquets).toSeq ++
          kids.filter(_.getName.endsWith(".parquet")).toSeq
      }
      val totalFiles = parquets(new java.io.File(out)).size
      // one query → 4 probed lists, ONE label → ≤ 4 leaf dirs of the
      // full cid × label grid
      val probes = Ann.ivfLabeledProbes(cl).filter(col("q_id") === 0L)
      val served = Ann.ivfServeFilteredFrom(spark, out, probes)
      served.collect()
      val pairs = probes.select(col("cid"), col("qlabel")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expectedFiles = pairs.toSeq.map { case (c, l) =>
        parquets(new java.io.File(s"$out/cid=$c/label=$l")).size
      }.sum
      assert(expectedFiles > 0 && expectedFiles * 4 <= totalFiles,
        s"fixture must skip hard: $expectedFiles of $totalFiles files")
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
      }.flatten
      val scan = scans(served.queryExecution.executedPlan).headOption
        .getOrElse(fail("no FileSourceScanExec in the served plan"))
      assert(scan.metadata("PartitionFilters").contains("label"),
        s"the label predicate must prune partitions: ${scan.metadata}")
      val scanned = scan.metrics("numFiles").value
      assert(scanned === expectedFiles,
        s"reader opened $scanned files; the probed (list, label) dirs " +
          s"hold $expectedFiles (of $totalFiles) — two-level pruning failed")
    } finally graft.Scratch.delete(out)
  }
}
