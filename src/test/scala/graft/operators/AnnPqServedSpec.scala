package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C58e served IVF-PQ — the FAISS-on-disk shape. Pins (1) served ≡ the
  * in-memory C18 build row-for-row, (2) the written index carries PQ
  * codes ONLY (no raw vectors on disk, so the pruned scan reads ~M
  * bytes/vector), (3) the probe predicate prunes list directories on
  * the REAL reader (numFiles metric, the AnnServedSpec method), and
  * (4) the raw-vector rerank fetch is bounded: its join emits at most
  * queries × shortlist rows (the second scan never degenerates into a
  * corpus rescan). */
class AnnPqServedSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p.collect {
    case s: FileSourceScanExec => Seq(s)
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scans(q.plan)
  }.flatten

  private def bhjs(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[BroadcastHashJoinExec] = p.collect {
    case j: BroadcastHashJoinExec => Seq(j)
    case a: AdaptiveSparkPlanExec => bhjs(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      bhjs(q.plan)
  }.flatten

  test("served results are identical to the in-memory IVF-PQ build") {
    val mem = Ann.ivfPq(spark, dir).collect().map(_.toSeq)
    val served = Ann.queries("ann_ivfpq_served")(spark, dir)
      .collect().map(_.toSeq)
    assert(served.length === mem.length)
    assert(served.toSeq === mem.toSeq)
  }

  test("the written index holds codes only, prunes lists, and bounds the rerank fetch") {
    val c = Ann.corpus(spark, dir)
    val cents = Ann.ivfCents(c)
    val out = graft.Scratch.dir("ivfpq_spec")
    try {
      Ann.ivfPqIndexWrite(c, cents, out)
      // (2) codes only: the on-disk schema must NOT carry the vectors
      val onDisk = spark.read.parquet(out)
      assert(onDisk.schema.fieldNames.toSet === Set("vec_id", "codes", "cid"),
        s"index must store codes, not vectors: ${onDisk.schema.fieldNames.toSeq}")
      val listDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
      def filesUnder(d: java.io.File): Int =
        d.listFiles().count(_.getName.endsWith(".parquet"))
      val totalFiles = listDirs.map(filesUnder).sum
      // one query → nprobe=2 of the 8 lists
      val probes = Ann.ivfProbes(c, cents)
        .filter(col("q_id") === 0L).select(col("q_id"), col("cid"))
      // the full ADC table from the production builder; the probe
      // frame restricts the serve to q_id 0 through the join
      val served = Ann.ivfPqServeFrom(spark, out, c, probes,
        Ann.pqDtab(c, Ann.pqCodebooks(c)))
      served.collect()
      val probedCids = probes.select("cid").distinct()
        .collect().map(_.getLong(0)).toSet
      val expectedFiles = listDirs
        .filter(d => probedCids.contains(d.getName.stripPrefix("cid=").toLong))
        .map(filesUnder).sum
      assert(expectedFiles < totalFiles, "fixture must actually skip")
      // (3) the code scan opens only the probed list directories
      val idxScan = scans(served.queryExecution.executedPlan)
        .find(_.metadata.get("Location").exists(_.contains(out)))
        .getOrElse(fail("no index scan in the served plan"))
      assert(idxScan.metadata("PartitionFilters").contains("cid"),
        s"probe predicate must be a partition filter: ${idxScan.metadata}")
      assert(idxScan.metrics("numFiles").value === expectedFiles,
        s"reader opened ${idxScan.metrics("numFiles").value} files; " +
          s"probed lists hold $expectedFiles (of $totalFiles)")
      // (4) the raw-vector fetch is shortlist-bounded: the rerank join
      // (the only join keyed on vec_id alone) emits ≤ queries × k′
      val rerank = bhjs(served.queryExecution.executedPlan)
        .filter(j => j.leftKeys.forall(_.references.map(_.name)
          .forall(_ == "vec_id")) && j.leftKeys.nonEmpty)
      assert(rerank.nonEmpty, "no vec_id-keyed rerank join in the plan")
      val fetched = rerank.map(_.metrics("numOutputRows").value).max
      val bound = 1L * Ann.PqShortlist // one query in this fixture
      assert(fetched <= bound,
        s"rerank fetched $fetched rows; the shortlist bounds it at $bound")
    } finally graft.Scratch.delete(out)
  }
}
