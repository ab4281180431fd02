package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C14 pipeline specs: the curated corpus is consistent between its
  * stats, row, and materialized forms. */
class PipelineSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  test("kept docs reconcile with the per-source stats") {
    val kept = Pipeline.keptDocs(spark, dir)
    val stats = Pipeline.curate(spark, dir)
    val totalFromStats = stats.agg(sum(col("n_docs"))).head.getLong(0)
    assert(kept.count() === totalFromStats)
    assert(kept.select("doc_id").distinct().count() === kept.count(), "no dup doc ids")
  }

  test("materialize writes a source-partitioned parquet corpus with text") {
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString + "/corpus"
    Pipeline.materialize(spark, dir, out)
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("source=")),
      "hive-style source partitions expected")
    val back = spark.read.parquet(out)
    val kept = Pipeline.kept(spark, dir)
    assert(back.count() === kept.count())
    assert(back.filter(col("text").isNull).count() === 0)
    assert(back.select("doc_id").exceptAll(kept.select("doc_id")).count() === 0)
  }
}
