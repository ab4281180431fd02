package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders. One parquet file per table under a scale-factor dir
  * (see TESTDATA.md). At cluster scale these would be partitioned
  * directories; the API is identical (`spark.read.parquet` on a dir).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Scratch-dir discipline for entries that WRITE as part of their
  * semantics (C42b's z-ordered rewrite, the served ANN index): a fresh
  * per-invocation dir (two concurrent driver sweeps must not overwrite
  * each other between write and read-back) that the entry DELETES once
  * its bounded result is materialized — repeated verify/bench sweeps
  * would otherwise accumulate unbounded disk under java.io.tmpdir. */
object Scratch {
  def dir(prefix: String): String =
    sys.props("java.io.tmpdir") + s"/graft_${prefix}_${System.nanoTime()}"

  def delete(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    val root = new java.io.File(path)
    rm(root)
    // a held/locked file silently reverts this helper to the unbounded
    // tmp-dir accumulation it exists to prevent — make leakage visible
    // to verify/bench logs so sweep tooling notices
    if (root.exists())
      System.err.println(s"[graft.Scratch] LEAKED scratch dir (delete failed): $path")
  }
}
