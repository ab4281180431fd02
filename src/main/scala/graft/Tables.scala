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
