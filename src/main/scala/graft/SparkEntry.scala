package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Ann, ArrowOps, AsofJoin, Dedup, Events, Functions, Graph, Layout, Multimodal, Olap, Pipeline, Sketch, Text}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query here;
  * where the semantics are ANSI-SQL-expressible, a DuckDB oracle query
  * with identically-named output columns is registered alongside.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Olap.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Olap.queries ++ Text.queries ++ Dedup.queries ++ Ann.queries ++
      Functions.queries ++ ArrowOps.queries ++ Streams.queries ++
      Multimodal.queries ++ Pipeline.queries ++ AsofJoin.queries ++
      Sketch.queries ++ Layout.queries ++ Events.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Olap.oracles ++ Text.oracles ++ Dedup.oracles ++ Ann.oracles ++
      Functions.oracles ++ ArrowOps.oracles ++ Streams.oracles ++
      Multimodal.oracles ++ Pipeline.oracles ++ AsofJoin.oracles ++
      Sketch.oracles ++ Layout.oracles ++ Events.oracles ++ Graph.oracles
}
