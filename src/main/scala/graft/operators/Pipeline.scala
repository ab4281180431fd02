package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** End-to-end training-data curation (the composition the individual
  * C-ops exist for): language gate → quality threshold → exact dedup →
  * per-source corpus stats. One declarative plan — Catalyst fuses the
  * feature projections, and the only shuffles are the dedup hash
  * groupBy and the final stats groupBy. (The near-dup stage would chain
  * [[Dedup.clusters]]' `is_canonical` the same way; kept out of this
  * entry so the oracle stays non-recursive.)
  *
  * avg_quality sums the 6-dp quality scores in DECIMAL so the mean is
  * independent of partial-aggregation order — same discipline as the
  * OLAP money columns. The mean itself is left as the raw double
  * quotient (exact-decimal numerator ÷ exact count): a final
  * `round(…, 6)` of a double is NOT cross-engine-stable — Spark rounds
  * the exact binary expansion (BigDecimal HALF_UP) while DuckDB rounds
  * via scaled float math, and r2's correctness gate caught them
  * disagreeing on one source's mean. The quotient of two
  * identically-derived doubles is bit-identical by IEEE 754. */
object Pipeline {

  private val QualityFloor = 0.5

  /** The surviving documents after every gate — the pipeline's actual
    * output corpus (what a training run reads); [[curate]] aggregates
    * it into per-source stats. */
  def kept(spark: SparkSession, dir: String): DataFrame = {
    val lang = Text.langId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val qual = Text.quality(spark, dir).select(col("doc_id"), col("quality"), col("n_words"))
    val keep = Dedup.exact(spark, dir).select(col("keep_id").as("doc_id"))
    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("lang"), col("source"))
    d.join(lang, "doc_id")
      .join(qual, "doc_id")
      .join(keep, Seq("doc_id"), "left_semi") // first copy of each text wins
      .filter(col("pred_lang") === col("lang") && col("quality") >= QualityFloor)
  }

  /** kept-corpus entry: the curated document set itself (id + lang +
    * source + size + score), deterministically ordered. */
  def keptDocs(spark: SparkSession, dir: String): DataFrame =
    kept(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_words"), col("quality"))
      .orderBy(col("doc_id"))

  /** Write the curated corpus as source-partitioned parquet — the
    * materialization a training pipeline consumes. Partitioning by
    * source keeps per-source reads pruned; maxRecordsPerFile bounds
    * file sizes at scale. */
  def materialize(spark: SparkSession, dir: String, outDir: String): Unit =
    kept(spark, dir)
      .join(Tables(spark, dir, "documents").select(col("doc_id"), col("text")), "doc_id")
      .write.mode("overwrite")
      .partitionBy("source")
      .option("maxRecordsPerFile", 5000000)
      .parquet(outDir)

  def curate(spark: SparkSession, dir: String): DataFrame = {
    kept(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        (sum(col("quality").cast(DecimalType(10, 6))).cast("double") / count(lit(1)))
          .as("avg_quality"))
      .orderBy(col("source"))
  }

  /** The shared gate pipeline as SQL CTEs, built from the same
    * language-marker / stopword definitions the Spark side uses. */
  private val curateCtes: String = {
    val scoreSelect = Text.langMarkers
      .map { case (l, ws) => s"${Text.sqlWordCount(ws)} AS s_$l" }.mkString(",\n    ")
    val m = s"greatest(${Text.langMarkers.map { case (l, _) => s"s_$l" }.mkString(",")})"
    val pred = Text.langMarkers
      .map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH t AS (SELECT doc_id, lang, source, text, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, lang, source,
       |    $scoreSelect,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(${Text.sqlWordCount(Text.enStops)} AS BIGINT) AS stop_cnt,
       |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars
       |  FROM t),
       |p AS (SELECT *, $m AS m FROM s),
       |f AS (SELECT doc_id, lang, source, n_words,
       |    $pred AS pred_lang,
       |    round(least(n_words / 50.0, 1.0) * 0.3 + (stop_cnt / n_words) * 0.35 +
       |          (alpha_chars / n_chars) * 0.35, 6) AS quality
       |  FROM p),
       |keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |survivors AS (
       |  SELECT doc_id, lang, source, n_words, quality
       |  FROM f JOIN keepers USING (doc_id)
       |  WHERE pred_lang = lang AND quality >= $QualityFloor)""".stripMargin
  }

  val curateSql: String =
    s"""$curateCtes
       |SELECT source, count(*) AS n_docs,
       |  sum(n_words) AS total_words,
       |  CAST(sum(CAST(quality AS DECIMAL(10,6))) AS DOUBLE) / count(*) AS avg_quality
       |FROM survivors
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val keptDocsSql: String =
    s"""$curateCtes
       |SELECT doc_id, lang, source, n_words, quality
       |FROM survivors
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> curate _,
    "pipeline_kept_docs" -> keptDocs _)

  val oracles: Map[String, String] = Map(
    "pipeline_curate" -> curateSql,
    "pipeline_kept_docs" -> keptDocsSql)
}
