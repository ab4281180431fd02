package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Depth probe for the batched BPE learner (C37b) — runs
  * [[graft.operators.Text.bpeLearnBatchedWith]] at a production merge
  * budget (env: SPARK_GRAFT_BPE_ROUNDS/TOPC/CAP, defaults 32/1024/64)
  * over SPARK_GRAFT_SF_DIR and prints ONE JSON line: total merges,
  * wall seconds, and the per-round selection counts — the
  * rounds-vs-conflict-depth evidence (driver round-trips grow with
  * conflict-graph DEPTH, not merge count). Not a gate surface; the
  * gate entry pins the small constants its unrolled oracle replays. */
object ProbeBpeDepth {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BPE_ROUNDS", "32").toInt
    val topC = sys.env.getOrElse("SPARK_GRAFT_BPE_TOPC", "1024").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BPE_CAP", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.operators.Text
      .bpeLearnBatchedWith(Tables(spark, dir, "documents"), rounds, topC, cap)
      .groupBy(col("round")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    val perRound = (1 to rounds).map(k => out.getOrElse(k.toLong, 0L))
    val total = perRound.sum
    val activeRounds = perRound.count(_ > 0L)
    println(s"""{"metric":"bpe_depth","sf":"$dir","rounds":$rounds,""" +
      s""""top_c":$topC,"cap":$cap,"merges":$total,""" +
      s""""active_rounds":$activeRounds,"secs":${"%.1f".format(secs)},""" +
      s""""per_round":[${perRound.mkString(",")}]}""")
    spark.stop()
    sys.exit(0)
  }
}
