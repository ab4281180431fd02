package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** r18 probe for the C55 witness-cadence lever: if k rounds are
  * chained LAZILY (no per-round checkpoint) and each round carries its
  * own Dataset.observe, does the single window-end localCheckpoint
  * action complete ALL k Observations — including ones nested under a
  * BroadcastExchange (the small-graph join path broadcasts the rank
  * frame, so round i's CollectMetrics sits inside round i+1's
  * broadcast child)? If yes, checkpoint I/O and driver jobs drop
  * k-fold with NO loss of per-round mass exactness. */
object ProbeObserveWindow {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("probe-observe-window")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.range(0, 1000).toDF("u")
      .select(col("u"), (col("u") + 1).as("v"), lit(1L).as("w"))
      .localCheckpoint(true)

    def window(useBroadcast: Boolean): Seq[Option[Long]] = {
      var cur = spark.range(0, 1000).toDF("node")
        .select(col("node"), lit(10000L).as("r")).localCheckpoint(true)
      val obs = (1 to 4).map(i =>
        Observation(s"w_${useBroadcast}_$i"))
      obs.foreach { o =>
        val rs = if (useBroadcast) broadcast(cur) else cur
        cur = edges.join(rs, edges("u") === cur("node"))
          .groupBy(col("v").as("node"))
          .agg(sum(col("r")).as("r"))
          .observe(o, sum(col("r")).as("mass"))
      }
      val cp = cur.localCheckpoint(true) // the ONE action for 4 rounds
      val out = obs.map { o =>
        try {
          val row = scala.concurrent.Await.result(o.future,
            scala.concurrent.duration.Duration(5, "seconds"))
          Some(row.getLong(row.fieldIndex("mass")))
        } catch { case _: java.util.concurrent.TimeoutException => None }
      }
      cp.unpersist(true)
      out
    }

    println(s"PROBE shuffle-path masses=${window(useBroadcast = false)}")
    println(s"PROBE broadcast-path masses=${window(useBroadcast = true)}")
    spark.stop()
  }
}
