package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe: does a Dataset.observe metric fire on the job that
  * localCheckpoint(true) runs? If yes, the C55 rank-mass witness can
  * ride the per-round checkpoint action for free instead of costing a
  * separate driver job per round. */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("probe-observe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation("mass")
    val df = spark.range(0, 1000).toDF("id")
      .observe(obs, sum(col("id")).as("m"))
    val cp = df.localCheckpoint(true)
    // obs.get blocks until an action on the observed plan completes —
    // guard with a bounded join so a non-firing listener prints TIMEOUT
    // instead of hanging the probe
    @volatile var got: Option[Map[String, Any]] = None
    val t = new Thread(() => { got = Some(obs.get) })
    t.setDaemon(true); t.start(); t.join(5000)
    println(s"PROBE metrics=${got.getOrElse("TIMEOUT")}")
    println(s"PROBE rows=${cp.count()}")
    spark.stop()
  }
}
