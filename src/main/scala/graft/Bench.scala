package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, timing a full materialization through the noop
  * sink (all rows produced, nothing pruned by count-only semantics,
  * no collect-to-driver). Each entry reports the MEDIAN of
  * SPARK_GRAFT_REPS runs (default 3) — single runs at sf0.1 swing
  * ±30% on the shuffle-heavy entries. Failures are printed and
  * surface as a negative timing — never silently swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up at the smallest SF so the first timed query
    // doesn't absorb JVM compilation for the whole session
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // optional comma-separated entry filter for focused perf iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    // per-entry repetitions; the documented sf0.1 run-to-run variance
    // (±30% on dedup entries) makes single-run deltas meaningless, so
    // each entry reports its MEDIAN of `reps` runs
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    var failed = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -sec
      }
      val good = times.filter(_ > 0).sorted
      if (good.isEmpty) failed += 1
      // median (lower-middle for even counts); all-reps-failed → the
      // negative first attempt surfaces the failure in the JSON
      val v = if (good.isEmpty) times.head else good((good.size - 1) / 2)
      name -> v
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v > 0 => v }.sum
    val bSuite = results.collect { case (k, v) if k.startsWith("q") && v > 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"b_suite_total":$bSuite,"failed":$failed,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
