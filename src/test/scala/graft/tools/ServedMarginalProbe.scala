package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Ann

/** The serve-many economics probe (r18): ONE IVF index build, then k
  * DISTINCT query batches served from the same files — the number that
  * justifies C58's build-once/serve-many split is the per-batch
  * MARGINAL cost vs the build cost. Prints one JSON line:
  * {"sf":…,"build_sec":…,"batch_sec":[…],"marginal_over_build":…}.
  * Run: SPARK_GRAFT_SF_DIR=… sbt "Test/runMain graft.tools.ServedMarginalProbe"
  * → artifact bench_points_r18/served_marginal_<sf>.json */
object ServedMarginalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("served-marginal-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = Ann.corpus(spark, sfDir)
    val cents = Ann.ivfCents(c)
    // JIT/codegen warmup on an unrelated tiny pipeline
    c.limit(10).write.format("noop").mode("overwrite").save()
    val out = graft.Scratch.dir("ivf_marginal")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      val build = time(Ann.ivfIndexWrite(c, out))
      val batches = (0 until 3).map { b =>
        time {
          Ann.ivfServeFrom(spark, out,
            Ann.ivfProbesRange(c, cents, b.toLong * 5, b.toLong * 5 + 5))
            .write.format("noop").mode("overwrite").save()
        }
      }
      val marginal = batches.sum / batches.size
      println(s"""{"sf":"$sfDir","build_sec":$build,""" +
        s""""batch_sec":[${batches.mkString(",")}],""" +
        s""""marginal_over_build":${marginal / build}}""")
    } finally graft.Scratch.delete(out)
    spark.stop()
  }
}
