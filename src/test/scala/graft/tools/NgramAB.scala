package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration harness for the ngram auto-dispatch rule: times the
  * probe and both dispatched plans separately on a SF dir, warm (one
  * cold rep then N timed back-to-back), printing per-phase medians.
  * Run: java -cp "<test+main classes>:<spark jars>" graft.tools.NgramAB <sfDir> [reps] [t]
  */
object NgramAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val t = if (args.length > 2) args(2).toDouble else 0.8
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")

    def time[A](f: => A): (Double, A) = {
      val pre = spark.sparkContext.getPersistentRDDs.keySet
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pre.contains(id)) rdd.unpersist(blocking = true) }
      (sec, a)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    val phases: Seq[(String, () => Any)] = Seq(
      "probe_only" -> (() => graft.operators.Dedup.ngramDispatchStats(docs, t)),
      "prefix" -> (() => noop(graft.operators.Dedup.ngramJaccardPrefix(docs, t))),
      "count" -> (() => noop(graft.operators.Dedup.ngramJaccard(docs))),
      "auto" -> (() => noop(graft.operators.Dedup.ngramJaccardAuto(docs, t))))
    val blocks = phases.map { case (name, f) =>
      val cold = time(f())._1
      val times = (1 to reps).map(_ => time(f())._1)
      println(f"$name%-12s cold=$cold%7.2f median=${med(times)}%7.2f " +
        f"all=[${times.map(x => f"$x%.2f").mkString(", ")}]")
      s""""$name":{"cold":$cold,"median":${med(times)},""" +
        s""""reps":[${times.mkString(",")}]}"""
    }
    val stats = graft.operators.Dedup.ngramDispatchStats(docs, t)
    val json = s"""{"sf":"$dir","threshold":$t,"reps":$reps,""" +
      blocks.mkString("", ",", ",") +
      s""""v_count":${stats.vCount},"v_prefix":${stats.vPrefix},""" +
      s""""dispatch":"${if (stats.prefixWins(5.0)) "prefix" else "count"}"}"""
    println(json)
    sys.env.get("NGRAM_AB_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
