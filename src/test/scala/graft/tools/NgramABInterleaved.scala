package graft.tools

import org.apache.spark.sql.SparkSession

/** INTERLEAVED A/B for the ngram dispatch calibration (r12 verdict:
  * block-sequential reps at sf10 drifted 157s within one block, so the
  * blocks were not comparable). Reps alternate prefix, count, prefix,
  * count, … inside one JVM after one cold rep of each, so page-cache /
  * JIT / heap drift lands on BOTH arms symmetrically and the medians
  * are directly comparable. Run on an otherwise-idle machine only
  * (SURVEY §8 — `ps` for resumed chains first).
  *
  * Run: java -cp "<test+main classes>:<spark jars>" \
  *        graft.tools.NgramABInterleaved <sfDir> [reps=5] [t=0.8] [order=pc]
  * order=cp runs count before prefix within each rep pair — the
  * order-swap control for any warm-up asymmetry.
  */
object NgramABInterleaved {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val t = if (args.length > 2) args(2).toDouble else 0.8
    val countFirst = args.length > 3 && args(3) == "cp"
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir, "documents")

    def time(f: => Unit): Double = {
      val pre = spark.sparkContext.getPersistentRDDs.keySet
      System.gc()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pre.contains(id)) rdd.unpersist(blocking = true) }
      sec
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    val prefix = () => noop(graft.operators.Dedup.ngramJaccardPrefix(docs, t))
    val count = () => noop(graft.operators.Dedup.ngramJaccard(docs))

    val (coldP, coldC) =
      if (countFirst) { val c = time(count()); val p = time(prefix()); (p, c) }
      else { val p = time(prefix()); val c = time(count()); (p, c) }
    println(f"cold prefix=$coldP%7.2f count=$coldC%7.2f")
    val (ps, cs) = (1 to reps).map { i =>
      val (p, c) =
        if (countFirst) { val c = time(count()); val p = time(prefix()); (p, c) }
        else { val p = time(prefix()); val c = time(count()); (p, c) }
      println(f"rep $i%2d prefix=$p%7.2f count=$c%7.2f")
      (p, c)
    }.unzip
    def spread(xs: Seq[Double]) = xs.max - xs.min
    val json = s"""{"sf":"$dir","threshold":$t,"reps":$reps,""" +
      s""""mode":"interleaved","order":"${if (countFirst) "cp" else "pc"}",""" +
      s""""prefix":{"cold":$coldP,"median":${med(ps)},"spread":${spread(ps)},"reps":[${ps.mkString(",")}]},""" +
      s""""count":{"cold":$coldC,"median":${med(cs)},"spread":${spread(cs)},"reps":[${cs.mkString(",")}]},""" +
      s""""gap":${math.abs(med(ps) - med(cs))}}"""
    println(json)
    sys.env.get("NGRAM_AB_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
