package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the chunked as-of join's reason to exist (r12 verdict #3):
  * plain vs chunked carry on a MAXIMALLY SKEWED frame — every row one
  * key, so the plain path's single per-key sort runs on ONE task while
  * the chunked path spreads the same rows over `span/chunk` tasks.
  * Interleaved reps (the NgramABInterleaved discipline), medians
  * reported. Run on an otherwise-idle machine only.
  *
  * Run: java -cp "<test+main classes>:<spark jars>" \
  *        graft.tools.AsofSkewBench [rowsM=20] [reps=3]
  */
object AsofSkewBench {
  def main(args: Array[String]): Unit = {
    val rowsM = args.headOption.map(_.toInt).getOrElse(20)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = rowsM * 1000000L
    // ONE key; left rows every second over ~rowsM·10⁶ s (~231 days at
    // 20M); right rows every 17 s, offset 500 ms
    val left = spark.range(n).select(
      lit(7L).as("k"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"),
      col("id").as("lid"))
    val right = spark.range(n / 17).select(
      lit(7L).as("k"),
      timestamp_micros(lit(1700000000500000L) + col("id") * 17000000L).as("ts"),
      (col("id") + 2000000000L).as("rid"))
    // 6-hour chunks → ~924 chunks at 20M rows
    val chunkMicros = 6L * 3600 * 1000000

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      System.gc(); val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    val plain = () => noop(
      graft.operators.AsofJoin.asofBackward(left, right, "k", "ts"))
    val chunked = () => noop(
      graft.operators.AsofJoin.asofBackwardChunked(
        left, right, "k", "ts", chunkMicros))

    // equality guard first (counts + match count), so the timing below
    // is of two plans proven to agree on this frame
    val a = graft.operators.AsofJoin.asofBackward(left, right, "k", "ts")
      .agg(count(lit(1)), count(col("rid"))).head
    val b = graft.operators.AsofJoin.asofBackwardChunked(
        left, right, "k", "ts", chunkMicros)
      .agg(count(lit(1)), count(col("rid"))).head
    require(a == b, s"plain $a != chunked $b")
    println(s"equality: rows=${a.getLong(0)} matched=${a.getLong(1)}")

    val coldP = time(plain()); val coldC = time(chunked())
    println(f"cold plain=$coldP%7.2f chunked=$coldC%7.2f")
    val (ps, cs) = (1 to reps).map { i =>
      val p = time(plain()); val c = time(chunked())
      println(f"rep $i%2d plain=$p%7.2f chunked=$c%7.2f")
      (p, c)
    }.unzip
    val json = s"""{"rows":$n,"right_rows":${n / 17},"keys":1,""" +
      s""""chunk_hours":6,"reps":$reps,"mode":"interleaved",""" +
      s""""plain":{"cold":$coldP,"median":${med(ps)},"reps":[${ps.mkString(",")}]},""" +
      s""""chunked":{"cold":$coldC,"median":${med(cs)},"reps":[${cs.mkString(",")}]},""" +
      s""""speedup":${med(ps) / med(cs)}}"""
    println(json)
    sys.env.get("ASOF_SKEW_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
