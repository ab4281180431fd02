package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the exact-quantile refinement (C29c): the sketch+refine
  * plan vs the naive full-sort rank selection (the oracle's algorithm,
  * expressed in Spark) on the same orders frame. Equality-guarded
  * before timing; interleaved reps; medians. The refinement's claim is
  * "sorts ONLY each percentile's target bucket" — this measures what
  * that buys at scale. Run on an otherwise-idle machine only.
  *
  * Run: java -cp "<test+main classes>:<spark jars>" \
  *        graft.tools.QuantileABBench <sfDir> [reps=3]
  */
object QuantileABBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("v"))
    val ps = Seq(50, 90, 99)

    def refined() = graft.operators.Sketch
      .exactQuantiles(orders.withColumnRenamed("g", "o_orderpriority"),
        Seq("o_orderpriority"), "v", ps)

    def naive() = {
      val w = Window.partitionBy(col("g")).orderBy(col("v"))
      val wAll = Window.partitionBy(col("g"))
      val r = orders
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
      val aggCols = max(col("n")).cast("long").as("n") +:
        ps.map(p => max(when(col("rn") ===
            expr(s"(n * $p + 99) div 100"), col("v")))
          .cast("long").as(s"p$p"))
      r.groupBy(col("g"))
        .agg(aggCols.head, aggCols.tail: _*)
        .withColumnRenamed("g", "o_orderpriority")
    }

    // equality guard: the two plans must agree exactly
    val a = refined().orderBy("o_orderpriority").collect().toSeq
    val b = naive().orderBy("o_orderpriority").collect().toSeq
    require(a == b, s"refined $a != naive $b")
    println(s"equality: ${a.size} groups agree exactly")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      System.gc(); val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    val coldR = time(noop(refined())); val coldN = time(noop(naive()))
    println(f"cold refined=$coldR%7.2f naive=$coldN%7.2f")
    val (rs, ns) = (1 to reps).map { i =>
      val r = time(noop(refined())); val n = time(noop(naive()))
      println(f"rep $i%2d refined=$r%7.2f naive=$n%7.2f")
      (r, n)
    }.unzip
    val json = s"""{"sf":"$dir","percentiles":[${ps.mkString(",")}],""" +
      s""""reps":$reps,"mode":"interleaved",""" +
      s""""refined":{"cold":$coldR,"median":${med(rs)},"reps":[${rs.mkString(",")}]},""" +
      s""""naive":{"cold":$coldN,"median":${med(ns)},"reps":[${ns.mkString(",")}]},""" +
      s""""speedup":${med(ns) / med(rs)}}"""
    println(json)
    sys.env.get("QUANTILE_AB_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
