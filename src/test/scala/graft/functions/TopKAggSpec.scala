package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

/** TopKAgg: bounded top-k with partial aggregation. */
class TopKAggSpec extends SparkSpec {

  private def topK(score: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column, k: Int) =
    Bridge.column(TopKAgg(Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())

  test("returns k largest by (score desc, id asc), deterministic on ties") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7), (6L, 0.9)
    ).toDF("id", "score").repartition(4) // force partial merges
    val res = df.agg(topK(col("score"), col("id"), 3).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.score"), col("e.id"))
      .collect().toSeq
    assert(res === Seq(Row(0.9, 2L), Row(0.9, 3L), Row(0.9, 6L)))
  }

  test("fewer rows than k returns all, sorted") {
    import spark.implicits._
    val df = Seq((1L, 0.2), (2L, 0.8)).toDF("id", "score")
    val res = df.agg(topK(col("score"), col("id"), 10).as("t"))
      .select(size(col("t"))).head.getInt(0)
    assert(res === 2)
  }

  test("grouped top-k matches window row_number result") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = for (g <- 0 until 5; i <- 0 until 200) yield (g, i.toLong, rnd.nextDouble())
    val df = data.toDF("g", "id", "score").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(topK(col("score"), col("id"), 7).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rk"), col("col.id").as("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 7)
      .select(col("g"), col("rk").cast("long"), col("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
  }

  test("plan uses partial aggregation (map-side top-k)") {
    import spark.implicits._
    val df = Seq((1L, 0.1)).toDF("id", "score")
    val plan = df.groupBy().agg(topK(col("score"), col("id"), 3))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate with a Partial then Final mode pair
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.contains("partial_graft_top_k") || plan.toLowerCase.contains("partial"))
  }
}
