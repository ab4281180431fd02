package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C28 MIPS-IVF: the metric distinction (inner product vs cosine) on
  * varied-norm data, score exactness, and the reduction invariant.
  * The corpus geometry keeps every data vector in centroid 10's cone
  * (centroids 11–17 are far decoys), so the probed lists provably
  * contain the whole corpus and the assertions cannot flake on list
  * pruning. */
class AnnMipsSpec extends SparkSpec {
  import spark.implicits._

  // vec_id 0: the query [1, 0, 0.1, 0].
  // vec_ids 10..17: centroids — 10 near the corpus cone, 11..17 far.
  // vec_id 20: well-aligned, small norm. vec_id 21: worse-aligned,
  // BIG norm — the MIPS winner that cosine demotes.
  private lazy val frame: DataFrame = {
    val rows = Seq(
      0L -> Seq(1.0, 0.0, 0.1, 0.0),
      10L -> Seq(1.0, 0.1, 0.0, 0.0),
      11L -> Seq(0.0, 51.0, 0.0, 0.0),
      12L -> Seq(0.0, 52.0, 0.0, 0.0),
      13L -> Seq(0.0, 53.0, 0.0, 0.0),
      14L -> Seq(0.0, 54.0, 0.0, 0.0),
      15L -> Seq(0.0, 55.0, 0.0, 0.0),
      16L -> Seq(0.0, 56.0, 0.0, 0.0),
      17L -> Seq(0.0, 57.0, 0.0, 0.0),
      20L -> Seq(0.95, 0.05, 0.0, 0.0),
      21L -> Seq(3.0, 2.0, 0.0, 0.0),
      22L -> Seq(0.5, 0.3, 0.1, 0.0))
    rows.toDF("vec_id", "embedding")
  }

  test("MIPS ranks the big-norm decoy first where cosine does not") {
    val mips = Ann.mipsIvf(frame).filter($"q_id" === 0 && $"nn_rank" === 1)
      .select($"vec_id").as[Long].head()
    assert(mips === 21L) // dot = 3.0 beats 20's 0.95
    val cos = Ann.bruteforce(frame).filter($"q_id" === 0 && $"nn_rank" === 1)
      .select($"vec_id").as[Long].head()
    assert(cos !== 21L) // 21's angle is worse than 20's
  }

  test("emitted scores are bit-exactly the true inner products") {
    val out = Ann.mipsIvf(frame).select($"q_id", $"vec_id", $"dot")
    val truth = frame.select($"vec_id", $"embedding")
      .crossJoin(frame.filter($"vec_id" === 0)
        .select($"embedding".as("qe")))
      .select($"vec_id", expr(
        """aggregate(zip_with(embedding, qe, (a, b) -> a * b),
          |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin).as("t"))
    val joined = out.join(truth, "vec_id")
      .filter($"dot" =!= $"t")
    assert(joined.count() === 0)
    assert(out.count() > 0)
  }

  test("entry on the real corpus: full top-k per query, scores exact") {
    val out = Ann.mipsIvf(spark, sf("sf0.001"))
    val perQ = out.groupBy($"q_id").count().select($"count").as[Long].collect()
    assert(perQ.length === 5 && perQ.forall(_ === 10L))
    // unit-norm corpus: the raw dot IS the cosine numerator — scores
    // must sit in [-1-eps, 1+eps]
    assert(out.filter(abs($"dot") > 1.001).count() === 0)
  }
}
