package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C38 `ann_kmeans_train`: differential against an independent
  * driver-side Lloyd implementation sharing the operator's exact
  * integer semantics (micro-unit quantization + positive shift,
  * integer L2, (distance, cid) tie-break, floor-div mean), corpus
  * accounting laws, and layout invariance. */
class AnnKmeansSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent reference: plain-Scala Lloyd over the quantized
    * integers. Long `/` on the shifted (non-negative) sums is the
    * same floor-div as Spark `div` / DuckDB `//`. */
  private def refKmeans(vecs: Map[Long, Seq[Double]], k: Int, iters: Int,
      seed: Long): Seq[(Long, Long, Long, String)] = {
    val q = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x * 1000000.0).toLong + 4000000L)
    }
    var cents: Seq[(Long, Seq[Long])] =
      (seed until seed + k).flatMap(id => q.get(id).map(id -> _))
    val out = Seq.newBuilder[(Long, Long, Long, String)]
    for (t <- 1 to iters) {
      val assign: Map[Long, Long] = q.map { case (id, v) =>
        id -> cents.map { case (cid, cv) =>
          (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min._2
      }
      cents = assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (cid, m) =>
        val members = m.keys.toSeq.map(q)
        val n = members.size.toLong
        cid -> members.head.indices.map(d => members.map(_(d)).sum / n)
      }
      cents.foreach { case (cid, cv) =>
        val n = assign.count(_._2 == cid).toLong
        out += ((t.toLong, cid, n, md5Hex(cv.mkString(","))))
      }
    }
    out.result()
  }

  test("kmeans train: differential vs the reference, incl. an exact midpoint tie") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // seeds 10..17; vec 30 sits EXACTLY midway between seeds 10 and 11
    // in quantized space — the (distance, cid) tie must pick cid 10
    val fixture: Map[Long, Seq[Double]] =
      ((10L to 17L).map(i => i -> Seq.fill(6)(rnd.nextDouble() * 2 - 1)) ++
        (20L to 29L).map(i => i -> Seq.fill(6)(rnd.nextDouble() * 2 - 1)) :+
        (30L -> Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))).toMap
          .updated(10L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
          .updated(11L, Seq(-1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val want = refKmeans(fixture, 8, 3, 10L)
    val df = fixture.toSeq.map { case (id, e) => (id, e) }
      .toDF("vec_id", "embedding")
    val got = Ann.kmeansTrain(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got.sorted === want.sorted)
    // the tie really exercised: iteration 1 put vec 30 in cluster 10
    // (equal distance to seeds 10 and 11, lower cid wins) — visible as
    // ref and entry agreeing while a max-cid tie-break would differ
    val iter1 = want.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    assert(iter1.values.sum === fixture.size.toLong)
  }

  test("kmeans train on the corpus: accounting laws + layout invariance") {
    val d = graft.Tables(spark, dir, "embeddings")
    val n = d.count()
    val rows = Ann.kmeansTrain(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    (1 to 3).foreach { t =>
      val it = rows.filter(_._1 == t.toLong)
      assert(it.map(_._3).sum === n, s"iter $t must assign every vector")
      assert(it.map(_._2).distinct.size === it.size, s"iter $t dup cid")
      assert(it.forall(_._3 >= 1L), s"iter $t zero-size cluster row")
    }
    // training moves the centroids: iteration 1 and 3 centroid sets
    // must differ somewhere on real data (a frozen codebook means the
    // update pass is broken)
    val m1 = rows.filter(_._1 == 1L).map(r => r._2 -> r._4).toMap
    val m3 = rows.filter(_._1 == 3L).map(r => r._2 -> r._4).toMap
    assert(m1 != m3, "centroids never moved across iterations")
    val re = Ann.kmeansTrain(d.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(re.sorted === rows.sorted, "layout invariance")
  }
}
