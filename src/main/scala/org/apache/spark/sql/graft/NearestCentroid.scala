package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Nearest-centroid assignment over a bounded codebook as a NATIVE
  * codegen expression — the kernel of cluster-bucketed operators
  * (SemDeDup's assignment step; reference point: Dedup.semanticDedup).
  *
  * Semantically identical to the broadcast-probe form
  * `crossJoin(broadcast(cents)) → min(struct(cn − 2·dot(e, ce), cid))`
  * — same per-centroid distance arithmetic (the row's own norm is
  * assignment-invariant and dropped; `cn` is the same sequential
  * self-dot fold), same (distance, cid) tie rule — but evaluated as
  * one tight k×d multiply-add loop per row. The probe form was the
  * sf10 scale-killer it replaces: it materialized k×n rows EACH
  * CARRYING THE FULL VECTOR into a struct-min SortAggregate (struct
  * buffers disqualify hash aggregation), a ~40 GB spill-bound sort at
  * 200k×407; this is a pure projection — no join, no aggregate, no
  * exchange (measured 324s → suite-noise level).
  *
  * Exactness: distances are `cn_i − 2.0·dot(e, c_i)` with the same
  * left-to-right IEEE folds as graft_vec_dot, so the winning cid is
  * bit-identical to the Column form and to the DuckDB oracle's
  * row_number-over-distance replay. Ties break toward the smaller
  * cid regardless of codebook order. A length-mismatched or
  * null-element row (impossible under the embeddings contract) skips
  * the centroid; if every centroid is skipped the result is null.
  *
  * At production k (SemDeDup uses k ≈ n/1000) the codebook no longer
  * fits an expression constant — the two-level IVF shape (coarse
  * NearestCentroid over √k superclusters, then per-supercluster
  * codebooks) keeps the same kernel. */
case class NearestCentroid(child: Expression, cids: Array[Long],
    cents: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cids.length == cents.length,
    s"cids(${cids.length}) and cents(${cents.length}) must align")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Per-centroid self-dots, the same sequential fold the Column form
    * computes as graft_vec_dot(ce, ce). */
  private val cns: Array[Double] = cents.map { c =>
    var s = 0.0
    var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    s
  }

  protected override def nullSafeEval(input: Any): Any =
    NearestCentroid.assign(input.asInstanceOf[ArrayData], cids, cents, cns)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NearestCentroid.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idRef = ctx.addReferenceObj("cids", cids, "long[]")
    val ceRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cnRef = ctx.addReferenceObj("cns", cns, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long r = $cls.assign($c, $idRef, $ceRef, $cnRef);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_centroid"

  // Case-class equality over Array fields is reference equality, which
  // would make two structurally equal kernels (e.g. built from separate
  // collect() calls) never canonicalize together — silently defeating
  // subexpression elimination and exchange reuse. Compare contents.
  override def equals(other: Any): Boolean = other match {
    case nc: NearestCentroid =>
      nc.child == child &&
        java.util.Arrays.equals(nc.cids, cids) &&
        java.util.Arrays.deepEquals(
          nc.cents.asInstanceOf[Array[AnyRef]],
          cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.hashCode(cids)) +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])
}

object NearestCentroid {
  /** One tight loop shared by eval and generated code. Returns null
    * (boxed) when no centroid is comparable. */
  def assign(arr: ArrayData, cids: Array[Long], cents: Array[Array[Double]],
      cns: Array[Double]): java.lang.Long = {
    val n = arr.numElements()
    var bestCid = 0L
    var bestD = 0.0
    var found = false
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      if (n == c.length) {
        var s = 0.0
        var ok = true
        var j = 0
        while (ok && j < n) {
          if (arr.isNullAt(j)) ok = false
          else { s += arr.getDouble(j) * c(j); j += 1 }
        }
        if (ok) {
          val d = cns(i) - 2.0 * s
          if (!found || d < bestD || (d == bestD && cids(i) < bestCid)) {
            found = true; bestD = d; bestCid = cids(i)
          }
        }
      }
      i += 1
    }
    if (found) java.lang.Long.valueOf(bestCid) else null
  }
}
