package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Integer-exact nearest-centroid assignment — [[NearestCentroid]]'s
  * sibling for the quantized-long spaces the trainers use (C38's
  * Lloyd assignment; the kernel the r18 optimization round swaps in
  * for the crossJoin → min(struct) probe form, whose struct agg
  * buffers force a SortAggregate over k×n vector-carrying rows — the
  * exact shape Dedup.semanticDedup's scaladoc documents as the sf10
  * scale-killer).
  *
  * Semantically identical to
  * `crossJoin(cents) → min(struct(Σ(v−c)², cid))`: the distance is
  * the full integer L2 `Σ_j (v_j − c_j)²` (long addition is
  * associative, so ANY fold order yields the same value — no IEEE
  * caveat), ties break toward the smaller cid, and a
  * length-mismatched or null-element row (impossible under the
  * quantized contract) skips the centroid; all skipped → null.
  * Overflow headroom matches the Column form it replaces: d ≤
  * dim·(range)², ~4·10¹⁵ for C38's 64-dim micro-unit lift. */
case class NearestCentroidL2(child: Expression, cids: Array[Long],
    cents: Array[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cids.length == cents.length,
    s"cids(${cids.length}) and cents(${cents.length}) must align")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    NearestCentroidL2.assign(input.asInstanceOf[ArrayData], cids, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NearestCentroidL2.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idRef = ctx.addReferenceObj("cids", cids, "long[]")
    val ceRef = ctx.addReferenceObj("cents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long r = $cls.assign($c, $idRef, $ceRef);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_nearest_centroid_l2"

  // content equality (not Array reference equality) so structurally
  // equal kernels canonicalize — the NearestCentroid precedent
  override def equals(other: Any): Boolean = other match {
    case nc: NearestCentroidL2 =>
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

object NearestCentroidL2 {
  /** One tight loop shared by eval and generated code. Returns null
    * (boxed) when no centroid is comparable. */
  def assign(arr: ArrayData, cids: Array[Long],
      cents: Array[Array[Long]]): java.lang.Long = {
    val n = arr.numElements()
    var bestCid = 0L
    var bestD = 0L
    var found = false
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      if (n == c.length) {
        var s = 0L
        var ok = true
        var j = 0
        while (ok && j < n) {
          if (arr.isNullAt(j)) ok = false
          else { val d = arr.getLong(j) - c(j); s += d * d; j += 1 }
        }
        if (ok) {
          if (!found || s < bestD || (s == bestD && cids(i) < bestCid)) {
            found = true; bestD = s; bestCid = cids(i)
          }
        }
      }
      i += 1
    }
    if (found) java.lang.Long.valueOf(bestCid) else null
  }
}
