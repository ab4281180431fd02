package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Sign-random-projection signature: bit i is set iff
  * `dot(embedding, planes(i)) > 0` — the C5/C7 LSH signature as a
  * NATIVE codegen expression.
  *
  * Semantically identical to the declarative
  * `sum_i(when(aggregate(zip_with(e, plane_i, *), 0.0, +) > 0, 1L<<i))`
  * form, whose higher-order functions are interpreted per element with
  * lambda boxing AND re-evaluated once per consumer of the signature —
  * the dominant cost of the embedding-dedup scan. Here the 60×64
  * multiply-add runs as one tight JIT loop (NOT an unrolled expression
  * tree, which blows generated-method limits and deoptimizes — see the
  * Ann/Dedup scaladoc). The fold order is the same sequential
  * left-to-right IEEE sum, so results are bit-identical to the HOF form
  * and to the DuckDB oracle's list_inner_product.
  *
  * HOF null semantics preserved: a missing/extra element or a null
  * element makes zip_with pad with null → null dot → `null > 0` false
  * → bit 0; the loop detects both and clears the bit. */
case class SignSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    SignSignature.signature(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SignSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.signature($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_sign_signature"
}

object SignSignature {
  /** One tight loop shared by eval and generated code. */
  def signature(arr: ArrayData, planes: Array[Array[Double]]): Long = {
    val n = arr.numElements()
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      if (n == p.length) {
        var s = 0.0
        var ok = true
        var j = 0
        while (ok && j < n) {
          if (arr.isNullAt(j)) ok = false
          else { s += arr.getDouble(j) * p(j); j += 1 }
        }
        if (ok && s > 0) sig |= 1L << i
      }
      i += 1
    }
    sig
  }
}
