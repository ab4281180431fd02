package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Element-wise fold of two double arrays as NATIVE codegen expressions
  * — the C5/C6/C7/C15 distance kernels.
  *
  * Semantically identical to the declarative
  * `aggregate(zip_with(a, b, f), 0.0, +)` form (and to DuckDB's
  * list_inner_product / list_reduce — the oracles): the loop is the
  * same sequential left-to-right IEEE sum, so values are bit-identical.
  * The HOF form is interpreted per element with lambda boxing — the
  * dominant cost of every scoring scan. A tight loop also avoids the
  * 64-term unrolled-expression JIT collapse documented in Ann/Dedup.
  *
  * HOF null semantics preserved: unequal lengths or a null element make
  * zip_with emit null products → null sum; the helpers return null for
  * both. */
abstract class VecFoldBase extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Name of the static helper in [[VecFold]] (codegen call target). */
  protected def fold: String
  protected def compute(a: ArrayData, b: ArrayData): java.lang.Double

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VecFold.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = $cls.$fold($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ, sequential fold. */
case class VecDot(left: Expression, right: Expression) extends VecFoldBase {
  override protected def fold: String = "dot"
  override protected def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    VecFold.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_vec_dot"
}

/** l2sq(a, b) = Σ (aᵢ-bᵢ)², sequential fold. */
case class VecL2Sq(left: Expression, right: Expression) extends VecFoldBase {
  override protected def fold: String = "l2sq"
  override protected def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    VecFold.l2sq(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_vec_l2sq"
}

object VecFold {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
