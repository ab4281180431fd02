package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode code points —
  * `acc₀ = cp₀; accᵢ = (accᵢ₋₁ · base + cpᵢ) mod m` — the C12 document
  * fingerprint as a NATIVE codegen expression (SURVEY.md §2 C12).
  *
  * Semantically identical to the declarative
  * `aggregate(codes, codes[0], (acc,x) -> (acc*31+x) % m)` left fold
  * (and to DuckDB's `list_reduce` — the oracle), but whole-stage
  * codegen'd: higher-order functions are interpreted per element with
  * lambda-variable boxing, which made the fold the dominant cost of the
  * fingerprint scan. NULL for empty strings, matching
  * `element_at(codes, 1)` on an empty array.
  *
  * Code points, not chars: supplementary-plane characters hash as one
  * value, matching `ascii(substr(text, i, 1))` on both engines. */
case class PolyFingerprint(child: Expression, base: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {
  def this(child: Expression) = this(child, 31L, 1000000007L)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Shared by eval and the generated code (one tight JIT-friendly
    * loop; String.codePointAt is O(1) on the decoded string). */
  protected override def nullSafeEval(input: Any): Any = {
    val v = PolyFingerprint.hash(input.asInstanceOf[UTF8String].toString, base, mod)
    if (v < 0) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PolyFingerprint.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      s"""
         |long $h = $cls.hash($c.toString(), ${base}L, ${mod}L);
         |if ($h < 0) { ${ev.isNull} = true; } else { ${ev.value} = $h; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_poly_fingerprint"
}

object PolyFingerprint {
  /** Returns -1 for the empty string (mapped to NULL above — all real
    * hash values are in [0, mod) with mod < 2³¹, so -1 is free). */
  def hash(s: String, base: Long, mod: Long): Long = {
    if (s.isEmpty) return -1L
    var cp = s.codePointAt(0)
    var acc: Long = cp
    var i = Character.charCount(cp)
    while (i < s.length) {
      cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}
