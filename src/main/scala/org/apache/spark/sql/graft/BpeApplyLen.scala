package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE token length of one word under a RUNTIME merge table (SURVEY.md
  * §2 C11c) — [[BpeLen]] with the table as data instead of the fixed
  * public constant, so a table LEARNED by the C37/C37b trainers can be
  * applied to the corpus it was learned from (tokenizer-train →
  * tokenize, the loop a real pipeline closes).
  *
  * Semantics are the LEARNER's, not [[BpeLen]]'s single-pass scan: the
  * word becomes the chr(31)-delimited code-point string and each merge
  * rank applies `replace(pat, rep)` exactly THREE times in rank order
  * — bit-identical to how C37b produced the table's final segmentation
  * and to the DuckDB oracle's recursive CTE (both engines' `replace`
  * is the same leftmost-non-overlapping source scan; see
  * [[graft.operators.Text.bpeLearn]]'s cross-engine exactness note for
  * why ×3 reaches the fixpoint for left≠right pairs and is itself the
  * defined semantics otherwise). A learned table may contain
  * left==right pairs and stacked derived tokens — matching the
  * learner's replace trace exactly is what makes the apply CLOSE over
  * the training corpus (TextSpec pins the closure: applying the table
  * reproduces the learner's final corpus token count).
  *
  * Words containing U+001F fall back to their code-point count (the
  * [[BpeLen]] convention — the delimiter cannot appear inside tokens
  * on the SQL side). Native codegen: the merge arrays ride as
  * reference objects, the loop is one static call. */
case class BpeApplyLen(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType

  private lazy val pats: Array[String] =
    merges.map { case (a, b) => "\u001f" + a + "\u001f" + b + "\u001f" }.toArray
  private lazy val reps: Array[String] =
    merges.map { case (a, b) => "\u001f" + a + b + "\u001f" }.toArray

  protected override def nullSafeEval(input: Any): Any =
    BpeApplyLen.tokenLen(input.asInstanceOf[UTF8String].toString, pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeApplyLen.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val p = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"$cls.tokenLen($c.toString(), $p, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_apply_len"
}

object BpeApplyLen {
  /** Token count of `word` under the (pat, rep) merge arrays: delimit,
    * replace ×3 per rank in order, count delimiters − 1. */
  def tokenLen(word: String, pats: Array[String], reps: Array[String]): Int = {
    if (word.isEmpty) return 0
    if (word.indexOf('\u001f') >= 0)
      return word.codePointCount(0, word.length)
    val sb = new java.lang.StringBuilder(word.length * 2 + 1)
    sb.append('\u001f')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      sb.append(word, i, i + n).append('\u001f')
      i += n
    }
    var s = sb.toString
    var m = 0
    while (m < pats.length) {
      // exactly three leftmost-non-overlapping passes — the learner's
      // (and the oracle's) per-rank semantics, NOT a fixpoint loop
      s = s.replace(pats(m), reps(m))
        .replace(pats(m), reps(m))
        .replace(pats(m), reps(m))
      m += 1
    }
    var cnt = 0
    var j = 0
    while (j < s.length) {
      if (s.charAt(j) == '\u001f') cnt += 1
      j += 1
    }
    cnt - 1
  }
}
