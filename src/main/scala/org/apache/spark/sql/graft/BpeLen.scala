package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic BPE token length of one word (SURVEY.md §2 C11b):
  * the number of byte-pair-encoding tokens the word occupies under the
  * FIXED public merge table [[BpeLen.Merges]] — the token unit a
  * training-data budget is actually set in, vs the whitespace/regex
  * proxies of `text_tokens` (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"; reference tokenizes
  * with a regex only, src/scalar_function/dd_search.cpp:1 — this is an
  * extension).
  *
  * Algorithm: the word is split into Unicode code points, then merges
  * are applied IN RANK ORDER, each exhaustively (one left-to-right
  * non-overlapping pass — a pass cannot re-create its own pair, so one
  * pass exhausts the rank). Because the table satisfies the BPE
  * construction invariant — every pair containing a derived token
  * ranks AFTER the merge that derives it — sequential-by-rank is
  * provably equivalent to the classic best-rank-first loop (merging
  * rank k can only create pairs of rank > k: new adjacencies always
  * contain the new token), and TextSpec property-checks that
  * equivalence against an independent best-first implementation.
  * The same sequential form is what the DuckDB oracle's recursive CTE
  * executes, so both engines walk the identical merge sequence.
  *
  * Words containing U+001F (the oracle's token separator) fall back to
  * their code-point count — the separator can't appear inside tokens
  * on the SQL side, and whitespace-split words never contain it in
  * practice. Native codegen expression: the merge loop is a tight
  * static-call scalar, same pattern as [[PolyFingerprint]]. */
case class BpeLen(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType

  protected override def nullSafeEval(input: Any): Any =
    BpeLen.tokenLen(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeLen.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.tokenLen($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_len"
}

object BpeLen {
  /** The fixed merge table, rank order = list order. Hand-built over
    * common English digrams/affixes with genuine multi-level structure
    * (`t+h → th` before `th+e → the`; `t+i`/`o+n` before
    * `ti+on → tion`), honoring the BPE invariant that a pair
    * containing a derived token ranks after the merge deriving it. */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
    "o" -> "r", "e" -> "s", "s" -> "t", "t" -> "i", "ti" -> "on",
    "a" -> "l", "o" -> "u", "l" -> "e", "i" -> "s", "h" -> "e",
    "a" -> "r", "c" -> "h", "s" -> "e", "d" -> "e", "n" -> "g",
    "i" -> "ng", "t" -> "o", "c" -> "o", "l" -> "l", "m" -> "e",
    "w" -> "h", "r" -> "o", "u" -> "s", "f" -> "or", "m" -> "a",
    "e" -> "d", "b" -> "e", "w" -> "i", "wi" -> "th", "l" -> "y",
    "v" -> "e", "p" -> "r", "e" -> "a", "s" -> "i", "d" -> "i",
    "u" -> "n", "g" -> "h", "t" -> "er")

  // compile-time check of the BPE invariant the equivalence proof
  // rests on: any pair mentioning a derived token ranks after the
  // merge that derives it
  require {
    val derivedAt = Merges.zipWithIndex.map { case ((a, b), i) => (a + b) -> i }.toMap
    Merges.zipWithIndex.forall { case ((a, b), i) =>
      derivedAt.get(a).forall(_ < i) && derivedAt.get(b).forall(_ < i)
    }
  }

  private val mergesArr: Array[(String, String)] = Merges.toArray

  /** BPE token count of `word` under [[Merges]]. 0 for the empty
    * string; code-point count for words containing U+001F. */
  def tokenLen(word: String): Int = {
    if (word.isEmpty) return 0
    if (word.indexOf('\u001f') >= 0)
      return word.codePointCount(0, word.length)
    var toks = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      toks.add(word.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < mergesArr.length && toks.size > 1) {
      val a = mergesArr(m)._1
      val b = mergesArr(m)._2
      val out = new java.util.ArrayList[String](toks.size)
      var j = 0
      while (j < toks.size) {
        val t = toks.get(j)
        if (out.size > 0 && out.get(out.size - 1) == a && t == b)
          out.set(out.size - 1, a + b)
        else out.add(t)
        j += 1
      }
      toks = out
      m += 1
    }
    toks.size
  }
}
