package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a space-tokenized string, as one
  * native pass — the C2/C4 shingle stage.
  *
  * Semantically identical to the declarative chain it replaces
  * (`array_distinct(transform(sequence(0, n-3), i → concat_ws(" ",
  * toks(i), toks(i+1), toks(i+2))))` over `split(text, " ")`): same
  * Java-regex split with trailing empties kept (limit -1), same
  * 3-token space-joined grams, same first-occurrence distinct order.
  * Documents with fewer than 3 tokens yield an EMPTY array (the caller
  * filters on size > 0, replacing its former size(toks) >= 3 gate —
  * equivalent: ≥3 tokens always produce ≥1 shingle). The transform
  * lambda was interpreted per element with a per-gram concat_ws
  * allocation chain; this is one loop sharing a StringBuilder. */
case class WordShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.shingles($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_word_shingles"
}

object WordShingles {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def shingles(text: UTF8String): ArrayData = {
    // Java regex split with limit -1: identical token stream to
    // Spark's split(text, ' ') — consecutive/trailing separators keep
    // their empty tokens
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return Empty
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - 3) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
