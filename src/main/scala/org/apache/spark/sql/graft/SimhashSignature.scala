package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token array in ONE pass — the C3 signature as a
  * native codegen expression.
  *
  * Value-identical to the declarative form it replaces
  * (`explode(tokens)` → `conv(substring(md5(t),1,15),16,10)` → groupBy
  * with 60 `sum(±1)` aggregates → bit recombination): the 60-bit token
  * hash is the first 15 hex nibbles of the md5 digest read big-endian
  * (7 bytes then the high nibble of byte 8 — exactly what
  * `conv(hex, 16, 10)` parses), each token votes ±1 per bit, and bit b
  * of the result is set iff its vote sum is strictly positive. md5 is
  * parity-critical here (the DuckDB oracle RECOMPUTES the signature
  * from md5), which is why the hash stays md5 rather than a faster
  * xxhash. A null token element votes −1 on every bit, matching the
  * `when(null === 1, 1).otherwise(-1)` null semantics of the replaced
  * plan. What changes is only the plan shape: no token-mass row
  * blow-up, no 60 aggregate buffers per doc — one loop per document in
  * the scan stage. */
case class SimhashSignature(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    SimhashSignature.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimhashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.signature($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash_signature"
}

object SimhashSignature {
  private val Bits = 60

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One loop shared by eval and generated code. */
  def signature(arr: ArrayData): Long = {
    val md = digests.get()
    val counts = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // null token: the replaced plan's `when` saw a null condition
        // and took the -1 branch for every bit
        var b = 0
        while (b < Bits) { counts(b) -= 1; b += 1 }
      } else {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex nibbles big-endian = 7 bytes + high nibble of
        // byte 8 — what conv(substring(md5_hex,1,15),16,10) parses
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        var b = 0
        while (b < Bits) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
