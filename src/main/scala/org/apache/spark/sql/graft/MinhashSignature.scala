package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** K independent minhashes of a shingle array in ONE pass — the C2/C14
  * LSH signature as a native codegen expression.
  *
  * Value-identical to the declarative form it replaces
  * (`explode(shingles)` → K `xxhash64(lit(j), s)` projection columns →
  * `groupBy(doc_id).agg(K × min)`): Spark's `XxHash64` starts at seed
  * 42 and folds children sequentially, hashing an int literal j via
  * `XXH64.hashInt(j, 42)`, so seeding `hashUnsafeBytes` with that value
  * reproduces `xxhash64(lit(j), s)` bit-for-bit, and the running
  * signed-long min matches the `min` aggregate. What changes is the
  * plan: the explode (shingle-mass row blow-up), the K-column
  * projection, and the hash-aggregate machinery (K aggregate buffers
  * updated per exploded row) all disappear — one tight JIT loop per
  * document emits the signature array directly, and nothing but
  * (doc_id, K longs) ever reaches an exchange. The LSH hash needs
  * determinism and per-seed independence, not oracle parity (the C2
  * oracle is pure exact-Jaccard SQL); parity with the previous
  * formulation is kept anyway so planted-recall behavior is unchanged.
  *
  * An empty or all-null array yields Long.MaxValue mins (callers filter
  * `size(shingles) > 0` upstream, where the old explode dropped the
  * row). Null elements are skipped like the explode path skipped them.
  */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, s"k must be positive: $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // seed_j = xxhash64's fold of the int literal j into the default seed
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(j => XXH64.hashInt(j, 42L))

  protected override def nullSafeEval(input: Any): Any =
    MinhashSignature.signature(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinhashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ref = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.signature($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_signature"
}

object MinhashSignature {
  /** One tight loop shared by eval and generated code. */
  def signature(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
