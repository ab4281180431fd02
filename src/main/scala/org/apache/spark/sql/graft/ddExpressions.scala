package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BloomBlob

import scala.collection.mutable.ArrayBuffer

/** Catalyst expressions for the reference's scalar-function surface
  * (SURVEY.md §2 A8–A13). Native `Expression`s — not UDFs — so they
  * participate in Catalyst analysis/optimization; evaluation is
  * interpreted (CodegenFallback), which is fine off the hot aggregate
  * path; the hot-path ops (Olap, Text, Dedup) stay on codegen'd
  * built-ins.
  *
  * This file lives in `package org.apache.spark.sql.graft` (not
  * `graft.functions`) because `AbstractDataType` and the
  * Column⇄Expression bridge (`classic.ExpressionUtils`) are
  * `private[sql]` in Spark 4.
  */

/** Column⇄Expression bridge — the only place that touches
  * `private[sql]` Spark internals. Public signatures use only public
  * types, so callers outside the sql package are fine. */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}

private[graft] object DdTypes {
  /** A string array — also admitting the empty/all-null `array()`
    * literal (ARRAY<VOID>), which the reference's `[]` tests exercise. */
  val StringArray: AbstractDataType =
    TypeCollection(ArrayType(StringType), ArrayType(NullType))
}

/** dd_bloom_filter_create(arr [, bits_per_element [, num_hash_functions]])
  * → BINARY. Per-row filter over a VARCHAR[] (reference
  * bloom_filter.cpp:53). Null array → null; null elements skipped. */
case class BloomFilterCreate(arr: Expression, bitsPerElement: Expression,
                             numHashFuncs: Expression)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  def this(arr: Expression) =
    this(arr, Literal(BloomBlob.DefaultBitsPerElement), Literal(BloomBlob.DefaultNumHashFuncs))
  def this(arr: Expression, bpe: Expression) =
    this(arr, bpe, Literal(BloomBlob.DefaultNumHashFuncs))

  override def first: Expression = arr
  override def second: Expression = bitsPerElement
  override def third: Expression = numHashFuncs
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DdTypes.StringArray, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  /** The reference only honors CONSTANT bits_per_element /
    * num_hash_functions vectors (bloom_filter.cpp: ConstantVector reads,
    * silent defaults otherwise) — require foldable args instead of
    * silently diverging per row. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!bitsPerElement.foldable || !numHashFuncs.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "dd_bloom_filter_create: bits_per_element and num_hash_functions must be constant")
    } else base
  }

  // constant by checkInputDataTypes; evaluated once
  private lazy val bpeConst: Int =
    Option(bitsPerElement.eval(null)).fold(BloomBlob.DefaultBitsPerElement)(_.asInstanceOf[Int])
  private lazy val kConst: Int =
    Option(numHashFuncs.eval(null)).fold(BloomBlob.DefaultNumHashFuncs)(_.asInstanceOf[Int])

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val bpe = bpeConst
    val k = kConst
    val elems = new ArrayBuffer[Array[Byte]](ad.numElements())
    var i = 0
    while (i < ad.numElements()) {
      if (!ad.isNullAt(i)) elems += ad.getUTF8String(i).getBytes
      i += 1
    }
    BloomBlob.create(elems, ad.numElements(), bpe, k)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "dd_bloom_filter_create"
}

/** dd_bloom_filter_contains(blob, value) → BOOLEAN; null on malformed
  * blob (reference bloom_filter.cpp:160). */
case class BloomFilterContains(blob: Expression, value: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  override def left: Expression = blob
  override def right: Expression = value
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any, v: Any): Any =
    BloomBlob.mayContain(b.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String]).orNull

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "dd_bloom_filter_contains"
}

/** dd_bloom_filter_contains_all(blob, values) → BOOLEAN. Empty array →
  * true; null elements skipped (reference bloom_filter.cpp:233). */
case class BloomFilterContainsAll(blob: Expression, values: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  override def left: Expression = blob
  override def right: Expression = values
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DdTypes.StringArray)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any, vs: Any): Any = {
    val blobBytes = b.asInstanceOf[Array[Byte]]
    val ad = vs.asInstanceOf[ArrayData]
    if (ad.numElements() == 0) return true
    var i = 0
    while (i < ad.numElements()) {
      if (!ad.isNullAt(i)) {
        BloomBlob.mayContain(blobBytes, ad.getUTF8String(i)) match {
          case None => return null
          case Some(false) => return false
          case Some(true) =>
        }
      }
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "dd_bloom_filter_contains_all"
}

/** dd_array_contains_all(haystack, needle [, bloom_or_flag]) → BOOLEAN:
  * true iff every non-null needle element occurs in haystack (reference
  * array_contains_all.cpp:44). The optional third argument mirrors the
  * reference's two overloads (array_contains_all.cpp:273,304): a BOOLEAN
  * is the columnar-processing flag (result-neutral, ignored here — Spark
  * picks its own vectorization), while a BINARY bloom blob is a
  * prefilter: a definite-miss short-circuits, otherwise membership is
  * re-verified exactly — so results are identical with or without it. */
case class ArrayContainsAll(haystack: Expression, needle: Expression,
                            bloom: Expression)
    extends TernaryExpression with CodegenFallback with ExpectsInputTypes {
  def this(haystack: Expression, needle: Expression) =
    this(haystack, needle, Literal(null, BinaryType))

  override def first: Expression = haystack
  override def second: Expression = needle
  override def third: Expression = bloom
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DdTypes.StringArray, DdTypes.StringArray,
      TypeCollection(BinaryType, BooleanType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val h = haystack.eval(input)
    val n = needle.eval(input)
    if (h == null || n == null) return null
    val hs = h.asInstanceOf[ArrayData]
    val ns = n.asInstanceOf[ArrayData]
    if (ns.numElements() == 0) return true
    if (hs.numElements() == 0) return false
    val blobBytes = bloom.eval(input) match {
      case b: Array[Byte] => b
      case _ => null // absent, null, or the reference's boolean mode flag
    }
    var j = 0
    while (j < ns.numElements()) {
      if (!ns.isNullAt(j)) {
        val v = ns.getUTF8String(j)
        if (blobBytes != null &&
            BloomBlob.mayContain(blobBytes, v).contains(false)) {
          return false // definite miss, skip the exact scan
        }
        var found = false
        var k = 0
        while (!found && k < hs.numElements()) {
          if (!hs.isNullAt(k) && hs.getUTF8String(k).equals(v)) found = true
          k += 1
        }
        if (!found) return false
      }
      j += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "dd_array_contains_all"
}

/** dd_login(url, username, password [, claims_json]) → JWT string, null
  * on failed login (reference /root/reference/src/scalar_function/
  * dd_login.cpp:18-27 — POSTs {username, password, claims:{...}} to
  * url/v1/login and returns the accessToken). Zero-egress here: the url
  * resolves against [[graft.functions.GraftAuth]]'s provider registry
  * instead of the network; claims is a flat JSON object of string
  * fields, copied into the token like BuildLoginJson does. */
case class DdLogin(url: Expression, user: Expression, pass: Expression,
                   claims: Expression)
    extends Expression with CodegenFallback with ExpectsInputTypes {
  def this(url: Expression, user: Expression, pass: Expression) =
    this(url, user, pass, Literal(UTF8String.fromString(""), StringType))

  override def children: Seq[Expression] = Seq(url, user, pass, claims)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private val claimPair = """"([^"]+)"\s*:\s*"([^"]*)"""".r

  override def eval(input: InternalRow): Any = {
    val u = url.eval(input)
    val usr = user.eval(input)
    val pw = pass.eval(input)
    if (u == null || usr == null || pw == null) return null
    val claimStr = claims.eval(input) match {
      case null => ""
      case c => c.toString
    }
    val claimSeq = claimPair.findAllMatchIn(claimStr)
      .map(m => m.group(1) -> m.group(2)).toSeq
    graft.functions.GraftAuth.resolveCall(u.toString)
      .flatMap { case (provider, issuedAt) =>
        provider.login(usr.toString, pw.toString, claimSeq, issuedAt)
      }
      .map(UTF8String.fromString)
      .orNull
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
  override def prettyName: String = "dd_login"
}

/** dd_search(column, values) → always TRUE, never null — a pushdown
  * marker the reference forwards to the server (dd_search.cpp:13). Here
  * it is a Catalyst expression a scan (or the arrow-endpoint source) can
  * recognize and serialize; locally it filters nothing, matching the
  * reference's local behavior. */
case class DdSearch(column: Expression, values: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = column
  override def right: Expression = values
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "dd_search"
}
