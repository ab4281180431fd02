package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs,
  * ordered by (score desc, id asc) for full determinism.
  *
  * This is the scale primitive for similarity search (SURVEY.md §2
  * C6/C7): as a TypedImperativeAggregate it participates in partial
  * aggregation, so each map task ships AT MOST k pairs per group to the
  * reducer — a 1000-executor top-10 over 10¹¹ rows shuffles ~10⁴ rows
  * per query, not 10¹¹. (Window row_number over the full corpus would
  * shuffle everything to one task per query.)
  *
  * Buffer is a flat ArrayBuffer compacted to k whenever it exceeds 4k —
  * amortized O(n log k) with tiny constant factor, trivially
  * serializable for partial-shuffle.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  /** (score desc, id asc): a is strictly better than b. Scores compare
    * via Double.compare — a total order, so sortWith stays a strict weak
    * order even if a NaN slips in (IEEE < / > are all-false on NaN and
    * make TimSort throw). NaN scores are additionally dropped at
    * update(), so they can't occupy top-k slots. */
  @inline private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sortWith(better).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length > 4 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    if (buf.length > 4 * k) compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(better).take(k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val compacted = compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(compacted.length)
    compacted.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_top_k"
}
