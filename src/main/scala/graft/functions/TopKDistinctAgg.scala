package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** [[TopKAgg]] with DISTINCT ids: top-k ids by their best (score desc,
  * id asc) entry, duplicates collapsing to one slot.
  *
  * The NN-descent candidate cap needs "top `cap` DISTINCT neighbors by
  * hash order" — with plain TopKAgg that requires a full `.distinct()`
  * of the neighbors-of-neighbors join FIRST (an O(N·(2K)²)-row exchange,
  * the dominant shuffle of a descent round, measured ~25% of the 10×
  * build). Because a duplicate candidate always carries the identical
  * score (the score is a pure function of the pair), deduping INSIDE the
  * bounded aggregate buffer yields the exact same top-k while the
  * partial aggregation caps every map task's emission at k entries per
  * key — one k-bounded shuffle replaces the distinct exchange + the
  * cap's second exchange. */
case class TopKDistinctAgg(
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
    StructField("id", LongType, nullable = false))))

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Best-sorted, id-deduped (first = best per id), truncated to `n`. */
  private def topDistinct(buf: ArrayBuffer[(Double, Long)],
                          n: Int): ArrayBuffer[(Double, Long)] = {
    val seen = new java.util.HashSet[Long]()
    val out = new ArrayBuffer[(Double, Long)](math.min(n, buf.length))
    val it = buf.sortWith(better).iterator
    while (it.hasNext && out.length < n) {
      val e = it.next()
      if (seen.add(e._2)) out += e
    }
    out
  }

  /** Keep the buffer bounded: amortized dedup + truncation at 4k. */
  private def compact(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > 4 * k) {
      val top = topDistinct(buf, k)
      buf.clear()
      buf ++= top
    }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = topDistinct(buf, k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val top = topDistinct(buf, k)
    val bb = ByteBuffer.allocate(4 + top.length * 16)
    bb.putInt(top.length)
    top.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n + 1)
    var j = 0
    while (j < n) { buf += ((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKDistinctAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKDistinctAgg {
  /** Column API: top-k DISTINCT ids (score desc, id asc). */
  def topKDistinct(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKDistinctAgg(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
