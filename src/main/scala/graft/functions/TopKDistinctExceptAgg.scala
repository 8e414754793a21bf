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

/** [[TopKDistinctAgg]] minus an EXCLUSION set carried in the same group:
  * rows with `cur = false` are candidates (top-k DISTINCT ids by score
  * desc, id asc — ids consume cap slots whether or not they are later
  * excluded); rows with `cur = true` contribute their id to the exclusion
  * set; eval emits the capped candidate ids NOT in the exclusion set.
  *
  * This is the NN-descent round's `cap-then-anti-join` tail fused into one
  * aggregation (r15 verdict item 1): the pre-r16 spelling paid a
  * TopKDistinctAgg exchange keyed on node AND a (node, nbr) anti-join
  * exchange against the current-edge set to drop already-scored pairs —
  * with the current edges unioned into the same group, both ride ONE
  * node-keyed exchange and the anti-join operator disappears. Exact by the
  * same argument as TopKDistinctAgg (a duplicate candidate carries the
  * identical pure-function score), plus: exclusion happens at EVAL, after
  * every partial buffer merged, so a candidate capped in one map task and
  * a current edge seen in another still meet — and the cap itself never
  * consults the exclusion set, exactly like the anti-join it replaces (an
  * excluded id still burns its cap slot). The exclusion set is bounded by
  * the group's current-edge degree (≤ 2·kBuild by the symmetrized-graph
  * construction), so partial buffers stay O(k).
  */
case class TopKDistinctExceptAgg(
    score: Expression,
    id: Expression,
    cur: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKDistinctExceptAgg.Buf] {
  import TopKDistinctExceptAgg.Buf

  override def children: Seq[Expression] = Seq(score, id, cur)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buf =
    Buf(new ArrayBuffer[(Double, Long)](k + 1), new java.util.HashSet[Long]())

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

  /** Keep the candidate buffer bounded: amortized dedup + truncation at 4k.
    * NEVER consults the exclusion set — the cap is over all candidates. */
  private def compact(buf: Buf): Unit =
    if (buf.cands.length > 4 * k) {
      val top = topDistinct(buf.cands, k)
      buf.cands.clear()
      buf.cands ++= top
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    val c = cur.eval(input)
    if (i != null && c != null) {
      if (c.asInstanceOf[Boolean]) buf.excl.add(i.asInstanceOf[Long])
      else if (s != null) {
        buf.cands += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
        compact(buf)
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.cands ++= other.cands
    buf.excl.addAll(other.excl)
    compact(buf)
    buf
  }

  override def eval(buf: Buf): Any = {
    val top = topDistinct(buf.cands, k)
    new GenericArrayData(
      top.collect { case (_, i) if !buf.excl.contains(i) => i }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val top = topDistinct(buf.cands, k)
    val bb = ByteBuffer.allocate(8 + top.length * 16 + buf.excl.size * 8)
    bb.putInt(top.length)
    top.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.putInt(buf.excl.size)
    buf.excl.forEach(i => bb.putLong(i))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val cands = new ArrayBuffer[(Double, Long)](n + 1)
    var j = 0
    while (j < n) { cands += ((bb.getDouble, bb.getLong)); j += 1 }
    val m = bb.getInt
    val excl = new java.util.HashSet[Long](math.max(4, m * 2))
    j = 0
    while (j < m) { excl.add(bb.getLong); j += 1 }
    Buf(cands, excl)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDistinctExceptAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDistinctExceptAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKDistinctExceptAgg =
    copy(score = newChildren(0), id = newChildren(1), cur = newChildren(2))
}

object TopKDistinctExceptAgg {
  /** (candidate pool, exclusion-id set) — the aggregate's typed buffer. */
  case class Buf(cands: ArrayBuffer[(Double, Long)], excl: java.util.HashSet[Long])

  /** Column API: top-k DISTINCT candidate ids (score desc, id asc; rows
    * with cur = false), minus the ids contributed by cur = true rows. */
  def topKDistinctExcept(score: Column, id: Column, cur: Column, k: Int): Column =
    Bridge.column(TopKDistinctExceptAgg(Bridge.expression(score),
      Bridge.expression(id), Bridge.expression(cur), k)
      .toAggregateExpression())
}
