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

/** KLL buffer: a stack of compactors, level h holding items of weight 2^h.
  * Level capacities shrink geometrically (c = 2/3) toward the bottom, so
  * total memory is O(k) regardless of n. Compaction is DERANDOMIZED: the
  * classic algorithm promotes a uniformly-chosen odd/even half; here each
  * level carries a parity bit that flips per compaction — deterministic
  * (same input stream → same sketch) while alternating the selection so
  * the systematic bias of a fixed parity cancels across compactions (the
  * standard derandomization; rank error stays O(1/k)-class in practice,
  * bounded empirically by KllSpec). NOTE: deterministic per STREAM ORDER,
  * not per multiset — Spark's partial-agg merge order varies with
  * partitioning, so the registered query is rows-only with the
  * order-independent `kll_portable` twin carrying the hash gate.
  */
final class KllBuffer(val k: Int) {
  var n: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  val parity: ArrayBuffer[Int] = ArrayBuffer(0)

  private def height: Int = levels.length
  private def capacity(h: Int): Int =
    math.max(math.ceil(k * math.pow(2.0 / 3.0, (height - 1 - h).toDouble)).toInt, 2)
  private def totalCapacity: Int = (0 until height).map(capacity).sum
  private def size: Int = levels.map(_.length).sum

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1L
    if (size > totalCapacity) compress()
  }

  def merge(other: KllBuffer): Unit = {
    while (height < other.levels.length) { levels += ArrayBuffer.empty[Double]; parity += 0 }
    var h = 0
    while (h < other.levels.length) { levels(h) ++= other.levels(h); h += 1 }
    n += other.n
    while (size > totalCapacity) compress()
  }

  /** Compact the lowest over-capacity level (or the lowest non-empty one if
    * growth changed capacities): sort, promote alternating-parity items
    * with doubled weight, keep an odd leftover in place. */
  private def compress(): Unit = {
    var h = 0
    while (h < height && levels(h).length <= capacity(h)) h += 1
    // only called with size > totalCapacity, so some level is over its
    // (≥2) capacity — the guard keeps a stale call from spinning
    if (h == height) return
    if (h == height - 1) { levels += ArrayBuffer.empty[Double]; parity += 0 }
    val buf = levels(h)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val even = sorted.length - (sorted.length % 2)
    buf.clear()
    if (even < sorted.length) buf += sorted(sorted.length - 1) // odd leftover stays
    var i = parity(h)
    while (i < even) { levels(h + 1) += sorted(i); i += 2 }
    parity(h) = 1 - parity(h)
  }

  /** Weighted-rank quantile: smallest retained value whose cumulative
    * weight reaches ceil(q·n) (integer threshold arithmetic — cum·den ≥
    * num·n — so no float rank thresholds enter). */
  def quantiles(probs: Seq[(Long, Long)]): Array[Double] = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < height) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    probs.map { case (num, den) =>
      var cum = 0L
      var i = 0
      var out = if (sorted.nonEmpty) sorted.last._1 else Double.NaN
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum * den >= num * n) { out = sorted(i)._1; found = true }
        i += 1
      }
      out
    }.toArray
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + levels.map(b => 8 + b.length * 8).sum)
    bb.putInt(k); bb.putLong(n); bb.putInt(height)
    var h = 0
    while (h < height) {
      bb.putInt(parity(h)); bb.putInt(levels(h).length)
      levels(h).foreach(bb.putDouble)
      h += 1
    }
    bb.array()
  }
}

object KllBuffer {
  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt)
    buf.n = bb.getLong
    val height = bb.getInt
    buf.levels.clear(); buf.parity.clear()
    var h = 0
    while (h < height) {
      buf.parity += bb.getInt
      val len = bb.getInt
      val lvl = new ArrayBuffer[Double](len)
      var i = 0
      while (i < len) { lvl += bb.getDouble; i += 1 }
      buf.levels += lvl
      h += 1
    }
    buf
  }
}

/** One-pass mergeable rank-quantile sketch as a native aggregate — the
  * KLL sketch (Karnin, Lang, Liberty, "Optimal Quantile Approximation in
  * Streams", FOCS'16), derandomized (alternating compaction parity).
  * Complements the moment sketch ([[graft.operators.Moments]]): moments +
  * Cornish-Fisher assume near-normal shape; KLL's guarantee is on RANK, so
  * heavy-tailed columns keep their bound.
  *
  * Scale shape: exactly the CMS/moments contract — the buffer is O(k)
  * per group, participates in partial aggregation (map-side partial
  * sketches, merged on the reduce side: the merge IS the sketch union),
  * and `serialize` ships only retained items, so a 1000-executor rollup
  * moves O(groups·k) doubles, never raw values. Output: one
  * array<double> of quantile estimates per group, in `probs` order.
  */
case class KllAgg(
    value: Expression,
    k: Int,
    probs: Seq[(Long, Long)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // fail at ANALYSIS, not as a mid-job ClassCastException in update()
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (value.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kll expects a DOUBLE value column, got ${value.dataType}")

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = value.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KllBuffer): Any =
    new GenericArrayData(buf.quantiles(probs))

  override def serialize(buf: KllBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuffer = KllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllAgg =
    copy(value = newChildren(0))
}

object KllAgg {
  /** Column API: KLL quantile estimates (probs as num/den fractions) as
    * array<double> in probs order. */
  def kll(value: Column, k: Int, probs: Seq[(Long, Long)]): Column =
    Bridge.column(KllAgg(Bridge.expression(value), k, probs).toAggregateExpression())
}
