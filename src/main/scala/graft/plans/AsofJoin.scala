package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** As-of join as a first-class physical operator — the whole-operator rung
  * of the extension ladder (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`), complementing the expression rung (DotProductFF) and the
  * optimizer-rule rung (CosineFusionRule / CosinePrenormRule).
  *
  * Semantics (the DuckDB `ASOF [LEFT] JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts` contract, ⇐ the temporal-join surface the reference's
  * event queries compose by hand): for each left row, the single right row
  * with the same key and the greatest ts ≤ the left ts. NULL keys and NULL
  * timestamps never match. Inner (default) drops unmatched left rows;
  * `leftOuter` emits them with null right columns. Among right rows TIED
  * on (key, ts) the retained row is unspecified — the SQL ASOF contract
  * (DuckDB likewise picks an arbitrary tie); pre-aggregate the right side
  * to one row per (key, ts) for a deterministic result (as the registered
  * attribution queries do).
  *
  * `tolerance` (production attribution's lookback bound) additionally
  * requires `l.ts - r.ts <= tolerance` (inclusive), in the timestamp's
  * NATIVE units — microseconds for TimestampType. The check is O(1) at
  * emit: the merge already holds the latest at-or-before right row, and if
  * THAT row is beyond the tolerance every earlier row is further still, so
  * no extra state or rescan is needed. A tolerance-failed left row behaves
  * exactly like an unmatched one (dropped, or null-extended under
  * `leftOuter`).
  *
  * Why an exec node and not the window composition ([[graft.operators.AsOf
  * .purchaseAttribution]] keeps that formulation): the window trick carries
  * only expressions reducible through `max(...)` — arbitrary right PAYLOAD
  * columns require packing/unpacking structs and a union of both inputs.
  * The exec declares what a temporal engine declares: hash-clustered
  * distribution on the key for BOTH children and a (key, ts) sort order,
  * then streams each co-partition pair through one merge pass holding ONE
  * buffered right row — no per-key buffering, no broadcast nested loop
  * (Spark's only native plan for the inequality form). Cost at 100 TB:
  * exactly one shuffle per side (co-partitioned and AQE-coalesced like any
  * sort-merge join), O(|L|+|R|) merge, O(1) state per partition.
  */
case class AsofJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    leftOuter: Boolean,
    left: LogicalPlan,
    right: LogicalPlan,
    tolerance: Option[Long] = None) extends BinaryNode {
  // left-outer: unmatched left rows emit null right columns
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** `left ASOF JOIN right ON keys AND left.ts >= right.ts`, returning
    * left.* ++ right.*. Key/ts columns are resolved by name against each
    * side; the right side's attributes are freshened first so both sides
    * may derive from the same base table (the self-join case Spark's
    * analyzer would otherwise see as duplicate expression ids). Column
    * NAMES are not deduplicated — alias overlapping right columns before
    * joining, exactly as with Spark's own `join`. */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTsCol: String, rightTsCol: String,
           leftOuter: Boolean = false,
           tolerance: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "as-of join requires at least one equality key")
    tolerance.foreach(t => require(t >= 0, s"as-of tolerance must be >= 0: $t"))
    val spark = left.sparkSession
    ensureStrategy(spark)
    // .as(c) mints a fresh exprId per column, detaching the right side's
    // lineage from a shared base table
    val r = right.select(right.columns.map(c => right(c).as(c)).toIndexedSeq: _*)
    val lKeys = on.map(c => Bridge.expression(left(c)))
    val rKeys = on.map(c => Bridge.expression(r(c)))
    val node = AsofJoin(
      lKeys, rKeys,
      Bridge.expression(left(leftTsCol)), Bridge.expression(r(rightTsCol)),
      leftOuter, Bridge.analyzed(left), Bridge.analyzed(r), tolerance)
    Bridge.ofRows(spark, node)
  }

  /** Idempotently register the planner strategy on a running session —
    * `extraStrategies` is the post-construction analog of
    * `injectPlannerStrategy` ([[graft.functions.GraftExtensions]] does the
    * construction-time registration). */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(lk, rk, lts, rts, outer, l, r, tol) =>
      AsofJoinExec(lk, rk, lts, rts, outer, planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  // the sort-merge-join contract: both children clustered on the equality
  // keys (EnsureRequirements co-partitions them, AQE coalesces both sides
  // together) and sorted by (keys, ts) so one forward pass suffices
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge streams left rows in child order, which the child guarantees
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    require(keyTypes == rightKeys.map(_.dataType),
      s"as-of key types differ: $keyTypes vs ${rightKeys.map(_.dataType)}")
    require(leftTs.dataType == rightTs.dataType,
      s"as-of ts types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
    val tsType = leftTs.dataType
    // the tolerance subtraction reads the raw long repr (micros for
    // timestamps) — restrict to types stored as long internally
    if (tolerance.isDefined) {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      require(Seq(TimestampType, TimestampNTZType, LongType).contains(tsType),
        s"as-of tolerance requires a long-backed ts type, got $tsType")
    }
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val allOut = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of children not co-partitioned: ${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    val outer = leftOuter
    val nRightCols = rOut.size
    val tol = tolerance
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      new AsofMergeIterator(
        lIter, rIter,
        UnsafeProjection.create(lKeys, lOut), UnsafeProjection.create(rKeys, rOut),
        UnsafeProjection.create(Seq(lTs), lOut), UnsafeProjection.create(Seq(rTs), rOut),
        RowOrdering.createNaturalAscendingOrdering(keyTypes),
        RowOrdering.createNaturalAscendingOrdering(Seq(tsType)),
        UnsafeProjection.create(allOut, allOut),
        outer, nRightCols, tol)
    }
  }
}

/** One forward pass over two (key, ts)-sorted partitions. State: the
  * buffered right cursor plus one copied "latest matching right row" — the
  * as-of invariant is that once the right cursor passes a left row's ts,
  * the answer for that row (and every later left row of the same key) is
  * already behind the cursor, so a single retained copy suffices. */
private final class AsofMergeIterator(
    lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection, rKeyProj: UnsafeProjection,
    lTsProj: UnsafeProjection, rTsProj: UnsafeProjection,
    keyOrd: BaseOrdering, tsOrd: BaseOrdering,
    resultProj: UnsafeProjection,
    leftOuter: Boolean, nRightCols: Int,
    tolerance: Option[Long]) extends Iterator[InternalRow] {

  // -1 = unbounded; the exec restricts tolerant joins to long-backed ts
  private[this] val tolUnits: Long = tolerance.getOrElse(-1L)

  private[this] val joined = new JoinedRow
  private[this] val nullRight =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nRightCols)
  // right cursor (projection buffers are live only until the next advance)
  private[this] var rRow: InternalRow = _
  private[this] var rKey: UnsafeRow = _
  private[this] var rTsRow: UnsafeRow = _
  // latest right row whose key matched some already-passed left key (copied
  // out of the cursor buffers — the cursor moves on, the match must not)
  private[this] var lastMatch: InternalRow = _
  private[this] var lastMatchKey: UnsafeRow = _
  private[this] var lastMatchTsUnits: Long = _
  private[this] var pending: InternalRow = _
  private[this] var pendingValid = false

  advanceRight()

  override def hasNext: Boolean = {
    if (!pendingValid) pendingValid = findNext()
    pendingValid
  }

  override def next(): InternalRow = {
    if (!hasNext) throw new NoSuchElementException("empty as-of iterator")
    pendingValid = false
    pending
  }

  /** Move the right cursor to the next row with non-null key and ts. */
  private def advanceRight(): Unit = {
    rRow = null
    while (rRow == null && rIter.hasNext) {
      val r = rIter.next()
      val k = rKeyProj(r)
      if (!k.anyNull) {
        val t = rTsProj(r)
        if (!t.isNullAt(0)) { rRow = r; rKey = k; rTsRow = t }
      }
    }
  }

  private def findNext(): Boolean = {
    while (lIter.hasNext) {
      val l = lIter.next()
      val lKey = lKeyProj(l)
      var matched = false
      if (!lKey.anyNull) {
        val lTsRow = lTsProj(l)
        if (!lTsRow.isNullAt(0)) {
          // consume every right row at-or-before (lKey, lTs)
          var scanning = rRow != null
          while (scanning) {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 || (kc == 0 && tsOrd.compare(rTsRow, lTsRow) <= 0)) {
              if (kc == 0) {
                lastMatch = rRow.copy()
                lastMatchKey = rKey.copy()
                if (tolUnits >= 0) lastMatchTsUnits = rTsRow.getLong(0)
              }
              advanceRight()
              scanning = rRow != null
            } else scanning = false
          }
          if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0 &&
              // lookback bound: the latest at-or-before row is the CLOSEST
              // one, so if it misses the tolerance every earlier row does
              // too — O(1) completes the bounded-as-of check
              (tolUnits < 0 || lTsRow.getLong(0) - lastMatchTsUnits <= tolUnits)) {
            pending = resultProj(joined(l, lastMatch))
            matched = true
          }
        }
      }
      if (matched) return true
      if (leftOuter) {
        // LEFT semantics: an unmatched left row — including null key/ts,
        // where the as-of predicate simply fails — emits null right columns
        pending = resultProj(joined(l, nullRight))
        return true
      }
    }
    false
  }
}
