package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the temporal operator Spark lacks natively (and the example
  * the scale brief calls out). For each left row, match the greatest
  * right-side timestamp ≤ the left timestamp per key.
  *
  * NOT implemented as an inequality join (which Spark can only execute as a
  * broadcast nested loop — O(|L|·|R|) per key): instead union both sides and
  * take a running `max(right_ts)` window per key — one shuffle on the key,
  * one in-partition sort, O((|L|+|R|) log) total. This is the same plan an
  * ASOF-native engine builds internally.
  */
object AsOf {

  /** Purchase→click attribution over `events`: each purchase joined to the
    * same user's most recent click at-or-before it. Within-timestamp ties
    * order clicks first (= at-or-before semantics, matching ASOF's >=). */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("purchase", "click"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("tsu"),
        (col("event_type") === "click").cast("int").as("is_click"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsu"), desc("is_click"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_tsu",
        max(when(col("is_click") === 1, col("tsu"))).over(w))
      .filter(col("is_click") === 0 && col("last_click_tsu").isNotNull)
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
        date_format(timestamp_micros(col("last_click_tsu")), "yyyy-MM-dd HH:mm:ss").as("c_ts"))
  }

  /** Oracle: DuckDB's native ASOF JOIN — an independent implementation of
    * the same semantics. */
  val purchaseAttributionSql: String =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id,
      |strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
      |strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts
      |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** Purchase→click attribution through the native [[graft.plans.AsofJoin]]
    * exec — same temporal semantics as [[purchaseAttribution]], but carrying
    * right PAYLOAD columns (the click's id and value), which the window
    * formulation cannot: a window only transports expressions reducible
    * through `max`. Clicks are first collapsed to one row per (user, ts)
    * (greatest event_id wins, with that event's value via `max_by`) so the
    * as-of match is unique and the result is deterministic under any
    * partitioning. One shuffle per side, single-pass merge — the plan a
    * temporal engine builds natively. */
  def purchaseAttributionExec(events: DataFrame): DataFrame =
    attributionViaExec(events, leftOuter = false, includeValue = true)

  /** LEFT variant: every purchase emits, unattributed ones with null click
    * columns — the coverage-accounting shape (what fraction of purchases
    * have a prior click) the inner form cannot answer. Same single-merge
    * plan; only the unmatched-row policy differs. */
  def purchaseAttributionOuter(events: DataFrame): DataFrame =
    attributionViaExec(events, leftOuter = true, includeValue = false)

  /** Tolerance in MICROSECONDS for the bounded-lookback variant (24 h) —
    * the production attribution shape: a purchase only attributes to a
    * click within the window, enforced O(1) at emit inside the merge. */
  val TolUs: Long = 24L * 3600 * 1000 * 1000

  /** Bounded-lookback variant: same single-merge plan, plus the
    * `p.ts - c.ts <= 24h` check at emit (see [[graft.plans.AsofJoin]]) —
    * at sf0.01 this keeps ~37% of the unbounded matches, so the bound is
    * genuinely exercised by the hash gate. */
  def purchaseAttributionTol(events: DataFrame): DataFrame =
    attributionViaExec(events, leftOuter = false, includeValue = true,
      toleranceUs = Some(TolUs))

  /** The one purchase/click attribution pipeline the registered exec
    * queries share — inner/outer, the value payload, and the tolerance are
    * the only knobs, so the variants cannot drift. */
  private def attributionViaExec(events: DataFrame, leftOuter: Boolean,
                                 includeValue: Boolean,
                                 toleranceUs: Option[Long] = None): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val aggs = max(col("event_id")).as("click_id") +:
      (if (includeValue) Seq(max_by(col("value"), col("event_id")).as("click_value"))
       else Nil)
    val clicks = events.filter(col("event_type") === "click")
      // one exchange, not two: hash on user_id alone satisfies BOTH the
      // (user, ts) aggregate's clustering (a subset partitioning co-locates
      // every group) and the as-of join's ClusteredDistribution(user_id),
      // so the aggregate output flows into the merge with only a sort
      .repartition(col("user_id"))
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("c_user", "user_id")
    val outCols = Seq(
      col("event_id"), purchases("user_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
      date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("c_ts"),
      col("click_id")) ++ (if (includeValue) Seq(col("click_value")) else Nil)
    graft.plans.AsofJoin.asof(
        purchases, clicks, on = Seq("user_id"), leftTsCol = "ts", rightTsCol = "c_ts",
        leftOuter = leftOuter, tolerance = toleranceUs)
      .select(outCols: _*)
  }

  /** Oracles: DuckDB's native ASOF [LEFT] JOIN against the same
    * deduplicated click table — an independent engine's implementation of
    * the identical semantics, payload included. One builder, same knobs as
    * [[attributionViaExec]], so Scala and SQL cannot drift either. */
  private def attributionSql(leftOuter: Boolean, includeValue: Boolean,
                             toleranceUs: Option[Long] = None): String = {
    val valueAgg = if (includeValue) ",\n             MAX_BY(value, event_id) AS click_value" else ""
    val valueCol = if (includeValue) ", c.click_value" else ""
    val joinKind = if (leftOuter) "ASOF LEFT JOIN" else "ASOF JOIN"
    // the ASOF join picks the single LATEST at-or-before click, so the
    // lookback bound states as a post-filter (inner form only: a filtered
    // outer would drop rows where the exec null-extends)
    val tolFilter = toleranceUs
      .map(t => s"\nWHERE epoch_us(p.ts) - epoch_us(c.c_ts) <= $t").getOrElse("")
    require(tolFilter.isEmpty || !leftOuter,
      "tolerance oracle is only stated for the inner form")
    s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       |c AS (SELECT user_id, ts AS c_ts, MAX(event_id) AS click_id$valueAgg
       |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
       |SELECT p.event_id, p.user_id,
       |strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
       |strftime(c.c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts,
       |c.click_id$valueCol
       |FROM p $joinKind c ON p.user_id = c.user_id AND p.ts >= c.c_ts$tolFilter""".stripMargin
  }

  val purchaseAttributionExecSql: String =
    attributionSql(leftOuter = false, includeValue = true)

  val purchaseAttributionOuterSql: String =
    attributionSql(leftOuter = true, includeValue = false)

  val purchaseAttributionTolSql: String =
    attributionSql(leftOuter = false, includeValue = true, toleranceUs = Some(TolUs))

  /** Price bands for the range join: (label, lo inclusive, hi exclusive). */
  val PriceBands: Seq[(String, Double, Double)] = Seq(
    ("budget", 0.0, 1000.0),
    ("mid", 1000.0, 10000.0),
    ("premium", 10000.0, 50000.0),
    ("luxury", 50000.0, 10000000.0))

  /** Range (interval) join — each lineitem matched to its price band.
    * The band side is tiny and broadcast, so the inequality predicate is
    * evaluated inside a broadcast join (no shuffle of the fact side at
    * all). When BOTH sides are large, the scale plan is to bucket both
    * sides by floor(value/width) on a common grid and equi-join on the
    * bucket with the interval predicate as a post-filter — same output,
    * shuffle-bounded. */
  def priceRangeJoin(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val bands = PriceBands.toDF("band", "lo", "hi")
    lineitem
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        Relational.dsum(col("l_extendedprice")).as("sum_price"))
  }

  val priceRangeJoinSql: String = {
    val values = PriceBands
      .map { case (b, lo, hi) => s"('$b', ${lo}::DOUBLE, ${hi}::DOUBLE)" }
      .mkString(", ")
    s"""WITH bands(band, lo, hi) AS (VALUES $values)
       |SELECT band, COUNT(*) AS n,
       |CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
       |FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
       |GROUP BY band""".stripMargin
  }

  /** Large-large range join on a common bucket grid — the scale path
    * [[priceRangeJoin]]'s doc comment promises. Each interval [lo, hi)
    * explodes to the grid cells it overlaps (`sequence` of floor(lo/w)..
    * floor(hi-ulp/w)); each fact value maps to floor(v/w); the match is an
    * EQUI-join on the cell with the interval predicate as a residual
    * filter — lossless (a value is in an interval iff its cell is one of
    * the interval's cells), and the plan is a shuffled equi-join that
    * scales to two corpus-sized sides where the inequality form can only
    * be a broadcast nested loop. Grid width trades interval fan-out
    * (cells per interval ≈ span/w) against residual selectivity; both are
    * bounded and explicit, the knob a range-partitioned engine exposes.
    * Same aggregate output as priceRangeJoin, so the broadcast and grid
    * formulations check each other. */
  def priceRangeJoinGrid(lineitem: DataFrame, width: Double = 1000.0): DataFrame = {
    require(width > 0.0, s"grid width must be positive: $width")
    val spark = lineitem.sparkSession
    import spark.implicits._
    val bands = PriceBands.toDF("band", "lo", "hi")
      // hi is exclusive, so a grid-aligned interval claims one empty
      // trailing cell — harmless (the residual filter owns exactness;
      // only UNDERclaiming a cell could lose matches)
      .withColumn("cell", explode(sequence(
        floor(col("lo") / width).cast("long"),
        floor(col("hi") / width).cast("long"))))
    lineitem
      .select(col("l_extendedprice"),
        floor(col("l_extendedprice") / width).cast("long").as("cell"))
      .join(bands, "cell")
      .filter(col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        Relational.dsum(col("l_extendedprice")).as("sum_price"))
  }

  /** Oracle: the plain inequality join — DuckDB picks its own range plan;
    * the grid decomposition must be invisible in the result. */
  val priceRangeJoinGridSql: String = priceRangeJoinSql
}
