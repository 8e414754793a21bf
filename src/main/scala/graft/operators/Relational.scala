package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-core relational operators (aggregation, joins, windows).
  *
  * These prove the fundamentals the reference leans on Neo4j/Cypher for —
  * re-expressed as declarative DataFrame plans so Catalyst handles pushdown,
  * join strategy, and AQE does runtime re-planning at scale.
  *
  * Scale notes are per-operator; dims (`region`/`nation`/`supplier`) are
  * always broadcast so only fact-fact joins shuffle.
  */
object Relational {

  /** Exact, order-independent money sum: cast to decimal, sum, back to
    * double. Double sums vary with partition order; decimal sums don't, so
    * results are stable across cluster sizes AND hash-match the oracle. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")

  /** Pricing summary (TPC-H Q1 shape): filter → groupBy → 8 aggregates.
    * Map-side partial aggregation: one shuffle of ~|groups| rows. */
  def q1(lineitem: DataFrame): DataFrame = {
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order")
      )
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
  }

  /** Shipping-priority top-k (TPC-H Q3 shape): selective filters push to the
    * parquet scan; customer⋈orders then ⋈lineitem shuffles on the join keys;
    * top-k is a TakeOrdered, no global sort. */
  def q3(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** Local-supplier revenue (TPC-H Q5 shape): 6-way join. region/nation/
    * supplier are broadcast (dims); only customer⋈orders⋈lineitem shuffle. */
  def q5(region: DataFrame, nation: DataFrame, customer: DataFrame,
         orders: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val dims = broadcast(
      region.filter(col("r_name") === "ASIA")
        .join(nation, col("n_regionkey") === col("r_regionkey")))
    customer
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Top-3 orders per customer by price: single shuffle on o_custkey, then
    * in-partition sort — the scalable per-group top-k shape. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn").cast("long").as("rn"))
  }

  /** Global top-k by computed expression — TakeOrdered, no full sort. */
  def topKGlobal(lineitem: DataFrame, k: Int = 20): DataFrame =
    lineitem
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("val"))
      .orderBy(desc("val"), col("l_orderkey"), col("l_linenumber"))
      .limit(k)

  /** Customers with an open order — left-semi join (EXISTS). */
  def customersWithOpenOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
      orders.filter(col("o_orderstatus") === "O"),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Customers with no FINISHED order — left-anti join (NOT EXISTS). The
    * status filter keeps the result non-trivial at every test SF (every
    * customer in the generator has at least one order). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
      orders.filter(col("o_orderstatus") === "F"),
      col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Customer counts/balances rolled up nation→region→grand-total. */
  def custRollup(region: DataFrame, nation: DataFrame, customer: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))

  /** Sessionization over `events`: gap > 30 min starts a new session.
    * One shuffle on user_id; lag + running sum in-partition. The streaming
    * analog is graft.streaming.Streams.sessionize. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("tsu", unix_micros(col("ts")))
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("tsu") - col("prev") > gapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
  }

  /** Sliding-frame window: 4-order moving average of spend per customer
    * (ROWS 3 PRECEDING..CURRENT). Decimal-sum/count keeps the frame
    * arithmetic exact and engine-portable. */
  def movingAvg(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      (sum(col("o_totalprice").cast(DecimalType(38, 6))).over(w).cast("double") /
        count(lit(1)).over(w)).as("moving_avg"))
  }

  val movingAvgSql: String =
    """SELECT o_custkey, o_orderkey,
      |CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,6))) OVER w AS DOUBLE)
      |  / COUNT(*) OVER w AS moving_avg
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Aggregate-then-join: customers above their nation's average balance.
    * The per-nation aggregate is tiny → broadcast back against the fact —
    * the scalable shape for every "compare to group statistic" query. */
  def aboveNationAvg(customer: DataFrame): DataFrame = {
    val navg = customer.groupBy(col("c_nationkey").as("nk"))
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("nation_avg"))
    customer
      .join(broadcast(navg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("nation_avg"))
  }

  val aboveNationAvgSql: String =
    """WITH navg AS (
      |  SELECT c_nationkey AS nk,
      |    CAST(SUM(CAST(CAST(c_acctbal AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS nation_avg
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
      |FROM customer JOIN navg ON c_nationkey = nk
      |WHERE c_acctbal > nation_avg""".stripMargin

  /** Exact per-group median (lower-middle for even counts) via rank — no
    * percentile-interpolation semantics to disagree on between engines, and
    * the rank formulation distributes (one shuffle, in-partition sort). */
  def medianBalance(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
    customer
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("c_nationkey")))
      .filter(col("rn") === ((col("cnt") + 1) / 2).cast("long"))
      .select(col("c_nationkey"), col("c_acctbal").as("median_bal"))
  }

  val medianBalanceSql: String =
    """SELECT c_nationkey, c_acctbal AS median_bal FROM (
      |  SELECT c_nationkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt
      |  FROM customer)
      |WHERE rn = (cnt + 1) // 2""".stripMargin

  /** Week-over-week growth per event type — the standard reporting shape
    * (lag window over the tiny per-week rollup, never over raw events):
    * epoch-week bucketing keeps both engines' week boundaries identical
    * (the events_cohort recipe), growth is one IEEE division. */
  def eventsWow(events: DataFrame): DataFrame = {
    val wk = (unix_micros(col("ts")) / lit(604800000000L)).cast("long")
    val weekly = events.select(col("event_type"), wk.as("epoch_week"))
      .groupBy(col("event_type"), col("epoch_week")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("epoch_week")
    weekly
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev_n").isNotNull)
      .withColumn("wow", col("n").cast("double") / col("prev_n").cast("double"))
      .select(col("event_type"), col("epoch_week"), col("n"), col("prev_n"), col("wow"))
  }

  val eventsWowSql: String =
    """WITH weekly AS (
      |  SELECT event_type, CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS epoch_week,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, epoch_week, n,
      |    lag(n) OVER (PARTITION BY event_type ORDER BY epoch_week) AS prev_n
      |  FROM weekly)
      |SELECT event_type, epoch_week, n, prev_n,
      |  CAST(n AS DOUBLE) / CAST(prev_n AS DOUBLE) AS wow
      |FROM l WHERE prev_n IS NOT NULL""".stripMargin

  /** ANALYZE-style column profile — the table statistics every optimizer
    * and every data-quality dashboard wants: row count, distinct count,
    * min/max per key column, emitted as one row per column via a stack.
    * All three distinct aggregates ride ONE Expand-based aggregation pass
    * (Spark's multi-distinct rewrite), not three scans. */
  def tableProfile(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      count(lit(1)).as("n"),
      countDistinct(col("l_orderkey")).as("d_ok"),
      min(col("l_orderkey")).as("mn_ok"), max(col("l_orderkey")).as("mx_ok"),
      countDistinct(col("l_partkey")).as("d_pk"),
      min(col("l_partkey")).as("mn_pk"), max(col("l_partkey")).as("mx_pk"),
      countDistinct(col("l_suppkey")).as("d_sk"),
      min(col("l_suppkey")).as("mn_sk"), max(col("l_suppkey")).as("mx_sk"))
    .selectExpr("""stack(3,
      'l_orderkey', n, d_ok, mn_ok, mx_ok,
      'l_partkey',  n, d_pk, mn_pk, mx_pk,
      'l_suppkey',  n, d_sk, mn_sk, mx_sk)
      AS (column_name, n_rows, n_distinct, min_v, max_v)""")

  val tableProfileSql: String =
    """WITH a AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(DISTINCT l_orderkey) AS d_ok, MIN(l_orderkey) AS mn_ok, MAX(l_orderkey) AS mx_ok,
      |    COUNT(DISTINCT l_partkey) AS d_pk, MIN(l_partkey) AS mn_pk, MAX(l_partkey) AS mx_pk,
      |    COUNT(DISTINCT l_suppkey) AS d_sk, MIN(l_suppkey) AS mn_sk, MAX(l_suppkey) AS mx_sk
      |  FROM lineitem)
      |SELECT 'l_orderkey' AS column_name, n AS n_rows, d_ok AS n_distinct, mn_ok AS min_v, mx_ok AS max_v FROM a
      |UNION ALL
      |SELECT 'l_partkey', n, d_pk, mn_pk, mx_pk FROM a
      |UNION ALL
      |SELECT 'l_suppkey', n, d_sk, mn_sk, mx_sk FROM a""".stripMargin

  /** Forecast revenue change (TPC-H Q6 shape) — THE filter-pushdown
    * benchmark: three conjunctive predicates all land in the parquet
    * scan (`PushedFilters` in explain), then one decimal-exact sum. No
    * join, no wide shuffle — the query is scan-bound by construction. */
  def q6(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(CAST(l_extendedprice * l_discount AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin

  /** Returned-item revenue per customer (TPC-H Q10 shape): the
    * return-flag filter pushes to the lineitem scan, the two fact joins
    * shuffle on their keys, and the per-customer revenue rollup feeds a
    * TakeOrderedAndProject top-k (never a global sort). */
  def q10(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
          topN: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(topN)

  def q10Sql(topN: Int = 20): String =
    s"""SELECT c_custkey, c_mktsegment,
       |  CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_mktsegment
       |ORDER BY revenue DESC, c_custkey LIMIT $topN""".stripMargin

  /** Promotion revenue share (TPC-H Q14 shape): conditional aggregation
    * over a broadcast dimension join — promo share = promo revenue /
    * total revenue, both accumulated decimal-exact in one pass. */
  def q14(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      .withColumn("promo_share", col("promo_revenue") / col("total_revenue"))

  val q14Sql: String =
    """SELECT
      |  CAST(SUM(CAST(CAST(CASE WHEN p_type = 'PROMO'
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue,
      |  CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
      |  CAST(SUM(CAST(CAST(CASE WHEN p_type = 'PROMO'
      |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) /
      |  CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** Small-quantity-order revenue (TPC-H Q17 shape): correlated aggregate
    * de-correlated into a per-part average joined back to the fact — the
    * aggregate side is |parts|-sized, broadcast when it fits. */
  def q17(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val avgQty = lineitem.groupBy(col("l_partkey").as("pk"))
      .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    lineitem
      .join(broadcast(part.filter(col("p_brand") === "Brand#1")),
        col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  val q17Sql: String =
    """WITH a AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT
      |CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) / CAST(7.0 AS DOUBLE) AS avg_yearly,
      |COUNT(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
      |JOIN a ON l_partkey = pk
      |WHERE l_quantity < CAST(0.5 AS DOUBLE) * avg_qty""".stripMargin

  /** Large-volume customers (TPC-H Q18 shape): HAVING over a fact rollup,
    * then join back to dimensions, top-k. */
  def q18(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
          minQty: Double = 150.0): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)
  }

  def q18Sql(minQty: Double = 150.0): String =
    s"""WITH big AS (
       |  SELECT l_orderkey,
       |    CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) > $minQty)
       |SELECT c_custkey, c_name, o_orderkey,
       |strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, sum_qty
       |FROM orders JOIN big ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Full cube over (segment, orderstatus): every grouping-set combination
    * in one pass (Expand + single aggregation). */
  def segmentCube(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  val segmentCubeSql: String =
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
      |CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY CUBE(c_mktsegment, o_orderstatus)""".stripMargin

  /** Set operations: customers who have ordered but have no OPEN order —
    * EXCEPT over distinct projections, compiles to anti-joins. (Non-trivial
    * at every test SF, unlike set differences over dimension keys.) */
  def setOps(orders: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("custkey")).distinct()
      .exceptAll(orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey")).distinct())

  val setOpsSql: String =
    """SELECT DISTINCT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin

  /** Pivot: per-source document counts spread across language columns —
    * groupBy + pivot compiles to one aggregation with conditional counts. */
  def langPivot(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("source"))
      .pivot("lang", Seq("en", "de", "es", "fr", "zh"))
      .count()
      .na.fill(0L, Seq("en", "de", "es", "fr", "zh"))

  val langPivotSql: String =
    """SELECT source,
      |CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
      |CAST(COUNT(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
      |CAST(COUNT(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
      |CAST(COUNT(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
      |CAST(COUNT(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
      |FROM documents GROUP BY source""".stripMargin

  /** Semi-structured ingestion: parse the JSON `props` column and aggregate
    * the extracted field — get_json_object stays inside codegen; at scale
    * prefer from_json with an explicit schema once fields stabilize. */
  def eventsJson(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  val eventsJsonSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Fixed-width histogram of order prices — the data-profiling primitive
    * (one groupBy on the bucket id; at scale this is how you choose join
    * strategies and detect skew before running the real query). */
  def priceHistogram(orders: DataFrame, width: Double = 20000.0): DataFrame =
    orders
      .groupBy(floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .withColumn("bucket_lo", col("bucket") * width)

  def priceHistogramSql(width: Double = 20000.0): String =
    s"""SELECT CAST(FLOOR(o_totalprice / $width) AS BIGINT) AS bucket, COUNT(*) AS n,
       |CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
       |CAST(FLOOR(o_totalprice / $width) AS BIGINT) * $width AS bucket_lo
       |FROM orders GROUP BY 1""".stripMargin

  /** Ordered string aggregation: nations per region as a deterministic
    * comma-joined list (collect → sort → join; sorting inside the row makes
    * the result independent of partitioning). */
  def nationsPerRegion(region: DataFrame, nation: DataFrame): DataFrame =
    nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))

  val nationsPerRegionSql: String =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |COUNT(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** Daily active users + next-day retention: distinct (day, user) rollup
    * self-joined one day forward — two shuffles total, both on user-sized
    * data, the standard product-analytics shape. */
  /** Weekly cohort retention matrix — the standard product-analytics
    * rollup next to day-over-day retention: users grouped by first-seen
    * week, distinct actives counted per (cohort, weeks-since) cell. Weeks
    * are integer `epoch_days // 7` (engine-portable exactly; calendar
    * date_trunc('week') semantics differ subtly across engines). Two
    * user-keyed shuffles + one cell aggregate — linear at any event
    * volume, the matrix itself is O(weeks²). */
  def cohortMatrix(events: DataFrame): DataFrame = {
    // `div`, not `/`: Spark's Column `/` promotes integrals to DOUBLE
    val week = expr("unix_micros(ts) div 86400000000 div 7")
    val uw = events.select(col("user_id"), week.cast("long").as("w")).distinct()
    val cohorts = uw.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
    uw.join(cohorts, "user_id")
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val cohortMatrixSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS w FROM events),
      |c AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id)
      |SELECT cw AS cohort_week, w - cw AS weeks_since,
      |       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
      |FROM uw JOIN c ON uw.user_id = c.user_id
      |GROUP BY cw, w - cw""".stripMargin

  def retention(events: DataFrame): DataFrame = {
    val du = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    du.as("a")
      .join(du.as("b"),
        col("b.user_id") === col("a.user_id") && col("b.day") === date_add(col("a.day"), 1),
        "left_outer")
      .groupBy(col("a.day").as("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("b.day").isNotNull, 1L).otherwise(0L)).as("returned_next_day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("returned_next_day"))
  }

  val retentionSql: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
      |SELECT strftime(a.day, '%Y-%m-%d') AS day, COUNT(*) AS dau,
      |CAST(SUM(CASE WHEN b.day IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS returned_next_day
      |FROM du a LEFT JOIN du b ON b.user_id = a.user_id AND b.day = a.day + 1
      |GROUP BY a.day""".stripMargin

  /** Loose funnel (view → click → purchase ordered by first occurrence):
    * per-user min timestamps, then one global rollup — sequence analytics
    * without any per-user sort. */
  def funnel(events: DataFrame): DataFrame = {
    val mins = events
      .withColumn("tsu", unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("tsu"))).as("tv"),
        min(when(col("event_type") === "click", col("tsu"))).as("tc"),
        min(when(col("event_type") === "purchase", col("tsu"))).as("tp"))
    mins.agg(
      sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("tv").isNotNull && col("tc").isNotNull && col("tc") > col("tv"), 1L)
        .otherwise(0L)).as("n_view_click"),
      sum(when(col("tv").isNotNull && col("tc").isNotNull && col("tp").isNotNull &&
          col("tc") > col("tv") && col("tp") > col("tc"), 1L)
        .otherwise(0L)).as("n_full_funnel"))
  }

  val funnelSql: String =
    """WITH mins AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
      |    MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
      |  FROM events GROUP BY user_id)
      |SELECT
      |CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |CAST(SUM(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL AND tc > tv THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
      |CAST(SUM(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
      |          AND tc > tv AND tp > tc THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM mins""".stripMargin

  /** Tumbling 1-hour event-time window aggregation (batch form). */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  /** Event-rate spike detection — the monitoring primitive over an event
    * feed: hourly counts per type, compared against that type's median
    * hourly rate; hours running over 1.5x the median are flagged. The
    * median is the exact lower median via rank (no interpolation — engine
    * quantile interpolation differs), and the threshold is the integer
    * predicate 2n > 3*median, so the whole operator is hash-exact. One
    * shuffle for the rollup; the tiny per-type medians table broadcasts
    * back over it. */
  def eventSpikes(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("n"), col("hour"))
    val medians = hourly
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("n").as("med_n"))
    hourly.join(broadcast(medians), "event_type")
      .filter(col("n") * 2 > col("med_n") * 3)
      .select(col("event_type"), col("hour"), col("n"), col("med_n"))
  }

  /** Z-score anomaly detection over hourly event rates — the variance
    * companion to `eventSpikes`' median gate (classic ops-metrics
    * monitoring). Determinism: hourly counts are integers, so the mean is
    * one exact-integer division and the population variance is the
    * all-integer identity (n·Σx² − (Σx)²)/n² — no summation-order
    * dependence ever enters; sqrt and the final compare are
    * correctly-rounded IEEE on both engines. Zero-variance groups are
    * excluded BEFORE the z division (NaN compares diverge across engines).
    * At extreme scale the Σx² rollup would ride DECIMAL(38,0). One shuffle
    * for the rollup, O(types) stats broadcast back. */
  def eventZscores(events: DataFrame, thresh: Double = 2.0): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type")).agg(
      count(lit(1)).as("nh"), sum(col("n")).as("s"), sum(col("n") * col("n")).as("ss"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("meanv", col("s").cast("double") / col("nh").cast("double"))
      .withColumn("varv",
        (col("nh") * col("ss") - col("s") * col("s")).cast("double")
          / (col("nh") * col("nh")).cast("double"))
      .filter(col("varv") > 0)
      .withColumn("z", (col("n").cast("double") - col("meanv")) / sqrt(col("varv")))
      .filter(abs(col("z")) > thresh)
      .select(col("event_type"), col("hour"), col("n"), col("z"))
  }

  def eventZscoresSql(thresh: Double = 2.0): String =
    s"""WITH hourly AS (
       |  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       |         COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |stats AS (
       |  SELECT event_type, COUNT(*) AS nh, CAST(SUM(n) AS BIGINT) AS s,
       |         CAST(SUM(n * n) AS BIGINT) AS ss
       |  FROM hourly GROUP BY event_type),
       |sc AS (
       |  SELECT h.event_type, h.hour, h.n,
       |    CAST(st.s AS DOUBLE) / CAST(st.nh AS DOUBLE) AS meanv,
       |    CAST(st.nh * st.ss - st.s * st.s AS DOUBLE)
       |      / CAST(st.nh * st.nh AS DOUBLE) AS varv
       |  FROM hourly h JOIN stats st ON st.event_type = h.event_type
       |  WHERE CAST(st.nh * st.ss - st.s * st.s AS DOUBLE)
       |      / CAST(st.nh * st.nh AS DOUBLE) > 0)
       |SELECT event_type, hour, n,
       |  (CAST(n AS DOUBLE) - meanv) / sqrt(varv) AS z
       |FROM sc
       |WHERE abs((CAST(n AS DOUBLE) - meanv) / sqrt(varv)) > $thresh""".stripMargin

  val eventSpikesSql: String =
    """WITH hourly AS (
      |  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
      |         COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT event_type, n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, hour) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM hourly),
      |medians AS (
      |  SELECT event_type, n AS med_n FROM ranked WHERE rn = (cnt + 1) // 2)
      |SELECT h.event_type, h.hour, h.n, m.med_n
      |FROM hourly h JOIN medians m ON h.event_type = m.event_type
      |WHERE h.n * 2 > m.med_n * 3""".stripMargin

  /** Custom GROUPING SETS — the grouping-set shape cube/rollup can't
    * express: exactly the per-priority slice, the per-status slice, and
    * the grand total (no (priority, status) cross cells — a CUBE would
    * compute and discard them). One Expand pass, same single-shuffle
    * execution as q_cube. */
  def orderGroupingSets(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_price"))

  val orderGroupingSetsSql: String =
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,6))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin

  /** Deterministic histogram quantiles — the scalable approximate
    * percentile (what you run at 100 TB where exact global quantiles would
    * need a full sort): pass 1 takes per-type min/max/count (broadcast-
    * sized), pass 2 buckets every value into nb fixed-width bins with one
    * map-combined groupBy. Quantile selection is INTEGER arithmetic over
    * the bounded per-type histogram (cum·2 ≥ n for p50, cum·20 ≥ 19n for
    * p95 — no float thresholds), and the reported estimate is the bucket's
    * lower edge. Unlike percentile_approx's sketch this is bit-
    * deterministic, so the oracle hash-matches. Window is partitioned per
    * type over ≤ nb rows — bounded by construction. */
  def quantileHist(events: DataFrame, nb: Int = 100): DataFrame = {
    val mm = events.groupBy(col("event_type")).agg(
      min(col("value")).as("vmin"), max(col("value")).as("vmax"),
      count(lit(1)).as("n"))
    val hist = events.join(broadcast(mm), "event_type")
      .withColumn("bucket",
        least(floor((col("value") - col("vmin")) / (col("vmax") - col("vmin")) * nb)
          .cast("long"), lit(nb - 1L)))
      .groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
    hist.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(mm), "event_type")
      .groupBy(col("event_type"), col("vmin"), col("vmax"), col("n"))
      .agg(
        min(when(col("cum") * 2L >= col("n"), col("bucket"))).as("b50"),
        min(when(col("cum") * 20L >= col("n") * 19L, col("bucket"))).as("b95"))
      .select(col("event_type"), col("n"),
        (col("vmin") + col("b50").cast("double") * (col("vmax") - col("vmin")) / lit(nb.toDouble)).as("p50_est"),
        (col("vmin") + col("b95").cast("double") * (col("vmax") - col("vmin")) / lit(nb.toDouble)).as("p95_est"))
  }

  def quantileHistSql(nb: Int = 100): String =
    s"""WITH mm AS (
       |  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax, COUNT(*) AS n
       |  FROM events GROUP BY 1),
       |hist AS (
       |  SELECT e.event_type,
       |    LEAST(CAST(FLOOR((e.value - mm.vmin) / (mm.vmax - mm.vmin) * $nb) AS BIGINT),
       |          ${nb - 1}) AS bucket,
       |    COUNT(*) AS c
       |  FROM events e JOIN mm ON e.event_type = mm.event_type
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, bucket, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
       |  FROM hist),
       |sel AS (
       |  SELECT c.event_type, mm.vmin, mm.vmax, mm.n,
       |    MIN(CASE WHEN c.cum * 2 >= mm.n THEN c.bucket END) AS b50,
       |    MIN(CASE WHEN c.cum * 20 >= mm.n * 19 THEN c.bucket END) AS b95
       |  FROM cum c JOIN mm ON c.event_type = mm.event_type
       |  GROUP BY 1, 2, 3, 4)
       |SELECT event_type, n,
       |  vmin + CAST(b50 AS DOUBLE) * (vmax - vmin) / ${nb.toDouble} AS p50_est,
       |  vmin + CAST(b95 AS DOUBLE) * (vmax - vmin) / ${nb.toDouble} AS p95_est
       |FROM sel""".stripMargin

  /** Quartile assignment per nation (NTILE — the window primitive the
    * rank/lag/sum family doesn't cover), rolled up to per-(nation,
    * quartile) balance stats. Deterministic via the (acctbal, custkey)
    * total order; windows partition per nation, never global. */
  def custQuartiles(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
    customer
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("c_nationkey"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"), max(col("c_acctbal")).as("max_bal"))
  }

  val custQuartilesSql: String =
    """WITH q AS (
      |  SELECT c_nationkey,
      |    CAST(NTILE(4) OVER (PARTITION BY c_nationkey
      |                        ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
      |    c_acctbal
      |  FROM customer)
      |SELECT c_nationkey, quartile, COUNT(*) AS n,
      |  MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
      |FROM q GROUP BY 1, 2""".stripMargin

  /** Session path mining — the "most common user journeys" query of
    * product analytics: sessionize (same gap logic as
    * q_events_sessionize), order each session's event types, slide a
    * trigram window over the sequence, count paths globally, top-N.
    * Windows partition per user and the trigram HOF runs over bounded
    * session sequences; the global cut is TakeOrderedAndProject. */
  def pathMining(events: DataFrame, gapMinutes: Int = 30, topN: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val s = events
      .withColumn("tsu", unix_micros(col("ts")))
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("tsu") - col("prev") > gapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val seqs = s.groupBy(col("user_id"), col("session_id"))
      .agg(array_sort(collect_list(
        struct(col("tsu"), col("event_id"), col("event_type")))).as("evs"))
      .withColumn("types", transform(col("evs"), x => x.getField("event_type")))
    seqs.select(
        explode(when(size(col("types")) >= 3,
          transform(sequence(lit(0), size(col("types")) - 3),
            i => concat_ws("->", get(col("types"), i), get(col("types"), i + 1),
              get(col("types"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(topN)
  }

  def pathMiningSql(gapMinutes: Int = 30, topN: Int = 20): String = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    s"""WITH g AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $gapUs
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, event_type, tsu, event_id,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM g),
       |seqs AS (
       |  SELECT user_id, session_id,
       |    list(event_type ORDER BY tsu, event_id) AS types
       |  FROM s GROUP BY 1, 2),
       |tri AS (
       |  SELECT unnest(CASE WHEN len(types) >= 3
       |    THEN list_transform(range(1, len(types) - 1),
       |      i -> types[i] || '->' || types[i+1] || '->' || types[i+2])
       |    ELSE CAST([] AS VARCHAR[]) END) AS path
       |  FROM seqs)
       |SELECT path, COUNT(*) AS n FROM tri
       |GROUP BY 1 ORDER BY n DESC, path LIMIT $topN""".stripMargin
  }

  /** At-least-once delivery repair — the batch half of stream_dedup: an
    * event log re-delivers a deterministic slice (event_id%10, new ids —
    * the synthetic stand-in for retried producers), and dedup collapses
    * payload-identical deliveries (user, type, micros-reconciled ts,
    * value) to the minimum event id. Emits the per-type delivery audit
    * (unique / delivered / duplicate counts) — one payload-keyed groupBy
    * with full map-side partial aggregation, the single-shuffle shape
    * exact dedup always has. */
  def eventDedup(events: DataFrame): DataFrame = {
    val base = events.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tsu"), col("value"))
    val delivered = base.unionAll(
      base.filter(pmod(col("event_id"), lit(10L)) === 0L)
        .withColumn("event_id", col("event_id") + 10000000L))
    delivered
      .groupBy(col("user_id"), col("event_type"), col("tsu"), col("value"))
      .agg(min(col("event_id")).as("keeper"), count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_unique"),
        sum(col("n")).as("n_delivered"),
        sum(col("n") - 1L).as("n_dupes"),
        min(col("keeper")).as("first_keeper"))
  }

  val eventDedupSql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu, value FROM events),
      |delivered AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT event_id + 10000000, user_id, event_type, tsu, value
      |  FROM base WHERE event_id % 10 = 0),
      |u AS (
      |  SELECT user_id, event_type, tsu, value,
      |    MIN(event_id) AS keeper, COUNT(*) AS n
      |  FROM delivered GROUP BY 1, 2, 3, 4)
      |SELECT event_type, COUNT(*) AS n_unique,
      |  CAST(SUM(n) AS BIGINT) AS n_delivered,
      |  CAST(SUM(n - 1) AS BIGINT) AS n_dupes,
      |  MIN(keeper) AS first_keeper
      |FROM u GROUP BY 1""".stripMargin
}
