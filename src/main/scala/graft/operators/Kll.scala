package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.KllAgg

/** Rank-based mergeable quantile sketches — the heavy-tail complement of
  * the moment sketch ([[Moments]]): Cornish-Fisher p95 assumes near-normal
  * shape, while a rank sketch's bound holds for ANY distribution
  * (reference analog: the profiling/stats surface, graph_service.py:327
  * get_database_stats).
  *
  * Two forms, the minhash/simhash pattern:
  *   - [[kllQuantile]] — the real one-pass KLL ([[graft.functions.KllAgg]],
  *     FOCS'16, derandomized). Its compaction depends on merge ORDER, which
  *     Spark's partial aggregation does not fix across partitionings, so
  *     the registered query is declared rows-only.
  *   - [[kllPortable]] — the hash-green twin: an order-independent
  *     log-linear rank sketch (the HdrHistogram/DDSketch bucket family,
  *     VLDB'19) over EXACT integer arithmetic, replayed verbatim by DuckDB.
  */
object Kll {

  /** Quantile probes as (label, num, den) — rank thresholds stay integer. */
  val Probes: Seq[(String, Long, Long)] = Seq(
    ("p25", 1L, 4L), ("p50", 1L, 2L), ("p90", 9L, 10L),
    ("p95", 19L, 20L), ("p99", 99L, 100L))

  /** KLL quantiles of l_extendedprice per (returnflag, linestatus): one
    * O(k) sketch per group, map-side partial sketches merged on the reduce
    * side — the shuffle carries O(groups·k) doubles at any corpus size.
    * Rows-only (deterministic row count: groups × probes); the estimates
    * are partition-dependent within the KLL rank-error envelope, which
    * KllSpec bounds against the exact quantiles across partitionings. */
  def kllQuantile(lineitem: DataFrame, k: Int = 200): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val labels = Probes.map(_._1).zipWithIndex.map(_.swap).toDF("idx", "q")
    val sketched = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        KllAgg.kll(col("l_extendedprice"), k,
          Probes.map(p => (p._2, p._3))).as("ests"))
    sketched
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        posexplode(col("ests")).as(Seq("idx", "est_price")))
      .join(broadcast(labels), "idx")
      .select(col("l_returnflag"), col("l_linestatus"), col("q"),
        col("n"), col("est_price"))
  }

  /** Hash-green portable twin: log-linear buckets over exact integers.
    * Cents = round(price·100) (prices carry 2 decimals, so the round is
    * exact); a bucket is (bit_length(cents), top-(m+1)-bits) — the
    * HdrHistogram cell, computed with bin()/shiftright only (no libm, so
    * both engines place every value identically). Cell counts merge by
    * ADDITION (one map-side-combined groupBy — the sketch merge), the
    * per-group cell table is bounded (≤ 64·2^m cells) regardless of n, and
    * the rank walk is a per-group window over that bounded table. The
    * estimate is the crossing cell's MIN actual value, so rank error ≤
    * the cell's count and relative value error ≤ 2^-m by construction;
    * `cell_n` exposes the per-probe rank slack in the output. */
  def kllPortable(lineitem: DataFrame, minorBits: Int = 5): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val probes = Probes.toDF("q", "num", "den")
    val cells = lineitem
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_extendedprice").as("price"))
      // bit length via the native BitLengthLong kernel (one JVM intrinsic
      // per row). Both composed spellings measured worse: length(bin(x))
      // allocates a String per corpus row, and a 47-term comparison-sum
      // inlines into every downstream reference under project collapse and
      // falls out of codegen (1.5 s → 30 s at sf0.1).
      .withColumn("blen", graft.functions.BitLengthLong.bitLen(col("cents")))
      // shiftright via expr: the functions._ overload only takes a literal
      // shift, but the underlying expression accepts a per-row one
      .withColumn("minor",
        expr(s"shiftright(cents, cast(greatest(blen - 1 - $minorBits, 0) as int))"))
      // cell key monotone in value: minor < 2^(m+1) always, so
      // blen·2^(m+1) + minor orders cells exactly as the values they hold
      .withColumn("ck", col("blen") * (1L << (minorBits + 1)) + col("minor"))
      .groupBy(col("l_returnflag"), col("ck"))
      .agg(count(lit(1)).as("c"), min(col("price")).as("mn"))
    val tot = cells.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
    val w = Window.partitionBy("l_returnflag").orderBy("ck")
    val cum = cells.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(tot), "l_returnflag")
    val crossing = cum.crossJoin(broadcast(probes))
      .filter(col("cum") * col("den") >= col("num") * col("n"))
      .groupBy(col("l_returnflag"), col("q"), col("n"))
      .agg(min(col("ck")).as("ck"))
    crossing.join(cells, Seq("l_returnflag", "ck"))
      .select(col("l_returnflag"), col("q"), col("n"),
        col("mn").as("est_price"), col("c").as("cell_n"))
  }

  /** Oracle: the identical cell family and rank walk in DuckDB SQL —
    * bin()/>>/integer thresholds only, so the replay is exact. */
  def kllPortableSql(minorBits: Int = 5): String = {
    val probeRows = Probes
      .map { case (q, num, den) => s"('$q', ${num}::BIGINT, ${den}::BIGINT)" }
      .mkString(", ")
    val cellW = 1L << (minorBits + 1)
    s"""WITH base AS (
       |  SELECT l_returnflag,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
       |    l_extendedprice AS price
       |  FROM lineitem),
       |keyed AS (
       |  SELECT l_returnflag, price,
       |    CAST(length(bin(cents)) AS BIGINT) * $cellW
       |      + (cents >> CAST(greatest(length(bin(cents)) - 1 - $minorBits, 0) AS INTEGER))
       |      AS ck
       |  FROM base),
       |cells AS (
       |  SELECT l_returnflag, ck, COUNT(*) AS c, MIN(price) AS mn
       |  FROM keyed GROUP BY 1, 2),
       |tot AS (SELECT l_returnflag, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY 1),
       |cum AS (
       |  SELECT cells.*, tot.n,
       |    SUM(c) OVER (PARTITION BY cells.l_returnflag ORDER BY ck) AS cum
       |  FROM cells JOIN tot USING (l_returnflag)),
       |probes(q, num, den) AS (VALUES $probeRows),
       |crossing AS (
       |  SELECT l_returnflag, q, n, MIN(ck) AS ck
       |  FROM cum CROSS JOIN probes
       |  WHERE cum * den >= num * n
       |  GROUP BY 1, 2, 3)
       |SELECT cr.l_returnflag, cr.q, cr.n,
       |  ce.mn AS est_price, ce.c AS cell_n
       |FROM crossing cr JOIN cells ce
       |  ON cr.l_returnflag = ce.l_returnflag AND cr.ck = ce.ck""".stripMargin
  }
}
