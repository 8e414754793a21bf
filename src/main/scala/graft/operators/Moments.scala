package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable moments sketch — the order-independent quantile/shape summary
  * next to the CMS/KMV/Bloom sketch family (Gan et al., "Moment-Based
  * Quantile Sketches", VLDB'18 is the published shape; this is the
  * deterministic power-sums core plus a closed-form Cornish-Fisher
  * quantile estimate rather than the paper's max-entropy solver).
  *
  * Why it scales: the sketch per group is (n, Σx, Σx², Σx³, Σx⁴, min,
  * max) — power sums MERGE BY ADDITION, so Spark's map-side partial
  * aggregation IS the sketch merge: a 1000-executor rollup ships seven
  * numbers per group per partition, never raw values. Sums ride
  * DECIMAL(38,18) over each scaled value's shortest double repr — exact
  * and summation-order-independent (the dsum/pageRank recipe), so the
  * sketch is bit-identical under ANY partitioning and replayable by the
  * DuckDB oracle.
  *
  * Numerics: values are pre-scaled by 1e-5 (prices ~1e4 → x' ~ 1) so x'⁴
  * stays far inside the decimal's 20 integral digits at any corpus size
  * (Σx'⁴ ≤ ~1.5·rows — 1e12 rows is still 1e8 headroom); central moments,
  * skewness and excess kurtosis derive from the power sums in a FIXED
  * operation order mirrored exactly by the oracle SQL (every op is a
  * correctly-rounded double op, so cross-engine results are bit-equal).
  * Skew/kurtosis are scale-invariant; mean/std rescale by 1e5.
  *
  * The Cornish-Fisher p95 turns the shape summary into an approximate
  * quantile with zero extra state: w = z + (z²−1)γ₁/6 + (z³−3z)γ₂/24 −
  * (2z³−5z)γ₁²/36, q ≈ μ + σ·w (classic expansion, public formula).
  */
object Moments {

  private val Scale = 1.0e-5 // x' = x * Scale keeps x'^4 decimal-safe
  private val Z95 = 1.6448536269514722 // Φ⁻¹(0.95)

  private def dec(c: Column) = c.cast("string").cast("decimal(38,18)")
  private def d(c: Column) = c.cast("string").cast("double")

  def momentsSketch(lineitem: DataFrame): DataFrame = {
    val x = col("l_extendedprice") * lit(Scale)
    val rows = lineitem.select(
      col("l_returnflag"), col("l_linestatus"),
      x.as("x1"), (x * x).as("x2"), (x * x * x).as("x3"),
      (x * x * x * x).as("x4"), col("l_extendedprice").as("price"))
    val agg = rows.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        d(sum(dec(col("x1")))).as("s1"),
        d(sum(dec(col("x2")))).as("s2"),
        d(sum(dec(col("x3")))).as("s3"),
        d(sum(dec(col("x4")))).as("s4"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"))
    // fixed-order double arithmetic below — mirrored verbatim in the oracle.
    // m2 is clamped at 0: E[x²]−m1² can cancel slightly NEGATIVE in doubles
    // for a near-constant group, and sqrt of that is NaN — which would
    // poison std/skewness/kurtosis/cf_p95 (both engines would mirror the
    // NaN, so the hash gate can't catch it; the clamp makes the output
    // meaningful instead of merely reproducible)
    val nD = col("n").cast("double")
    val m1 = col("s1") / nD
    val m2 = greatest(col("s2") / nD - col("m1") * col("m1"), lit(0.0))
    val m3 = col("s3") / nD - lit(3.0) * col("m1") * (col("s2") / nD) +
      lit(2.0) * col("m1") * col("m1") * col("m1")
    val m4 = col("s4") / nD - lit(4.0) * col("m1") * (col("s3") / nD) +
      lit(6.0) * col("m1") * col("m1") * (col("s2") / nD) -
      lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1")
    val w = lit(Z95) +
      (lit(Z95) * lit(Z95) - lit(1.0)) * col("skewness") / lit(6.0) +
      (lit(Z95) * lit(Z95) * lit(Z95) - lit(3.0) * lit(Z95)) * col("kurtosis_ex") / lit(24.0) -
      (lit(2.0) * lit(Z95) * lit(Z95) * lit(Z95) - lit(5.0) * lit(Z95)) *
        (col("skewness") * col("skewness")) / lit(36.0)
    agg
      .withColumn("m1", m1)
      .withColumn("m2", m2)
      .withColumn("m3", m3)
      .withColumn("m4", m4)
      .withColumn("std_s", sqrt(col("m2")))
      // shape moments are undefined for a constant group (zero variance):
      // guard the divisors — NULL beats an ANSI divide-by-zero error, and
      // the degenerate cf_p95 is exactly the constant itself (the mean)
      .withColumn("skewness", when(col("std_s") > 0,
        col("m3") / (col("std_s") * col("std_s") * col("std_s"))))
      .withColumn("kurtosis_ex", when(col("std_s") > 0,
        col("m4") / (col("m2") * col("m2")) - lit(3.0)))
      .withColumn("cf_w", w)
      .select(
        col("l_returnflag"), col("l_linestatus"), col("n"),
        // literal 100000.0, NOT 1.0/Scale: the IEEE reciprocal of 1e-5 is
        // not exactly 1e5, and the oracle states the plain literal
        (col("m1") * lit(100000.0)).as("mean_price"),
        (col("std_s") * lit(100000.0)).as("std_price"),
        col("skewness"), col("kurtosis_ex"),
        when(col("std_s") > 0,
          col("m1") * lit(100000.0) + col("std_s") * lit(100000.0) * col("cf_w"))
          .otherwise(col("m1") * lit(100000.0))
          .as("cf_p95"),
        col("min_price"), col("max_price"))
  }

  /** Oracle: the identical power-sum recipe and the identical fixed-order
    * derivation, stated in DuckDB SQL. */
  val momentsSketchSql: String = {
    // explicit DOUBLE cast: DuckDB parses a bare 16-digit literal as
    // DECIMAL(17,16), and cubing that needs scale 48 — out of range
    val z = s"CAST('${Z95.toString}' AS DOUBLE)"
    s"""WITH r AS (
       |  SELECT l_returnflag, l_linestatus,
       |    l_extendedprice * 1e-05 AS x1, l_extendedprice AS price
       |  FROM lineitem),
       |r2 AS (SELECT l_returnflag, l_linestatus, x1, x1*x1 AS x2,
       |              (x1*x1)*x1 AS x3, ((x1*x1)*x1)*x1 AS x4, price FROM r),
       |a AS (
       |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |    CAST(CAST(SUM(CAST(CAST(x1 AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s1,
       |    CAST(CAST(SUM(CAST(CAST(x2 AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s2,
       |    CAST(CAST(SUM(CAST(CAST(x3 AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s3,
       |    CAST(CAST(SUM(CAST(CAST(x4 AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS s4,
       |    MIN(price) AS min_price, MAX(price) AS max_price
       |  FROM r2 GROUP BY 1, 2),
       |m AS (
       |  SELECT *, s1 / CAST(n AS DOUBLE) AS m1 FROM a),
       |c AS (
       |  SELECT *,
       |    greatest(s2 / CAST(n AS DOUBLE) - m1 * m1, 0.0) AS m2,
       |    s3 / CAST(n AS DOUBLE) - 3.0 * m1 * (s2 / CAST(n AS DOUBLE))
       |      + 2.0 * m1 * m1 * m1 AS m3,
       |    s4 / CAST(n AS DOUBLE) - 4.0 * m1 * (s3 / CAST(n AS DOUBLE))
       |      + 6.0 * m1 * m1 * (s2 / CAST(n AS DOUBLE))
       |      - 3.0 * m1 * m1 * m1 * m1 AS m4
       |  FROM m),
       |s AS (
       |  SELECT *, sqrt(m2) AS std_s FROM c),
       |k AS (
       |  SELECT *,
       |    CASE WHEN std_s > 0 THEN m3 / ((std_s * std_s) * std_s) END AS skewness,
       |    CASE WHEN std_s > 0 THEN m4 / (m2 * m2) - 3.0 END AS kurtosis_ex
       |  FROM s),
       |w AS (
       |  SELECT *,
       |    $z + ($z * $z - 1.0) * skewness / 6.0
       |       + (($z * $z) * $z - 3.0 * $z) * kurtosis_ex / 24.0
       |       - ((2.0 * $z) * $z * $z - 5.0 * $z) * (skewness * skewness) / 36.0
       |      AS cf_w
       |  FROM k)
       |SELECT l_returnflag, l_linestatus, n,
       |  m1 * 100000.0 AS mean_price,
       |  std_s * 100000.0 AS std_price,
       |  skewness, kurtosis_ex,
       |  CASE WHEN std_s > 0
       |       THEN m1 * 100000.0 + (std_s * 100000.0) * cf_w
       |       ELSE m1 * 100000.0 END AS cf_p95,
       |  min_price, max_price
       |FROM w""".stripMargin
  }
}
