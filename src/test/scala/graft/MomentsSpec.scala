package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Moments

/** The mergeable moments sketch: partition invariance (power sums merge by
  * addition — the decimal recipe makes the merge exact under ANY
  * partitioning), agreement of derived stats with direct computation, and
  * Cornish-Fisher quantile quality on a known distribution. */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  private def table(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (if (i % 2 == 0) "A" else "R", "F", v)
    }.toDF("l_returnflag", "l_linestatus", "l_extendedprice")

  test("sketch is bit-identical under any partitioning (exact merge)") {
    val rnd = new Random(7)
    val vals = Seq.fill(5000)(900.0 + rnd.nextDouble() * 90000.0)
    val base = table(vals)
    val one = Moments.momentsSketch(base.repartition(1)).collect().toSet
    val many = Moments.momentsSketch(base.repartition(17)).collect().toSet
    assert(one === many, "moments sketch changed under repartitioning")
  }

  test("derived stats match direct computation") {
    val vals = Seq(1000.0, 2000.0, 3000.0, 4000.0, 5000.0)
    val df = vals.map(v => ("A", "F", v)).toDF("l_returnflag", "l_linestatus", "l_extendedprice")
    val r = Moments.momentsSketch(df).collect().head
    val mean = vals.sum / vals.size
    val varp = vals.map(v => (v - mean) * (v - mean)).sum / vals.size
    assert(math.abs(r.getAs[Double]("mean_price") - mean) < 1e-6)
    assert(math.abs(r.getAs[Double]("std_price") - math.sqrt(varp)) < 1e-6)
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-9, "symmetric sample: skew ~ 0")
    assert(r.getAs[Double]("min_price") == 1000.0 && r.getAs[Double]("max_price") == 5000.0)
  }

  test("Cornish-Fisher p95 tracks the empirical p95 on a normal-ish sample") {
    val rnd = new Random(11)
    // sum of uniforms ~ normal-ish, centered 50000, bounded positive
    val vals = Seq.fill(20000)((1 to 12).map(_ => rnd.nextDouble()).sum / 12.0 * 100000.0)
    val df = vals.map(v => ("A", "F", v)).toDF("l_returnflag", "l_linestatus", "l_extendedprice")
    val cf = Moments.momentsSketch(df).collect().head.getAs[Double]("cf_p95")
    val empirical = vals.sorted.apply((vals.size * 0.95).toInt)
    assert(math.abs(cf - empirical) / empirical < 0.02,
      s"CF p95 $cf vs empirical $empirical beyond 2%")
  }
}
