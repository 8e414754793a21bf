package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 20 vectors in 4-d with a planted dominant direction (1,1,0,0)·t plus a
  // small orthogonal wiggle — here power iteration converges fast, so the
  // projection must align with the planted axis.
  private def planted = (0 until 20).map { i =>
    val t = (i - 9.5) / 3.0
    val w = if (i % 2 == 0) 0.1 else -0.1
    (i.toLong, Array(t.toFloat + w.toFloat, t.toFloat, w.toFloat, -w.toFloat), 0)
  }.toDF("vec_id", "embedding", "label")

  test("projection variance beats the mean per-dim variance (Rayleigh growth)") {
    val out = Pca.pcaProject(planted, dim = 4, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(out.size == 20)
    val vals = out.values.toArray
    val mean = vals.sum / vals.length
    val pcVar = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
    // per-dim variances of the planted data
    val X = planted.select(posexplode(col("embedding")))
      .select(col("pos"), col("col").cast("double").as("v"))
      .as[(Int, Double)].collect()
    val dimVar = X.groupBy(_._1).map { case (_, xs) =>
      val m = xs.map(_._2).sum / xs.length
      xs.map(x => (x._2 - m) * (x._2 - m)).sum / xs.length
    }
    val meanDimVar = dimVar.sum / dimVar.size
    assert(pcVar > meanDimVar, s"pcVar=$pcVar meanDimVar=$meanDimVar")
  }

  test("projection aligns with a planted dominant direction") {
    val out = Pca.pcaProject(planted, dim = 4, iters = 3)
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    // planted signal is monotone in i along (1,1,0,0): projection must be
    // strongly correlated (either sign) with the generating parameter t
    val t = (0 until 20).map(i => (i - 9.5) / 3.0).toArray
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val ma = a.sum / a.length; val mb = b.sum / b.length
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val sa = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
      val sb = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      cov / (sa * sb)
    }
    assert(math.abs(corr(out, t)) > 0.99)
  }
}
