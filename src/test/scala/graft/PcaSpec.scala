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

  private def corr2(a: Array[Double], b: Array[Double]): Double = {
    val ma = a.sum / a.length; val mb = b.sum / b.length
    val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val sa = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
    val sb = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
    cov / (sa * sb)
  }

  test("top-p deflation recovers two planted orthogonal directions") {
    // x_i = a_i·e0 + b_i·e1 with var(a) ≫ var(b) and a ⊥ b by construction
    // (independent sign patterns): component 1 must recover a, component 2
    // must recover b — possible only if deflation removed the first axis.
    val a = (0 until 24).map(i => if (i % 2 == 0) 10.0 else -10.0).toArray
    val b = (0 until 24).map(i => if ((i / 2) % 2 == 0) 1.0 else -1.0).toArray
    val df = (0 until 24).map { i =>
      (i.toLong, Array(a(i).toFloat, b(i).toFloat, 0f, 0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = Pca.pcaTopP(df, dim = 4, iters = 3, p = 2)
      .as[(Long, Long, Double)].collect()
    val p1 = out.filter(_._2 == 1L).sortBy(_._1).map(_._3)
    val p2 = out.filter(_._2 == 2L).sortBy(_._1).map(_._3)
    assert(p1.length == 24 && p2.length == 24)
    assert(math.abs(corr2(p1, a)) > 0.999, s"comp1 missed the dominant axis")
    assert(math.abs(corr2(p2, b)) > 0.999, s"comp2 missed the deflated axis")
    // and the components are genuinely different directions
    assert(math.abs(corr2(p2, a)) < 0.01, s"comp2 still rides the first axis")
  }
}
