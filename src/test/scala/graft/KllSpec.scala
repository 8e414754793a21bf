package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.KllBuffer
import graft.operators.Kll
import graft.sources.Tables

/** KLL rank-quantile sketch: rank error bounded vs exact quantiles (across
  * partitionings — partial-agg merge IS the sketch union), buffer-level
  * merge/accuracy properties, and the portable twin's by-construction
  * bounds (rank slack ≤ crossing-cell count, relative value error ≤ 2^-m).
  */
class KllSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** exact rank (1-based count of values <= v) per group from raw data */
  private def exactRanks(li: DataFrame): Map[(String, String), Array[Double]] =
    li.select(col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"))
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rows) => k -> rows.map(_.getDouble(2)).sorted }

  private def checkRankError(out: DataFrame, sortedByGroup: Map[(String, String), Array[Double]],
                             eps: Double, what: String): Unit = {
    val probes = Kll.Probes.map(p => p._1 -> (p._2, p._3)).toMap
    out.collect().foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val q = r.getString(2)
      val est = r.getDouble(4)
      val sorted = sortedByGroup(key)
      val n = sorted.length.toLong
      val (num, den) = probes(q)
      val target = (num * n + den - 1) / den // ceil(q·n)
      // rank of est: values <= est
      val rank = sorted.count(_ <= est).toLong
      assert(math.abs(rank - target) <= math.max((eps * n).toLong, 1L),
        s"$what: group $key $q rank=$rank target=$target n=$n est=$est")
    }
  }

  test("kll_quantile rank error stays bounded across partitionings") {
    val li = Tables.lineitem(spark, dir)
    val sorted = exactRanks(li)
    // k=200 → theoretical ε ~ O(1/k); 3% gives deterministic headroom for
    // the derandomized compaction at these group sizes
    for (parts <- Seq(1, 7, 32)) {
      val out = Kll.kllQuantile(li.repartition(parts))
      assert(out.count() == sorted.size * Kll.Probes.size)
      checkRankError(out.select(col("l_returnflag"), col("l_linestatus"),
        col("q"), col("n"), col("est_price")), sorted, 0.03, s"kll parts=$parts")
    }
  }

  test("KllBuffer: stream/merge agree with exact quantiles on a skewed stream") {
    // heavy-tailed (quadratic spread) input, adversarial insert order
    val xs = (1 to 20000).map(i => (i.toDouble * i) % 9973 + i / 100.0)
    val whole = new KllBuffer(200)
    xs.foreach(whole.update)
    val (a, b) = xs.splitAt(xs.length / 3)
    val ba = new KllBuffer(200); a.foreach(ba.update)
    val bb = new KllBuffer(200); b.foreach(bb.update)
    ba.merge(bb)
    val sorted = xs.sorted
    val n = xs.length.toLong
    for (buf <- Seq(whole, ba); ((num, den), _) <- Kll.Probes.map(p => ((p._2, p._3), p._1))) {
      val est = buf.quantiles(Seq((num, den))).head
      val target = (num * n + den - 1) / den
      val rank = sorted.count(_ <= est).toLong
      assert(math.abs(rank - target) <= (0.03 * n).toLong,
        s"rank=$rank target=$target n=$n (merged=${buf eq ba})")
    }
    assert(ba.n == n)
  }

  test("kll_portable: rank slack <= crossing-cell count, relative value error <= 2^-m") {
    val li = Tables.lineitem(spark, dir)
    val sorted = exactRanks(li)
      .groupBy(_._1._1) // portable twin groups by returnflag only
      .map { case (rf, m) => rf -> m.values.toArray.flatten.sorted }
    val probes = Kll.Probes.map(p => p._1 -> (p._2, p._3)).toMap
    Kll.kllPortable(li).collect().foreach { r =>
      val rf = r.getString(0)
      val q = r.getString(1)
      val n = r.getLong(2)
      val est = r.getDouble(3)
      val cellN = r.getLong(4)
      val s = sorted(rf)
      assert(n == s.length.toLong)
      val (num, den) = probes(q)
      val target = (num * n + den - 1) / den
      val rank = s.count(_ <= est).toLong
      // est is the crossing cell's min: its rank may fall short of the
      // target by at most the cell's remaining occupancy
      assert(rank <= target && target - rank < cellN,
        s"$rf $q rank=$rank target=$target cell_n=$cellN")
      // log-linear cells bound relative value error by 2^-m (m=5)
      val truth = s((target - 1).toInt)
      assert(est <= truth && truth - est <= truth / 32.0 + 0.01,
        s"$rf $q est=$est truth=$truth")
    }
  }
}
