package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.plans.AsofJoin

/** Randomized cross-check of the hand-written as-of merge against a
  * brute-force in-memory oracle: many small random instances with dense
  * key/ts collisions (the regime where cursor/state bugs live), both join
  * modes, several partition counts. The right side is kept unique per
  * (key, ts) so the oracle is deterministic (the exec's documented tie
  * contract). */
class AsofPropertySpec extends SparkSpec {

  private case class L(id: Long, key: String, ms: Long)
  private case class R(key: String, ms: Long, payload: String)

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms * 60000L)

  private def run(seed: Int, parts: Int, outer: Boolean,
                  tolMinutes: Option[Long] = None): Unit = {
    val rnd = new Random(seed)
    val keys = Vector("a", "b", "c", "d")
    val lefts = (1 to 40).map(i =>
      L(i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(12).toLong))
    val rights = rnd.shuffle(
      (for (k <- keys; m <- 0 until 12 if rnd.nextBoolean()) yield
        R(k, m.toLong, s"$k@$m")).toVector)

    // brute-force oracle — the tolerance applies to the SELECTED row only
    // (the latest at-or-before), matching the exec's at-emit contract
    val expected: Set[(Long, Option[String])] = lefts.map { l =>
      val cand = rights.filter(r => r.key == l.key && r.ms <= l.ms)
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(_.ms))
          .filter(r => tolMinutes.forall(t => l.ms - r.ms <= t))
          .map(_.payload)
      (l.id, best)
    }.filter(x => outer || x._2.isDefined).toSet

    import spark.implicits._
    val lDf: DataFrame = lefts.map(l => (l.id, l.key, ts(l.ms)))
      .toDF("id", "key", "ts").repartition(parts)
    val rDf: DataFrame = rights.map(r => (r.key, ts(r.ms), r.payload))
      .toDF("key", "rts", "payload").repartition(parts + 1)
    val got = AsofJoin.asof(lDf, rDf, Seq("key"), "ts", "rts", leftOuter = outer,
        tolerance = tolMinutes.map(_ * 60000L * 1000L)) // minutes → micros
      .select(col("id"), col("payload")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === expected,
      s"seed=$seed parts=$parts outer=$outer tol=$tolMinutes:\n missing=${expected -- got}\n extra=${got -- expected}")
  }

  test("as-of merge matches the brute-force oracle on random dense instances") {
    for (seed <- 1 to 8; parts <- Seq(1, 3, 7); outer <- Seq(false, true))
      run(seed, parts, outer)
  }

  test("tolerant as-of merge matches the brute-force oracle (tight and loose bounds)") {
    // tol=0 (ties only), 2 (tight — frequently binding), 20 (never binds:
    // must equal the unbounded join), both modes, several partitionings
    for (seed <- 1 to 8; parts <- Seq(1, 3, 7); outer <- Seq(false, true);
         tol <- Seq(0L, 2L, 20L))
      run(seed, parts, outer, Some(tol))
  }
}
