package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}

import graft.operators.GraphOps
import graft.sources.Tables

/** r15 verdict item 9: pin the rank-family loop bodies' plan shape — the
  * pre-partitioned persisted edge copies must reach their per-round joins
  * WITHOUT a planner-inserted Exchange (the stats cap dropped origin
  * constraints; this spec fails fast if any Spark upgrade or estimate
  * change resurrects the per-round edge shuffle), and the rank-vector
  * joins must stay ShuffledHashJoin (never a corpus-scaled broadcast).
  * Also pins the r16 eager-cache-build fix (Iterative.build): these round
  * plans are created AFTER the cache is built, which is exactly why its
  * partitioning is visible to them — CachePartProbe showed an UNBUILT
  * cache reports UnknownPartitioning and re-exchanges.
  *
  * AQE is scoped OFF for the assertion: EnsureRequirements (the rule under
  * test) runs before AQE, and a plain tree keeps InMemoryTableScan a leaf
  * so the walk cannot wander into nested cached-plan printouts. */
class RankPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withAqeOff[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** No ENSURE_REQUIREMENTS shuffle may sit between a cached edge scan and
    * its first Join ancestor — that is the "per-round edge re-exchange"
    * being pinned away. Exchanges ABOVE the join (the node-sized partial-
    * aggregation shuffle) are the round's legitimate data movement; the
    * one-time REPARTITION_BY_COL build inside the cache is invisible here
    * (the scan is a leaf). */
  private def assertNoExchangeAboveCache(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan
    var found = 0
    def walk(p: SparkPlan, pending: List[SparkPlan]): Unit = p match {
      case s: InMemoryTableScanExec =>
        found += 1
        val bad = pending.collect {
          case e: ShuffleExchangeExec if e.shuffleOrigin == ENSURE_REQUIREMENTS => e
        }
        assert(bad.isEmpty,
          s"$what: Exchange between the cached edge scan and its join:\n" +
            bad.mkString("\n"))
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        j.children.foreach(walk(_, Nil)) // reset: below a join, start fresh
      case other =>
        other.children.foreach(walk(_, other :: pending))
    }
    walk(plan, Nil)
    assert(found > 0, s"$what: expected a persisted edge copy in the plan")
  }

  private def assertShuffledHashJoins(df: DataFrame, what: String): Unit = {
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("ShuffledHashJoin"), s"$what: rank joins must be SHUFFLE_HASH")
    assert(!s.contains("BroadcastNestedLoopJoin"), s"$what: unexpected BNLJ")
  }

  test("pageRank round: cached edge copy joins exchange-free, SHJ rank joins") {
    withAqeOff {
      val df = GraphOps.pageRankRoundProbe(GraphOps.copurchase(Tables.lineitem(spark, dir)))
      assertNoExchangeAboveCache(df, "pageRankRound")
      assertShuffledHashJoins(df, "pageRankRound")
    }
  }

  test("HITS round: both cached edge copies join exchange-free, SHJ rank joins") {
    withAqeOff {
      val df = GraphOps.hitsRoundProbe(GraphOps.hitsEdges(Tables.lineitem(spark, dir)))
      assertNoExchangeAboveCache(df, "hitsRound")
      assertShuffledHashJoins(df, "hitsRound")
    }
  }
}
