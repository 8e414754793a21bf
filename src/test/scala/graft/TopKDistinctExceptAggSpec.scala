package graft

import org.apache.spark.sql.functions._

import graft.functions.{TopKDistinctAgg, TopKDistinctExceptAgg}

/** Pins the r16 descent-round fusion: TopKDistinctExceptAgg over a tagged
  * union must equal the pre-r16 spelling — TopKDistinctAgg-cap the
  * candidate rows, then anti-join the exclusion pairs away — exactly, on
  * data with duplicates, ids that are both candidate and excluded, and
  * groups whose cap survivors are all excluded. */
class TopKDistinctExceptAggSpec extends SparkSpec {
  import spark.implicits._

  test("fused cap+except equals TopKDistinctAgg-cap then anti-join") {
    val rnd = new scala.util.Random(11)
    val k = 5
    // candidates: duplicates are frequent (id % 17) and scores are a pure
    // function of (key, id) — the fusion's precondition
    val cand = (1 to 4000).map { i =>
      val key = i % 7L
      val id = (rnd.nextInt(40) % 17).toLong
      (key, id, ((key * 31 + id * 17) % 101).toDouble)
    }
    // exclusions: some ids overlap the candidate pool, some don't
    val excl = (1 to 300).map { i =>
      (i % 7L, (rnd.nextInt(25)).toLong)
    }.distinct
    val candDf = cand.toDF("key", "id", "h").repartition(8)
    val exclDf = excl.toDF("key", "id").repartition(8)

    val fused = candDf.select(col("key"), col("id"), col("h"), lit(false).as("cur"))
      .unionByName(exclDf.select(col("key"), col("id"), lit(0.0).as("h"),
        lit(true).as("cur")))
      .groupBy(col("key"))
      .agg(TopKDistinctExceptAgg.topKDistinctExcept(
        col("h"), col("id"), col("cur"), k).as("ids"))
      .select(col("key"), explode(col("ids")).as("id"))
      .as[(Long, Long)].collect().toSet

    val capped = candDf.groupBy(col("key"))
      .agg(TopKDistinctAgg.topKDistinct(col("h"), col("id"), k).as("topk"))
      .select(col("key"), explode(col("topk")).as("e"))
      .select(col("key"), col("e.id").as("id"))
    val reference = capped.join(exclDf, Seq("key", "id"), "left_anti")
      .as[(Long, Long)].collect().toSet

    assert(fused == reference)
  }

  test("exclusion seen only in another partition still filters (merge path)") {
    // one partition carries only candidates, another only the exclusion row
    val cand = Seq((1L, 10L, 5.0, false), (1L, 11L, 4.0, false), (1L, 12L, 3.0, false))
    val excl = Seq((1L, 10L, 0.0, true))
    val df = cand.toDF("key", "id", "h", "cur").repartition(1)
      .unionByName(excl.toDF("key", "id", "h", "cur").repartition(1))
    val out = df.groupBy(col("key"))
      .agg(TopKDistinctExceptAgg.topKDistinctExcept(
        col("h"), col("id"), col("cur"), 2).as("ids"))
      .select(explode(col("ids")).as("id"))
      .as[Long].collect().toSet
    // cap keeps {10, 11} (h desc) — 10 burns a slot then is excluded at
    // eval, so 12 must NOT slide in (the anti-join-after-cap semantics)
    assert(out == Set(11L))
  }
}
