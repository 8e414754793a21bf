package graft

import org.apache.spark.sql.functions._

import graft.operators.Search
import graft.sources.Tables

/** mmr_rerank_dist: the distributed per-shard-argmax MMR must follow the
  * driver-loop version's trajectory EXACTLY — same winners, same scores,
  * same tie-breaks — and must keep working past the driver version's
  * nCand ≤ 1024 cap (the cap existed because of the collected nCand² sim
  * matrix, which the distributed form never builds). */
class MmrDistSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Double)] =
    df.select("rank", "vec_id", "rel", "mmr").as[(Long, Long, Double, Double)]
      .collect().toSeq.sortBy(_._1)

  test("distributed MMR == driver-loop MMR on the bounded pool") {
    val emb = Tables.embeddings(spark, dir)
    assert(rows(Search.mmrRerankDist(emb)) === rows(Search.mmrRerank(emb)))
  }

  test("distributed MMR matches with a sharded pool and k > default") {
    // force a genuinely partitioned pool: many shards, bigger pool + k
    val emb = Tables.embeddings(spark, dir).repartition(7)
    assert(rows(Search.mmrRerankDist(emb, nCand = 100, k = 8)) ===
      rows(Search.mmrRerank(emb, nCand = 100, k = 8)))
  }

  test("distributed MMR accepts pools past the driver version's cap") {
    val emb = Tables.embeddings(spark, dir)
    // the driver version refuses this size by contract; the distributed
    // form runs it (the actual corpus may be smaller — the LIMIT just
    // stops binding, which is the point: nothing scales with nCand²)
    intercept[IllegalArgumentException](Search.mmrRerank(emb, nCand = 2000))
    val got = rows(Search.mmrRerankDist(emb, nCand = 2000))
    assert(got.nonEmpty && got.map(_._1) == (1L to got.length))
  }
}
