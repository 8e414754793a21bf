package graft

import graft.operators.PackBuilder

class PackBuilderSpec extends SparkSpec {
  import spark.implicits._

  // 12 docs, scores 3/2/1 by term count, 100 chars each; budget 450 fits
  // exactly the top 4 of the global (score desc, doc_id) order.
  private def docs = (1L to 12L).map { i =>
    val t = if (i <= 4) "key key key" else if (i <= 8) "key key" else "key"
    (i, t, 100L)
  }.toDF("doc_id", "text", "n_chars")

  test("pack takes greedily under the budget in global rank order") {
    val r = PackBuilder.pack(docs, Seq("key"), budgetChars = 450L)
      .orderBy("cum_chars").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 3L, 100L), (2L, 3L, 200L), (3L, 3L, 300L), (4L, 3L, 400L)))
  }

  test("pack survives a downstream coalesce (slice ids must not collapse)") {
    // Regression: TaskContext.getPartitionId inside the prefix-sum kernel
    // reported the coalesced task's id (0 for every slice), zeroing all
    // offsets. The split index from mapPartitionsWithIndex is stable.
    val r = PackBuilder.pack(docs, Seq("key"), budgetChars = 450L)
      .coalesce(1).as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(r.length == 4)
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r.last._3 == 400L)
  }
}
