package graft

import graft.operators.Dedup

class DedupResolveSpec extends SparkSpec {
  import spark.implicits._

  // docs 1~2~3 form a transitive near-dup chain (1-2 and 2-3 overlap, 1-3
  // less so); docs 10, 11 are an independent pair; doc 20 is unique
  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),
    (3L, "beta gamma delta epsilon eta theta"),
    (10L, "one two three four five six"),
    (11L, "one two three four five seven"),
    (20L, "totally different words entirely here now"))
    .map { case (id, t) => (id, t, "en", t.length.toLong) }
    .toDF("doc_id", "text", "lang", "n_chars")

  test("resolve clusters transitively and keeps exactly one doc per cluster") {
    val r = Dedup.resolve(docs, w = 3, threshold = 0.3)
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    // chain 1~2~3 collapses to canonical 1 even if (1,3) was never a pair
    assert(r(1L)._2 == 1L && r(1L)._3)
    assert(r(2L)._2 == 1L && !r(2L)._3)
    assert(r(3L)._2 == 1L && !r(3L)._3)
    assert(r(10L)._2 == 10L && r(10L)._3)
    assert(r(11L)._2 == 10L && !r(11L)._3)
    // unique docs never enter the pair graph at all
    assert(!r.contains(20L))
  }
}
