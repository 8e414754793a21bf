package graft

import graft.operators.RagRefresh

/** Pins the incremental-ingest contract of rag_refresh: a changed doc's
  * edited chunks are replaced (and ONLY those — untouched leading chunks
  * stay `kept`), added docs insert, removed docs vanish, unchanged docs
  * are untouched. Doc classes follow the snapshot_diff convention:
  * OLD = id % 5 != 4, NEW = id % 3 != 2, text + ' v2' when id % 7 == 0. */
class RagRefreshSpec extends SparkSpec {
  import spark.implicits._

  test("changed docs replace only their edited tail; added insert; removed vanish; unchanged keep") {
    // id 7: in OLD and NEW, % 7 == 0 → text gets ' v2' → changed.
    //       Long text → several chunks; only the tail chunk differs.
    // id 9: in OLD (9%5=4? no, 9%5=4 → excluded from OLD!) — pick 19:
    // id 19: 19%5=4 → NOT in OLD; 19%3=1 → in NEW → added.
    // id 2: 2%5=2 → in OLD; 2%3=2 → NOT in NEW → removed.
    // id 1: in both, %7 != 0 → unchanged.
    val longText = (1 to 300).map(i => s"tok$i").mkString(" ") // > 1 chunk at 512/64
    val d = Seq(
      (7L, longText), (19L, "fresh new doc"), (2L, "doomed doc"), (1L, "stable doc"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = (0L until 16L).map(i =>
      (i, Array.tabulate(64)(j => if (j == i % 64) 1f else 0f))).toDF("vec_id", "embedding")
    val out = RagRefresh.ragRefresh(d, emb)
      .select("chunk_id", "doc_id", "action").as[(Long, Long, String)].collect()
    val byDoc = out.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._3).toMap).toMap

    assert(!byDoc.contains(2L), "removed doc's chunks must leave the index")
    assert(byDoc(19L).values.toSet === Set("inserted"), "added doc inserts every chunk")
    assert(byDoc(1L).values.toSet === Set("kept"), "unchanged doc is untouched")
    // changed doc: leading chunks identical (windows before the edit), the
    // tail chunk re-embeds as updated — incremental, not wholesale
    val ch7 = byDoc(7L)
    assert(ch7.values.toSet === Set("kept", "updated"))
    assert(ch7(ch7.keys.max) === "updated", "the edited tail chunk is the updated one")
    assert(ch7.filter(_._2 == "kept").nonEmpty, "untouched leading chunks stay kept")
  }
}
