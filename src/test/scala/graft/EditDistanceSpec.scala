package graft

import graft.operators.TermStats

/** Pins the candidate contract of dedup_edit_distance after the sf1
  * scale-stress fix: pairs are generated ONLY through df-capped rare
  * shingles (the Containment pattern), so a same-length block with no
  * shared rare content generates nothing — never block² — while true
  * near-dups (which share rare shingles by construction of being
  * near-identical) verify with the exact banded Levenshtein distance. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("near-identical docs are found with the exact prefix distance") {
    // one token substitution deep in a shared rare-shingle context
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs(Seq(
      (1L, base),
      (2L, base.replace("theta", "iota")), // shares rare leading shingles
      (3L, "completely different content with other words entirely")))
    val out = TermStats.editDistancePairs(d, maxDist = 12)
      .select("doc_a", "doc_b", "dist").as[(Long, Long, Long)].collect()
    assert(out.length === 1)
    assert(out.head._1 === 1L && out.head._2 === 2L)
    // prefix(30) is identical for both docs -> dist 0 on the screen prefix
    assert(out.head._3 === 0L)
  }

  test("a same-length block sharing only high-df shingles generates ZERO pairs") {
    // 120 docs, identical length bucket, all sharing the shingle
    // "the quick brown" (df = 120 > maxDf = 50) but otherwise unique —
    // the old block self-join would have evaluated 120·119/2 = 7140
    // Levenshtein pairs here; the rare-shingle gate generates none.
    val block = (1L to 120L).map(i =>
      (i, f"the quick brown unique_$i%03d token_$i%03d other_$i%03d"))
    val out = TermStats.editDistancePairs(docs(block), maxDist = 12)
    assert(out.count() === 0L)
  }
}
