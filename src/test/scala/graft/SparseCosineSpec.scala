package graft

import graft.operators.TermStats

/** Pins the All-Pairs prefix-filtering contract of sparse_cosine
  * (TermStats.sparseCosine, after Bayardo/Ma/Srikant WWW'07): a
  * stopword-heavy block must produce ZERO candidate pairs — not merely
  * zero post-filter rows — because a high-df term's contribution bound is
  * negligible and its indexed posting list is empty. True near-dups
  * (which concentrate cosine mass in rare shared terms) are found with
  * EXACT scores: prefix filtering is lossless, so the output matches the
  * full quadratic join row for row. */
class SparseCosineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) =
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("planted stopword block stays sub-quadratic: ZERO candidates, not just zero rows") {
    // 200 docs in ONE (lang, source) block, ALL sharing the stopword
    // "the"; each otherwise unique. A raw posting self-join would emit
    // 200·199/2 = 19900 candidate pairs through "the" alone. Under
    // prefix filtering "the" (high df ⇒ sorts first, tiny normalized
    // weight ⇒ never pushes the running bound to minCos before the
    // unique terms do) is indexed by NO doc, and the unique terms have
    // df = 1 — so the candidate join emits NOTHING. The bound is pinned
    // on the candidate table itself, upstream of the cosine filter.
    val stopBlock = docs((1L to 200L).map(i => (i, s"the unique_$i only_$i")))
    assert(TermStats.sparseCosineCandidates(stopBlock, minCos = 0.8).count() === 0L)
    assert(TermStats.sparseCosine(stopBlock, minCos = 0.8).count() === 0L)
  }

  test("near-dups sharing rare terms are found with the EXACT full-join score") {
    // Two near-identical docs sharing 20 rare terms (one unique term
    // each) plus the stopword, in a sea of 50 stopword-sharing filler
    // docs. N = 52: w(the) = 52/52 = 1, w(shared) = 52/2 = 26,
    // w(unique) = 52/1 = 52. Prefix filtering is lossless, so
    // cos = (20·26² + 1·1²)/(1 + 20·26² + 52²) = 13521/16225 exactly.
    val shared = (1 to 20).map(k => s"raresharedterm_$k").mkString(" ")
    val filler = (100L to 149L).map(i => (i, s"the common filler_$i"))
    val d = docs(Seq((1L, s"the $shared alpha"), (2L, s"the $shared beta")) ++ filler)
    val out = TermStats.sparseCosine(d, minCos = 0.8)
      .select("doc_a", "doc_b", "cos").as[(Long, Long, Double)].collect()
    assert(out.length === 1)
    assert(out.head._1 === 1L && out.head._2 === 2L)
    assert(math.abs(out.head._3 - 13521.0 / 16225.0) < 1e-12)
  }

  test("LOSSLESSNESS PROPERTY: filtered output == independent brute force on random corpora") {
    // The All-Pairs guarantee is a theorem, so test it like one: on
    // seeded pseudo-random corpora, the operator's pairs must match an
    // INDEPENDENT driver-side brute-force (full tf-idf vectors, all
    // O(n²) pairs — no posting index, no prefix filter, no shared code
    // path) pair for pair. Vocab is small so term overlap is heavy —
    // the adversarial regime for an inverted-index filter.
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 20).map(i => s"w$i")
      val corpus = (1L to 60L).map { id =>
        val len = 3 + rnd.nextInt(10)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val minCos = 0.8
      // independent reference: tf·N/df weights, cosine over all pairs
      val n = corpus.length.toDouble
      val tf: Map[Long, Map[String, Long]] = corpus.map { case (id, t) =>
        id -> t.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
      }.toMap
      val df: Map[String, Long] = corpus.flatMap(_._2.split(" ").distinct)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      def vec(id: Long): Map[String, Double] =
        tf(id).map { case (t, f) => t -> f * n / df(t) }
      def cos(a: Long, b: Long): Double = {
        val (va, vb) = (vec(a), vec(b))
        val dot = va.keysIterator.filter(vb.contains).map(t => va(t) * vb(t)).sum
        val na = math.sqrt(va.values.map(x => x * x).sum)
        val nb = math.sqrt(vb.values.map(x => x * x).sum)
        dot / (na * nb)
      }
      val expected = (for {
        a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
        c = cos(a, b) if c >= minCos
      } yield (a, b)).toSet

      val got = TermStats.sparseCosine(docs(corpus), minCos = minCos)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      // pairs landing within 1 ulp of the threshold could legitimately
      // differ between driver float math and the engine's decimal-exact
      // path — exclude only those from the equality (none so far)
      val borderline = (expected ++ got)
        .filter { case (a, b) => math.abs(cos(a, b) - minCos) < 1e-9 }
      assert((expected -- borderline) === (got -- borderline),
        s"seed $seed: prefix filtering lost or invented pairs: " +
          s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("sparse_topk: per-doc lists are k-bounded, symmetric, and ranked (cos desc, id asc)") {
    // A 4-clique of near-identical docs (pairwise cos > 0.8) + filler:
    // with k = 2 each clique member keeps exactly 2 of its 3 true
    // neighbors, rank 1 strictly the best, ties broken by neighbor id.
    // 80 shared terms (df=4 ⇒ w=N/4) vs one unique tail (df=1 ⇒ w=N):
    // cos ≈ (1 + 80·(N/4)²)/(1 + 80·(N/4)² + N²) = 0.833 at N=44.
    val shared = (1 to 80).map(j => s"cliqueterm_$j").mkString(" ")
    val filler = (100L to 139L).map(i => (i, s"the common filler_$i"))
    val d = docs((1L to 4L).map(i => (i, s"the $shared tail_$i")) ++ filler)
    val all = TermStats.sparseCosine(d, minCos = 0.8).count()
    assert(all === 6L) // the full clique: C(4,2) undirected pairs
    val out = TermStats.sparseTopK(d, minCos = 0.8, k = 2)
      .select("doc_id", "neighbor_id", "rn", "cos")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 8) // 4 docs × k=2, down from 12 directed pairs
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet === Set(1L, 2L, 3L, 4L))
    for ((doc, rows) <- byDoc) {
      assert(rows.length === 2, s"doc $doc list not k-bounded")
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === Seq(1L, 2L), s"doc $doc ranks not dense")
      // rank order is cos desc then neighbor_id asc
      assert(sorted(0)._4 >= sorted(1)._4)
      if (sorted(0)._4 == sorted(1)._4) assert(sorted(0)._2 < sorted(1)._2)
      // in an all-ties clique the deterministic winner is the smallest id
      assert(sorted(0)._2 === (1L to 4L).filter(_ != doc).min
        || sorted(0)._4 > sorted(1)._4)
    }
  }

  test("identical docs score cos ~ 1.0 (norms and dots use the same postings)") {
    // cos within 1 ulp of 1.0 (not exactly 1.0: norm is sqrt(nsq) and
    // sqrt(x)·sqrt(x) = x is not an IEEE identity).
    val filler = (10L to 29L).map(i => (i, s"the pad_$i"))
    val d = docs(Seq((1L, "the raredup_x raredup_y"), (2L, "the raredup_x raredup_y")) ++ filler)
    val out = TermStats.sparseCosine(d, minCos = 0.5)
      .select("doc_a", "doc_b", "cos").as[(Long, Long, Double)].collect()
    assert(out.length === 1)
    assert(math.abs(out.head._3 - 1.0) < 1e-12)
  }
}
