package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, DomainMix, GraphOps, MinhashPortable, NgramLm, Relational, Search}

/** Semantic pins for the round-3 retrieval/curation batch — every operator
  * here is also hash-oracle-green via SparkEntry; these tests fix the
  * BEHAVIOR on inputs where the right answer is known by construction. */
class Round3RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("personalizedPageRank: the source node outranks everything else") {
    // clique of 4 (order 100) plus a far pair (order 200)
    val li = Seq((100L, 1L, 1L), (100L, 2L, 1L), (100L, 3L, 1L), (100L, 4L, 1L),
      (200L, 10L, 1L), (200L, 11L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val out = GraphOps.personalizedPageRank(li, iters = 3)
      .as[(Long, Double)].collect().toMap
    // source = min node (1); teleport keeps it on top, and mass never
    // reaches the disconnected component
    assert(out(1L) == out.values.max)
    assert(!out.contains(10L) && !out.contains(11L))
  }

  test("rrfFusion: a doc ranked in both lists beats docs in only one") {
    val docs = Seq(
      (0L, "filter join window filter join", "en", "s", 10L), // kw hit + has vec 0.. but vec_id 0 is the query
      (1L, "filter join window", "en", "s", 10L),
      (2L, "nothing relevant here", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // embeddings: vec 1 is closest to query vec 0; vec 2 far
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 0f, 1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Search.rrfFusion(docs, emb, Seq("filter", "join", "window"),
        queryVecId = 0L, n = 5, limit = 5)
      .select(col("doc_id"), col("rrf")).as[(Long, Double)].collect().toMap
    // doc 1: keyword hit AND nearest vector → two rrf terms; doc 2: vector-only
    assert(out(1L) > out(2L))
  }

  test("ngram_lm: repetitive doc scores higher mean bigram probability") {
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat"), // high-frequency bigrams
      (2L, "one two three four five six seven"))   // all singleton bigrams
      .toDF("doc_id", "text")
    val out = NgramLm.lmScore(docs)
      .select(col("doc_id"), col("mean_p")).as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
  }

  test("budgetSample: per-domain cumulative tokens never exceed the budget") {
    val docs = (0 until 40).map(i =>
      (i.toLong, ("w " * 50).trim, if (i % 2 == 0) "en" else "de", s"src${i % 3}", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DomainMix.budgetSample(docs, tokenBudget = 120L)
      .as[(String, Long, Long, Long)].collect()
    val bySrc = out.groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.values.foreach { rows =>
      assert(rows.map(_._4).max <= 120L)      // budget respected
      assert(rows.map(_._3).sum == rows.map(_._4).max) // cum = sum of picks
    }
  }

  test("datasetCard: totals are exact on a known corpus") {
    val docs = Seq(
      (1L, "a b c", "en", "s0", 5L),
      (2L, "d e", "de", "s0", 3L),
      (3L, "f", "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.datasetCard(docs)
      .as[(String, Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("s0") == (("s0", 2L, 8L, 5L, 2L, 0.5)))
    assert(out("s1") == (("s1", 1L, 1L, 1L, 1L, 1.0)))
  }

  test("cohortMatrix: week-0 cell counts every cohort member") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    val ev = Seq(
      (1L, ts(1), 5L, "a", 0.0, "{}"),  // user 5 weeks w and w+1
      (2L, ts(9), 5L, "a", 0.0, "{}"),
      (3L, ts(2), 6L, "a", 0.0, "{}"))  // user 6 week w only
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.cohortMatrix(ev)
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toList.sortBy(_._1)
    // both users share the first epoch-week → week0 = 2 users, week1 = 1
    assert(out == List((0L, 2L), (1L, 1L)))
  }

  test("minhash portable: identical docs share the full signature, est_jaccard 1.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words entirely here"))
      .toDF("doc_id", "text")
    val pairs = MinhashPortable.minhashLshPortable(docs)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }
}
