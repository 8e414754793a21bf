package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.{Chunking, Dedup, Relational, TextAnalysis}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b")
    val cos = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).as[Double].collect()
    assert(math.abs(cos(0) - 1.0) < 1e-12)
    assert(math.abs(cos(1)) < 1e-12)
  }

  test("rankDocs test-class penalty halves the score unless the query asks for tests") {
    import graft.operators.Search
    // r10: the penalty keys on the PSEUDO-PATH source/doc_<id>.md (the
    // reference penalizes on path only — ranker.py:52) or a test-class
    // source shard; text content no longer triggers it (a doc merely
    // containing 'latest' used to be halved)
    val docs = Seq(
      (1L, "spark join guide", "en", "src0"),    // boosted source, no penalty
      (2L, "spark join guide", "en", "src17"),   // test-class source: ×0.5
      (3L, "spark join guide", "en", "my_tests"), // 'test' in path: ×0.5
      (4L, "spark join latest notes", "en", "src5"), // 'test' only in TEXT: no penalty
      (5L, "spark join guide", "en", "src5")     // plain doc, guard-comparison twin
    ).toDF("doc_id", "text", "lang", "source")
    val scores = Search.rankDocs(docs, Seq("spark", "join"), "spark join", "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // identical boosts apart from source: 2.0·1.6·1.5 = 4.8; src0 also ×1.2
    assert(math.abs(scores(1L) - 4.8 * 1.2) < 1e-12)
    assert(math.abs(scores(2L) - 4.8 * 0.5) < 1e-12, s"test-class source not penalized: $scores")
    assert(math.abs(scores(3L) - 4.8 * 0.5) < 1e-12, s"path marker not penalized: $scores")
    assert(math.abs(scores(4L) - 4.8) < 1e-12,
      s"text-only 'test' substring must NOT be penalized (path-keyed): $scores")
    // querying for tests disables the penalty (ranker.py:52 guard):
    // penalty-class docs score identically to the plain twin (same text)
    val wanted = Search.rankDocs(docs, Seq("test"), "test", "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wanted(2L) == wanted(5L) && wanted(3L) == wanted(5L),
      s"query asking for tests must not penalize test docs: $wanted")
    // SQL twin mirrors the penalty (and its guard) verbatim
    assert(Search.rankDocsSql(Seq("spark", "join"), "spark join", "en").contains("0.5"))
    assert(!Search.rankDocsSql(Seq("test"), "test", "en").contains("0.5"))
  }

  test("chunking covers the text with the configured overlap") {
    val text = ("x" * 1000)
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.chunkFixed(df, size = 512, overlap = 64)
      .orderBy("chunk_index").as[(Long, Long, String)].collect()
    // 1000 chars, step 448 → ceil((1000-64)/448) = 3 chunks
    assert(chunks.length == 3)
    assert(chunks(0)._3.length == 512)
    assert(chunks(1)._3.length == 512)
    assert(chunks(2)._3.length == 1000 - 2 * 448)
    // short text → exactly one chunk
    val one = Chunking.chunkFixed(Seq((2L, "short")).toDF("doc_id", "text")).collect()
    assert(one.length == 1)
  }

  test("word-mode chunking matches the reference's greedy char-budget loop") {
    // chunkSize 10, overlap 1: words of 2 chars (+1 space each) → the
    // 4th word overflows (9+3>10), chunk saved, last word carried over
    val df = Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val chunks = Chunking.chunkWords(df, chunkSize = 10, overlapWords = 1)
      .orderBy("chunk_index").as[(Long, Long, String)].collect().map(_._3)
    assert(chunks.toSeq == Seq("aa bb cc", "cc dd ee"))
    // a single word longer than the budget still yields one chunk
    val long = Chunking.chunkWords(Seq((2L, "x" * 40)).toDF("doc_id", "text"),
      chunkSize = 10, overlapWords = 1).collect()
    assert(long.length == 1)
    // whitespace runs collapse like str.split() in the reference
    val ws = Chunking.chunkWords(Seq((3L, "  a   b  ")).toDF("doc_id", "text"),
      chunkSize = 100, overlapWords = 1).as[(Long, Long, String)].collect()
    assert(ws.head._3 == "a b")
  }

  test("shingles produce size-w+1 distinct w-grams") {
    val df = Seq(("a b c d e")).toDF("text")
    val sh = df.select(Dedup.shingles(col("text")).as("s")).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d", "c d e"))
    // shorter than w: single partial shingle
    val sh2 = Seq(("a b")).toDF("text")
      .select(Dedup.shingles(col("text")).as("s")).as[Seq[String]].head()
    assert(sh2 == Seq("a b"))
  }

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df).orderBy("keeper").as[(String, Long, Long)].collect()
    assert(out.map(r => (r._2, r._3)).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash signature is deterministic and sized") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val s1 = Dedup.minhashSignature(df).as[(Long, Seq[Long])].head()
    val s2 = Dedup.minhashSignature(df).as[(Long, Seq[Long])].head()
    assert(s1._2.length == 128)
    assert(s1 == s2)
  }

  test("near-identical docs collide in minhash-lsh, unrelated don't") {
    val a = "the quick brown fox jumps over the lazy dog again and again until done"
    val b = a.replace("done", "finished")
    val c = "completely different content with no overlap whatsoever in any shingle at all"
    val df = Seq((1L, a, "en", 70L), (2L, b, "en", 70L), (3L, c, "en", 77L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val pairs = Dedup.minhashLsh(df, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash hamming distance small for near-dups, large for different") {
    val a = "the quick brown fox jumps over the lazy dog again and again until done"
    val b = a.replace("done", "finished")
    val c = "completely different content with no overlap whatsoever in any shingle at all"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = Dedup.simhash(df).as[(Long, Long)].collect().toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)))
  }

  test("dsum is exact and order-independent") {
    val df = (1 to 1000).map(i => i / 100.0).toDF("v").repartition(7)
    val s = df.agg(Relational.dsum(col("v")).as("s")).as[Double].head()
    assert(s == 5005.0)
  }

  test("fingerprint is stable") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val f1 = TextAnalysis.fingerprint(df).as[(Long, Long)].head()
    val f2 = TextAnalysis.fingerprint(df).as[(Long, Long)].head()
    assert(f1 == f2 && f1._2 > 0)
  }
}
