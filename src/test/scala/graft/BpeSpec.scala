package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("learns the obvious first merge and applies it hierarchically") {
    // "th" dominates: 6 occurrences across the corpus
    val d = docs("the then there", "the this that", "other")
    val (_, merges) = Bpe.train(d, nMerges = 2)
    assert(merges.head._2 == "t" && merges.head._3 == "h")
    // second merge builds ON the first (th+e: the ×2, then, there, other)
    assert(merges(1) == ((1L, "th", "e", 5L)))
  }

  test("single-pass replace variant: odd runs leave the middle symbol") {
    val d = docs("aaaaa")
    val (v, merges) = Bpe.train(d, nMerges = 1)
    assert(merges.head._2 == "a" && merges.head._3 == "a")
    // documented variant: " a a a a a " -> " aa a aa " (not Sennrich's aa aa a)
    val sym = v.filter(col("word") === "aaaaa").select(col("sym")).head().getString(0)
    assert(sym == "aa a aa")
    v.unpersist()
  }

  test("encode counts are bounded by chars and words, and merges shrink them") {
    val d = docs("banana bandana", "banana banana cabana")
    val enc = Bpe.bpeEncode(d, nMerges = 3).orderBy(col("doc_id")).collect()
    val words = Seq(Seq("banana", "bandana"), Seq("banana", "banana", "cabana"))
    enc.zipWithIndex.foreach { case (r, i) =>
      val (nWords, nSyms) = (r.getLong(1), r.getLong(2))
      assert(nWords == words(i).size)
      assert(nSyms >= nWords)                      // can't merge below 1 sym/word
      assert(nSyms < words(i).map(_.length).sum)   // 3 merges must shrink chars
    }
  }

  test("training is deterministic across runs and partitionings") {
    val d = docs("spark scala spark joins", "spark scala streams", "joins win")
    val a = Bpe.bpeTrain(spark, d, nMerges = 5).collect().toSeq
    val b = Bpe.bpeTrain(spark, d.repartition(7), nMerges = 5).collect().toSeq
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted)
  }

  test("vocab compaction is size-aware: a large vocab keeps >1 partition") {
    // 7 distinct words at 2 words/partition → ceil(7/2) = 4 training
    // partitions; the same corpus at the default divisor compacts to 1
    val d = docs("alpha beta gamma delta", "epsilon zeta eta alpha")
    val (vBig, _) = Bpe.train(d, nMerges = 1, wordsPerPartition = 2L)
    assert(vBig.rdd.getNumPartitions == 4)
    vBig.unpersist()
    val (vOne, _) = Bpe.train(d, nMerges = 1)
    assert(vOne.rdd.getNumPartitions == 1)
    vOne.unpersist()
  }

  test("consumers reuse the train-once merge artifact; applyMerges replays training exactly") {
    val d = docs("the then there", "the this that", "other")
    val (vTrained, merges) = Bpe.train(d, nMerges = 3)
    val replayed = Bpe.applyMerges(Bpe.vocab(d), merges)
      .select(col("word"), col("sym")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    vTrained.select(col("word"), col("sym")).collect().foreach { r =>
      assert(replayed(r.getString(0)) == r.getString(1))
    }
    vTrained.unpersist()
    // memo: same corpus plan + nMerges returns the identical artifact object
    val m1 = Bpe.mergesFor(d, 3)
    val m2 = Bpe.mergesFor(d, 3)
    assert(m1 eq m2)
    assert(m1 == merges)
  }
}
