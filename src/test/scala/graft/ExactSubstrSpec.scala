package graft

import org.apache.spark.sql.functions._

import graft.operators.ExactSubstr

class ExactSubstrSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("a sentence shared by two docs is flagged in both, with exact bounds") {
    val shared = "the quick brown fox jumps over the lazy dog tonight" // 10 tokens
    val d = docs(
      s"alpha beta $shared gamma delta",
      s"one two three four $shared")
    val spans = ExactSubstr.substringDedup(d, k = 5, minSpanTokens = 8)
      .orderBy(col("doc_id")).collect()
    assert(spans.length == 2)
    // doc 0: shared tokens occupy positions 2..11; doc 1: positions 4..13
    assert(spans(0).getLong(0) == 0L && spans(0).getLong(1) == 2L && spans(0).getLong(2) == 11L)
    assert(spans(1).getLong(0) == 1L && spans(1).getLong(1) == 4L && spans(1).getLong(2) == 13L)
  }

  test("self-repetition within one doc is flagged; unique docs are not") {
    val phrase = "to be or not to be that is question here" // 10 tokens
    val d = docs(
      s"$phrase interlude $phrase",
      "completely unique words appear exactly once in this entire corpus today")
    val spans = ExactSubstr.substringDedup(d, k = 5, minSpanTokens = 8).collect()
    assert(spans.nonEmpty)
    assert(spans.forall(_.getLong(0) == 0L))
    // both copies of the phrase are covered by flagged spans
    val covered = spans.map(r => (r.getLong(1), r.getLong(2)))
    assert(covered.exists { case (s, e) => s <= 0 && e >= 9 })
    assert(covered.exists { case (s, e) => s <= 11 && e >= 20 })
  }

  test("span length below minSpanTokens is suppressed") {
    // shared run of exactly 5 tokens = one dup shingle = 5-token span < 8
    val d = docs("aa bb cc dd ee xx yy", "zz ww aa bb cc dd ee")
    assert(ExactSubstr.substringDedup(d, k = 5, minSpanTokens = 8).count() == 0)
    // but with minSpanTokens = 5 it surfaces
    assert(ExactSubstr.substringDedup(d, k = 5, minSpanTokens = 5).count() == 2)
  }

  test("result is invariant to input partitioning") {
    val shared = "a b c d e f g h i j"
    val d = docs(s"$shared tail one", s"head $shared", "unrelated text entirely here")
    val a = ExactSubstr.substringDedup(d, 5, 8).collect().map(_.toString).sorted.toSeq
    val b = ExactSubstr.substringDedup(d.repartition(7), 5, 8)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
