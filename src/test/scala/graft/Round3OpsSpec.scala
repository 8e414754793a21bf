package graft

import org.apache.spark.sql.functions._

import graft.operators.{CdcApply, GraphOps, TermStats, TextAnalysis}

/** Planted-structure checks for the round-3 operator batch — each operator
  * also has a DuckDB hash oracle via SparkEntry; these specs pin the
  * SEMANTICS on inputs where the right answer is known by construction. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  /** lineitem stand-in building a co-purchase graph: parts sharing an order
    * become a clique. Order keys are multiples of 100 so the copurchase
    * sample filter keeps them. */
  private def li(orders: Seq[(Long, Seq[Long])]) =
    orders.flatMap { case (ok, parts) =>
      parts.map(p => (ok, p, 1L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey")

  test("labelProp: two planted cliques get two labels") {
    // cliques {1,2,3,4} and {10,11,12,13}, no cross edges
    val df = li(Seq((100L, Seq(1L, 2L, 3L, 4L)), (200L, Seq(10L, 11L, 12L, 13L))))
    val out = GraphOps.labelProp(df, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
    assert(Set(out(1L), out(2L), out(3L), out(4L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L), out(13L)).size == 1)
    assert(out(1L) != out(10L))
  }

  test("kCore: pendant nodes peel away, the clique survives") {
    // 5-clique (every pair degree 4) + pendant 99 attached to node 1 only
    val df = li(Seq((100L, Seq(1L, 2L, 3L, 4L, 5L)), (200L, Seq(1L, 99L))))
    val out = GraphOps.kCore(df, k = 4).as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out.values.forall(_ == 4L))
  }

  test("hits: the part supplied by every supplier is the top authority") {
    // suppliers 1..4 all supply part 7; part 8 has one supplier
    val rows = Seq((100L, 7L, 1L), (100L, 7L, 2L), (100L, 7L, 3L), (100L, 7L, 4L),
      (100L, 8L, 1L)).toDF("l_orderkey", "l_partkey", "l_suppkey")
    val out = GraphOps.hits(rows, iters = 3)
      .as[(String, Long, Double)].collect()
    val parts = out.filter(_._1 == "part").map(r => r._2 -> r._3).toMap
    val top = parts.maxBy(_._2)
    assert(top._1 == 7L + GraphOps.PartBase)
    assert(parts(7L + GraphOps.PartBase) > parts(8L + GraphOps.PartBase))
  }

  test("scd2: versions partition the timeline with one open interval per key") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5L, "view", 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 5L, "cart", 0.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 5L, "cart", 0.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-04 00:00:00"), 5L, "buy", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = CdcApply.scd2(ev)
      .as[(Long, Long, String, String, Option[String], Boolean)].collect().sortBy(_._2)
    // repeated 'cart' collapses: 3 versions, not 4
    assert(out.length == 3)
    assert(out.map(_._3).toSeq == Seq("view", "cart", "buy"))
    // each version's valid_to is the next's valid_from; only the last is open
    assert(out(0)._5.contains(out(1)._4) && out(1)._5.contains(out(2)._4))
    assert(out.count(_._6) == 1 && out.last._6)
  }

  test("heavyHitters: equals the exact full-aggregation top-k") {
    val docs = (0 until 50).map { i =>
      val rep = if (i % 5 == 0) "alpha beta " * 4 else "gamma delta "
      (i.toLong, rep + s"uniq$i tail", "en", "s", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val fast = TermStats.heavyHitters(docs, k = 5)
      .as[(String, Long)].collect().toSeq
    val toks = split(lower(trim(col("text"))), "\\s+")
    val exact = docs.filter(size(toks) >= 2)
      .select(explode(transform(sequence(lit(0), size(toks) - 2),
        j => concat_ws(" ", get(toks, j), get(toks, j + 1)))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("bg")).limit(5)
      .as[(String, Long)].collect().toSeq
    assert(fast == exact)
  }

  test("qualityClassifier: score is the mean token weight and verdicts split") {
    val docs = Seq((1L, "aa bb cc"), (2L, "zz yy xx qq"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityClassifier(docs)
      .as[(Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 3L && out(2L)._2 == 4L)
    out.values.foreach { r =>
      assert(r._3 > -0.5 && r._3 < 0.5)
      assert(r._4 == (if (r._3 > 0.0) "keep" else "drop"))
    }
  }
}
