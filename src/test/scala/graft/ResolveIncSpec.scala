package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, MinhashPortable, ResolveInc}

/** dedup_resolve_inc: the maintained (pair, cluster) table composed from
  * the proven upsert/delete primitives must reach exactly the state a full
  * re-resolve builds — plus the delete-then-reinsert identity the other
  * index-maintenance members pin. */
class ResolveIncSpec extends SparkSpec {
  import spark.implicits._

  // identical texts ⇒ identical signatures ⇒ certain LSH pairs; distinct
  // texts pair with nothing. id%10 slices: 10,20 arrive; 5,15,25 depart.
  private val A = "alpha beta gamma delta epsilon"
  private val B = "zeta eta theta iota kappa"
  private val C = "lambda mu nu xi omicron"
  private val D = "pi rho sigma tau upsilon"
  private val E = "phi chi psi omega alef"

  private def docs: DataFrame = Seq(
    (1L, A), (2L, A), (5L, A),     // base cluster {1,2,5}
    (3L, B), (13L, B),             // base cluster {3,13}
    (7L, C),                       // base singleton (pairless — not emitted)
    (21L, D),                      // base, paired by arrival 20
    (15L, E), (25L, E),            // both depart — pair retired, both drop
    (10L, A),                      // arrival joining cluster A
    (20L, D)                       // arrival pairing with base 21
  ).toDF("doc_id", "text")
    .withColumn("lang", lit("en")).withColumn("source", lit("t"))
    .withColumn("n_chars", length(col("text")).cast("long"))

  private def verdicts(df: DataFrame): Set[(Long, Long, Boolean)] =
    df.select("doc_id", "canonical_id", "keep").as[(Long, Long, Boolean)]
      .collect().toSet

  test("maintained state equals full re-resolve over the post-change corpus") {
    val got = verdicts(ResolveInc.resolveInc(docs))
    // from-scratch over the post-change corpus (departures gone)
    val post = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 5L)
    val sig = MinhashPortable.minhashPortable(post)
    val keys = MinhashPortable.bandKeys(sig, 4)
    val pairs = MinhashPortable.pairsFromIndex(sig, keys)
    val want = verdicts(GraphOps.labelPropagation(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("node").as("doc_id"), col("label").as("canonical_id"),
        (col("node") === col("label")).as("keep")))
    assert(got === want)
    // and the scenario is non-trivial: arrival merged into cluster A,
    // arrival-made pair {20,21}, departed-only cluster {15,25} gone
    assert(got === Set((1L, 1L, true), (2L, 1L, false), (10L, 1L, false),
      (3L, 3L, true), (13L, 3L, false), (20L, 20L, true), (21L, 20L, false)))
  }

  test("delta form: base ⊎ delta reconstructs the maintained labeling (CDC identity)") {
    val delta = ResolveInc.resolveIncDelta(docs)
      .select("doc_id", "op", "canonical_id", "keep")
      .as[(Long, String, Long, Boolean)].collect().toSet
    // expected ops: 10 arrives into cluster A ('I'); 20 pairs with base
    // singleton 21 (both newly labeled — 'I'); departures retract 5 (from
    // cluster A) and the departed-only cluster {15,25} ('D', restating the
    // retracted base verdicts); the surviving docs 1,2,3,13 keep their
    // canonicals, so no 'U' rows
    assert(delta === Set(
      (10L, "I", 1L, false), (20L, "I", 20L, true), (21L, "I", 20L, false),
      (5L, "D", 1L, false), (15L, "D", 15L, true), (25L, "D", 15L, false)))
    // CDC identity: base verdicts − D-rows − upserted ids + I/U rows
    // equals the full maintained output
    val baseV = Set((1L, 1L, true), (2L, 1L, false), (5L, 1L, false),
      (3L, 3L, true), (13L, 3L, false), (15L, 15L, true), (25L, 15L, false))
    val touched = delta.map(_._1)
    val applied = baseV.filterNot(v => touched.contains(v._1)) ++
      delta.filter(_._2 != "D").map(d => (d._1, d._3, d._4))
    assert(applied === verdicts(ResolveInc.resolveInc(docs)))
  }

  test("insert-then-delete of the same batch is the identity on the standing state") {
    val base = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L)
    val sigBase = MinhashPortable.minhashPortable(base)
    val keysBase = MinhashPortable.bandKeys(sigBase, 4)
    val pairsBase = MinhashPortable.pairsFromIndex(sigBase, keysBase)
    val labelsBase = GraphOps.labelPropagation(
      pairsBase.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val batch = docs.filter(pmod(col("doc_id"), lit(10L)) === 0L)
    val roundTrip = ResolveInc.resolveIncFrom(sigBase, keysBase, pairsBase,
      labelsBase, arrivals = batch, departedIds = batch.select(col("doc_id")))
    val standing = labelsBase.select(col("node").as("doc_id"),
      col("label").as("canonical_id"), (col("node") === col("label")).as("keep"))
    assert(verdicts(roundTrip) === verdicts(standing))
  }
}
