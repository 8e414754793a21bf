package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Semantic assertions for the round-2 curation operators — properties the
  * hash oracle can't express (flattening direction, reassembly invariants,
  * clustering sanity).
  */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def docs = Tables.documents(spark, dir)
  private def emb = Tables.embeddings(spark, dir)

  test("domain_mix upweights minority domains relative to the majority") {
    val rates = DomainMix.domainMix(docs)
      .groupBy("lang").agg(first("rate").as("rate"), count(lit(1)).as("kept"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // en dominates the corpus (218/500 docs) — temperature sampling must
    // give it the LOWEST keep-rate
    assert(rates("en") == rates.values.min,
      s"majority lang should have the lowest keep-rate: $rates")
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
  }

  test("line_dedup preserves every block as either kept or dropped") {
    val out = Boilerplate.lineDedup(docs)
    val span = 3
    val bad = out
      .join(docs, "doc_id")
      .withColumn("n_blocks",
        ((size(split(trim(col("text")), "\\s+")) - 1) / span).cast("int") + 1)
      .filter(col("n_kept") + col("n_dropped") =!= col("n_blocks"))
      .count()
    assert(bad == 0, s"$bad docs where kept+dropped != total blocks")
    // the pass must actually remove something on this corpus
    assert(out.agg(sum("n_dropped")).head.getLong(0) > 0)
  }

  test("decontaminate never flags eval docs and only flags true overlaps") {
    val out = Decontaminate.decontaminate(docs)
    assert(out.filter(col("doc_id") % 29 === 0).count() == 0,
      "eval docs must not appear as contaminated training docs")
    // inner-join semantics: every reported doc has at least one real overlap
    assert(out.filter(col("n_hit_ngrams") < 1 || col("n_eval_docs") < 1).count() == 0,
      "reported contamination must have >= 1 hit n-gram and eval doc")
  }

  test("doc_cluster emits at most k clusters and improves over init") {
    val out = Cluster.kmeans(emb, k = 8, iters = 1).cache()
    val clusters = out.select("cluster").distinct().count()
    assert(clusters <= 8 && clusters > 1)
    // every vector lands somewhere, exactly once
    assert(out.count() == emb.count())
    // one Lloyd update must not lose cohesion vs the first-k init
    // assignment (tolerance for the cosine-vs-mean objective mismatch);
    // absolute cohesion is low on this corpus by construction — true
    // neighbors sit near cos 0.4 (see RecallSpec)
    val after = out.agg(avg("cos_to_centroid")).head.getDouble(0)
    val init = Cluster.kmeans(emb, k = 8, iters = 0)
      .agg(avg("cos_to_centroid")).head.getDouble(0)
    assert(after >= init - 0.01, f"Lloyd update lost cohesion: $init%.3f -> $after%.3f")
    assert(after > 0.1, f"suspiciously low cohesion: $after%.3f")
  }

  test("semdedup_scaled: clamped k at small n, scaled k + tighter candidate bound at larger n") {
    // n=500 → ceil(500/64)=8 clamps to kMin: the scaled variant IS the
    // fixed-k semdedup at this size (pair-set identical)
    val base = Cluster.semdedup(emb).collect().map(_.toSeq).toSet
    val scaled = Cluster.semdedupScaled(emb).collect().map(_.toSeq).toSet
    assert(scaled == base, "at n=500 the clamp must reproduce fixed k=8")

    // n=2000 → k=ceil(2000/64)=32: the output matches semdedup(k=32) and
    // the candidate bound Σ n_c·(n_c−1)/2 over the learned partition is
    // strictly tighter than fixed k=8's — the cluster-count knob the
    // natural-density measurement identified (SCALING.md r10)
    val emb01 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val s01 = Cluster.semdedupScaled(emb01)
    val k32 = Cluster.semdedup(emb01, k = 32)
    assert(s01.collect().map(_.toSeq).toSet == k32.collect().map(_.toSeq).toSet,
      "at n=2000 the scaled variant must train a 32-way partition")
    def candidates(k: Int): Long = Cluster.kmeans(emb01, k = k)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .agg(sum((col("n") * (col("n") - 1) / lit(2)).cast("long"))).head.getLong(0)
    val c8 = candidates(8)
    val c32 = candidates(32)
    info(s"within-cell candidate pairs at n=2000: k=8 -> $c8, k=32 -> $c32")
    assert(c32 < c8, s"scaled k must tighten the candidate bound: k=8=$c8 k=32=$c32")
  }

  test("farthest-point seeding holds or beats first-k cohesion") {
    val cohFirst = Cluster.kmeans(emb, k = 8, iters = 1)
      .agg(avg("cos_to_centroid")).head.getDouble(0)
    val cohFar = Cluster.kmeans(emb, k = 8, iters = 1, init = "farthest")
      .agg(avg("cos_to_centroid")).head.getDouble(0)
    info(f"cohesion: first-k=$cohFirst%.3f farthest=$cohFar%.3f")
    // farthest seeding spreads the initial centroids; after one Lloyd
    // update it should not be materially worse than first-k (and is
    // usually better on clustered data)
    assert(cohFar >= cohFirst - 0.02,
      f"farthest seeding lost cohesion: $cohFirst%.3f -> $cohFar%.3f")
  }

  test("pq codes stay in range and reconstruct a plausible score") {
    val enc = ProductQuant.pqEncode(emb)
    val bad = enc.filter(
      exists(col("codes"), c => c < 0 || c > 63) || size(col("codes")) =!= 32).count()
    assert(bad == 0, "PQ code out of [0,64) range or wrong arity")
    val res = ProductQuant.pqSearch(emb, nProbes = 5, k = 3)
    assert(res.count() == 15, "5 probes × top-3 expected")
  }

  test("text_normalize is idempotent") {
    val once = Normalize.textNormalize(docs)
      .select(col("doc_id"), col("norm_text").as("text"))
    val twice = Normalize.textNormalize(once)
    val changed = once.select(col("doc_id"), col("text").as("a"))
      .join(twice.select(col("doc_id"), col("norm_text").as("b")), "doc_id")
      .filter(col("a") =!= col("b")).count()
    assert(changed == 0, "normalization must be a fixpoint after one pass")
  }
}
