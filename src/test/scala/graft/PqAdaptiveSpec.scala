package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.ProductQuant
import graft.sources.Tables

/** The adaptive-pool containment theorem, asserted directly on the pool:
  * every exact-COSINE top-k neighbor of every probe must be inside the
  * branch-and-bound pool. Per-candidate ε = Σ_s ‖p_s‖·‖res_s(v)‖ bounds
  * the ADC error on the dot, and dividing the brackets by the EXACT norms
  * ‖p‖‖v‖ (both known — the candidate's raw vector is in hand at encode
  * time) transfers the bracket to the cosine scale, the metric the rerank
  * ranks by (r10; the r09 dot-scale pool guaranteed only dot-top-k — the
  * measured "metric transfer" recall gap on natural density). A candidate
  * whose cosine upper bound misses the k-th cosine lower bound provably
  * cannot be exact-cosine top-k — under any input partitioning, the
  * guarantee a fixed rerank depth cannot give at any setting — while the
  * prune still bites (pool ≪ corpus). */
class PqAdaptiveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** exact-COSINE top-k pairs per probe over an optional candidate filter */
  private def cosineTopK(emb: org.apache.spark.sql.DataFrame,
                         probes: org.apache.spark.sql.DataFrame,
                         k: Int): Set[(Long, Long)] =
    emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(probes))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("d", VectorOps.cosine(col("embedding"), col("pv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy(desc("d"), col("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("branch-and-bound ADC pool contains every exact-cosine top-k neighbor, any partitioning") {
    val emb0 = Tables.embeddings(spark, dir)
    val k = 3
    val probes = emb0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val expected = cosineTopK(emb0, probes, k)
    for (parts <- Seq(2, 7)) {
      val pool = ProductQuant.pqAdaptivePool(emb0.repartition(parts),
          m = 32, nCodes = 64, nProbes = 10, k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val missing = expected -- pool
      assert(missing.isEmpty,
        s"parts=$parts: exact-cosine top-$k outside the 2eps pool: $missing")
      // and the pool is a POOL, not the corpus: the margin must bite
      val corpusPairs = 10L * (emb0.count() - 1)
      assert(pool.size < corpusPairs,
        s"margin never excluded anything (pool=${pool.size} of $corpusPairs)")
    }
  }

  test("IVF-routed branch-and-bound pool contains the same-cell exact-cosine top-k") {
    // the IVF composition's guarantee is conditional on routing: the pool
    // must contain every exact-cosine top-k neighbor AMONG candidates
    // routed to the probe's cell (cross-cell misses are the IVF ceiling,
    // owned by the routing — not the adaptive bound's claim)
    val emb0 = Tables.embeddings(spark, dir)
    val k = 3
    val w = org.apache.spark.sql.expressions.Window
    val cents = emb0.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cv"))
    val assigned = emb0
      .crossJoin(broadcast(cents))
      .withColumn("cc", VectorOps.cosine(col("embedding"), col("cv")))
      .withColumn("arn", row_number().over(
        w.partitionBy("vec_id").orderBy(desc("cc"), col("cell_id"))))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("cell_id").as("cell"))
    val probes = emb0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      .join(assigned.select(col("vec_id").as("probe_id"), col("cell").as("pcell")),
        "probe_id")
    val exactTopK = emb0.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(assigned.select(col("vec_id").as("neighbor_id"), col("cell")), "neighbor_id")
      .join(broadcast(probes),
        col("cell") === col("pcell") && col("neighbor_id") =!= col("probe_id"))
      .withColumn("d", VectorOps.cosine(col("embedding"), col("pv")))
      .withColumn("rn", row_number().over(
        w.partitionBy("probe_id").orderBy(desc("d"), col("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"))
    val expected = exactTopK.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pool = ProductQuant.ivfPqAdaptivePool(emb0,
        nCells = 16, m = 32, nCodes = 128, nProbes = 10, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = expected -- pool
    assert(missing.isEmpty,
      s"same-cell exact-cosine top-$k outside the IVF adaptive pool: $missing")
    val corpusPairs = 10L * (emb0.count() - 1)
    assert(pool.size < corpusPairs,
      s"margin never excluded anything (pool=${pool.size} of $corpusPairs)")

    // multiprobe (nprobe=4): same containment claim over the WIDER probed
    // set — every exact-cosine top-k among candidates routed to any of the
    // probe's top-4 cells must be in the pool, and the wider pool must
    // contain the single-cell pool (routing only ever ADDS candidates)
    val probeCells4 = emb0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      .crossJoin(broadcast(cents))
      .withColumn("cc", VectorOps.cosine(col("pv"), col("cv")))
      .withColumn("crn", row_number().over(
        w.partitionBy("probe_id").orderBy(desc("cc"), col("cell_id"))))
      .filter(col("crn") <= 4)
      .select(col("probe_id"), col("cell_id").as("pcell"))
    val probes4 = emb0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      .join(probeCells4, "probe_id")
    val expected4 = emb0.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(assigned.select(col("vec_id").as("neighbor_id"), col("cell")), "neighbor_id")
      .join(broadcast(probes4),
        col("cell") === col("pcell") && col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), col("embedding"), col("pv"))
      .distinct()
      .withColumn("d", VectorOps.cosine(col("embedding"), col("pv")))
      .withColumn("rn", row_number().over(
        w.partitionBy("probe_id").orderBy(desc("d"), col("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pool4 = ProductQuant.ivfPqAdaptivePool(emb0,
        nCells = 16, m = 32, nCodes = 128, nProbes = 10, k = k, nProbeCells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing4 = expected4 -- pool4
    assert(missing4.isEmpty,
      s"probed-cells exact-cosine top-$k outside the multiprobe pool: $missing4")
    // NOTE deliberately NOT asserted: pool4 ⊇ pool. Multiprobe only adds
    // candidates, but extra candidates can RAISE the k-th lower bound and
    // legitimately prune borderline members the single-cell pool kept —
    // the containment guarantee is relative to each pool's own probed set.
  }

  test("SQ8 adaptive pool contains every exact-cosine top-k neighbor") {
    // SQ8's bound is flat (no routing): per-dim reconstruction error is
    // exact at encode time, the Hölder ∞/1 bound brackets the true dot,
    // and the exact-norm division carries the bracket to the cosine —
    // containment is unconditional, like the flat-PQ pool
    val emb0 = Tables.embeddings(spark, dir)
    val k = 3
    val probes = emb0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val expected = cosineTopK(emb0, probes, k)
    val pool = graft.operators.ScalarQuant.sq8AdaptivePool(emb0, nProbes = 10, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = expected -- pool
    assert(missing.isEmpty, s"exact-cosine top-$k outside the SQ8 pool: $missing")
    val corpusPairs = 10L * (emb0.count() - 1)
    assert(pool.size < corpusPairs,
      s"margin never excluded anything (pool=${pool.size} of $corpusPairs)")
  }

  test("composed PQ ∩ SQ8 pool still contains every exact-cosine top-k neighbor") {
    // each pool excludes a candidate only by exhibiting k provably-better
    // ones, so the INTERSECTION preserves containment while being at most
    // as large as the tighter side — the r11 raw-vector-fetch cut
    val emb0 = Tables.embeddings(spark, dir)
    val k = 3
    val probes = emb0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val expected = cosineTopK(emb0, probes, k)
    val pq = ProductQuant.pqAdaptivePool(emb0, m = 32, nCodes = 64, nProbes = 10, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = graft.operators.ScalarQuant.sq8AdaptivePool(emb0, nProbes = 10, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val composed = pq.intersect(sq)
    val missing = expected -- composed
    assert(missing.isEmpty, s"exact-cosine top-$k outside the composed pool: $missing")
    assert(composed.size <= math.min(pq.size, sq.size))
    // and the registered operator's output ranks by exact cosine over it
    val out = graft.operators.ScalarQuant.pqSq8RerankAdaptive(emb0)
    val perProbe = out.groupBy("probe_id").count().collect()
    assert(perProbe.length == 10 && perProbe.forall(_.getLong(1) == 3L))
  }

  test("adaptive rerank output is k rows per probe with exact cosine scores") {
    val emb = Tables.embeddings(spark, dir)
    val out = ProductQuant.pqRerankAdaptive(emb)
    val perProbe = out.groupBy("probe_id").count().collect()
    assert(perProbe.length == 10 && perProbe.forall(_.getLong(1) == 3L))
    // scores are EXACT cosines (spot-check one row against the kernel)
    val row = out.orderBy("probe_id", "rn").limit(1).collect().head
    val pid = row.getLong(0); val nid = row.getLong(1); val sc = row.getDouble(3)
    val exact = emb.filter(col("vec_id") === pid).select(col("embedding").as("a"))
      .crossJoin(emb.filter(col("vec_id") === nid).select(col("embedding").as("b")))
      .select(VectorOps.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(sc == exact, s"rerank score $sc != exact cosine $exact")
  }
}
