package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** END-TO-END incremental dedup-cluster maintenance — THE production dedup
  * loop at 100 TB (r11/r12 verdict item 2): a standing (pair, cluster)
  * table maintained through one arrival batch and one departure batch
  * WITHOUT ever re-resolving the corpus. Composes the four proven
  * maintenance primitives:
  *
  *   pairs:    base ⊎ upsert-delta (minhashLshUpsertFrom, O(Δ) sketched)
  *                  − delete-retired (keyed anti-join, O(Δ·bucket))
  *   clusters: componentsUpsertFrom (label-graph CC over the delta edges,
  *                  O(Δ)) then componentsDeleteFrom (scoped recompute over
  *                  the touched components only, O(touched))
  *
  * Scenario (deterministic id-slices, matching the family convention):
  * the standing corpus is doc_id%10 != 0; the arrival batch is
  * doc_id%10 == 0 (minhash_lsh_upsert's delta); the departure batch is
  * doc_id%10 == 5 (disjoint from the arrivals — a base slice departing
  * AFTER the arrival batch landed). Output is dedup_resolve's verdict
  * shape (doc_id, canonical_id, keep) over the post-change corpus's LSH
  * pair graph.
  *
  * The oracle is dedup_resolve's fixed-point recompute VERBATIM in shape —
  * min-label propagation run past its fixed point — over the from-scratch
  * LSH pair graph of the POST-CHANGE corpus (doc_id%10 != 5): the hash
  * gate proves the composed incremental maintenance reaches exactly the
  * state a full re-resolve would build. Correctness is structural: pair
  * membership is a pure per-doc-pair function, so
  * (base ∪ Δ-pairs) − (pairs touching departures) IS the post-change pair
  * set, and the components upsert/delete cores are each proven lossless by
  * their own gates (graph_components_inc / graph_components_del).
  *
  * Reference analog: the reference re-runs its dedup/cluster resolution
  * whenever the Neo4j corpus changes (services/pipeline ingestion +
  * neo4j_knowledge_service.py upsert_entity / graph_service.py:241
  * delete_node maintain index state through changes); at lakehouse scale
  * the maintained pair/cluster table is what makes that loop affordable.
  */
object ResolveInc {

  private val isArrival = pmod(col("doc_id"), lit(10L)) === 0L
  private val isDeparture = pmod(col("doc_id"), lit(10L)) === 5L

  /** Inline registration form: derives the standing state (signatures,
    * band keys, pairs, labels of the base corpus) in-call — the
    * CORRECTNESS gate then covers the whole derivation — and runs the
    * maintained path through both batches. Production consumes the same
    * core from persisted tables (resolveIncFrom; ResolveIncProbe measures
    * that form at 10×/100×). */
  def resolveInc(documents: DataFrame, nPerms: Int = 16, bands: Int = 4): DataFrame = {
    val (sigBase, keysBase, pairsBase, labelsBase) =
      standingState(documents, nPerms, bands)
    resolveIncFrom(sigBase, keysBase, pairsBase, labelsBase,
      documents.filter(isArrival),
      documents.filter(isDeparture).select(col("doc_id")), nPerms, bands)
  }

  /** The standing dedup state derived in-call: (signatures, band keys,
    * pairs, labels) of the BASE corpus (pre-arrival slice). Materialized
    * per the Iterative contract: each artifact is consumed by several
    * downstream branches (pairs by the retire/survive splits, signatures
    * by two scoring joins) — unmaterialized, the whole sketch pass
    * re-derives per consumer. */
  private def standingState(documents: DataFrame, nPerms: Int, bands: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import Iterative._
    val base = documents.filter(!isArrival)
    val sigBase = MinhashPortable.minhashPortable(base, nPerms).materialize
    val keysBase = MinhashPortable.bandKeys(sigBase, nPerms / bands).materialize
    val pairsBase = MinhashPortable.pairsFromIndex(sigBase, keysBase, nPerms).materialize
    val labelsBase = GraphOps.labelPropagation(
      pairsBase.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    (sigBase, keysBase, pairsBase, labelsBase)
  }

  /** DELTA output form of [[resolveInc]] — the production emission shape
    * (the cdc_apply / minhash_lsh_upsert precedent): instead of restating
    * the FULL maintained labeling (O(corpus) rows per maintenance cycle —
    * the emission cost the r12 verdict flagged on minhash_lsh_delete), emit
    * only the verdict rows the two batches CHANGED, as CDC ops:
    * 'I' = doc newly labeled (arrival, or a base singleton an arrival
    * paired), 'U' = standing doc whose canonical changed (cluster merge or
    * post-departure split re-canonicalization), 'D' = doc no longer in the
    * labeling (departed, or lost its last pair). For 'D' rows canonical_id/
    * keep restate the RETRACTED base verdict. O(touched) rows at any corpus
    * size; base ⊎ delta ≡ maintained full labeling (ResolveIncSpec pins the
    * CDC identity). */
  def resolveIncDelta(documents: DataFrame, nPerms: Int = 16, bands: Int = 4): DataFrame = {
    val (sigBase, keysBase, pairsBase, labelsBase) =
      standingState(documents, nPerms, bands)
    val maintained = resolveIncFrom(sigBase, keysBase, pairsBase, labelsBase,
      documents.filter(isArrival),
      documents.filter(isDeparture).select(col("doc_id")), nPerms, bands)
    resolveDeltaFrom(labelsBase, maintained)
  }

  /** Production-shaped delta core: diff the maintained labeling against the
    * standing one — a full-outer join of two node-sized labelings (both
    * bucketed by node in a persisted deployment → exchange-free), emitting
    * O(changed) rows. keep is a pure function of (doc_id, canonical_id), so
    * canonical inequality is the complete change predicate. */
  def resolveDeltaFrom(labelsBase: DataFrame, maintained: DataFrame): DataFrame = {
    val bv = labelsBase.select(col("node").as("doc_id"), col("label").as("b_can"))
    val pv = maintained.select(col("doc_id"), col("canonical_id").as("p_can"),
      col("keep").as("p_keep"))
    pv.join(bv, Seq("doc_id"), "full_outer")
      .filter(col("p_can").isNull || col("b_can").isNull ||
        col("p_can") =!= col("b_can"))
      .select(col("doc_id"),
        when(col("b_can").isNull, lit("I"))
          .when(col("p_can").isNull, lit("D")).otherwise(lit("U")).as("op"),
        coalesce(col("p_can"), col("b_can")).as("canonical_id"),
        coalesce(col("p_keep"), col("doc_id") === col("b_can")).as("keep"))
  }

  /** Production-shaped core: given the PERSISTED standing state — the
    * base index (signatures + band keys), the standing pair table, and the
    * standing cluster labeling — apply one arrival batch then one
    * departure batch and emit the maintained keep/drop verdicts. Never
    * touches base text; never recomputes a component outside the touched
    * set. */
  def resolveIncFrom(sigBase: DataFrame, keysBase: DataFrame,
                     pairsBase: DataFrame, labelsBase: DataFrame,
                     arrivals: DataFrame, departedIds: DataFrame,
                     nPerms: Int = 16, bands: Int = 4): DataFrame = {
    val (_, _, _, labelsFinal) = maintainState(sigBase, keysBase, pairsBase,
      labelsBase, arrivals, departedIds, nPerms, bands)
    labelsFinal.select(col("node").as("doc_id"), col("label").as("canonical_id"),
      (col("node") === col("label")).as("keep"))
  }

  /** The WHOLE maintained state after one arrival + one departure batch —
    * (signatures, band keys, pairs, labels), each the post-change value of
    * the corresponding standing table. [[resolveIncFrom]] consumes only the
    * labeling; the WRITE-BACK cycle (Stores.resolveCycle2Store, r13 verdict
    * item 3) persists all four back to the catalog so the NEXT batch is
    * served from the updated store — the day-2 loop. The unconsumed
    * artifacts are lazy lineage: a caller that only reads the labels never
    * pays for the signature/key maintenance joins. */
  def maintainState(sigBase: DataFrame, keysBase: DataFrame,
                    pairsBase: DataFrame, labelsBase: DataFrame,
                    arrivals: DataFrame, departedIds: DataFrame,
                    nPerms: Int = 16, bands: Int = 4)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import Iterative._
    // --- arrival batch: delta-bounded pair insert + label-graph merge ---
    // delta sketch materialized: consumed by the pair join AND the
    // maintained-signature append
    val sigDelta = MinhashPortable.minhashPortable(arrivals, nPerms).materialize
    val keysDelta = MinhashPortable.bandKeys(sigDelta, nPerms / bands)
    val deltaPairs = MinhashPortable.upsertPairsFrom(sigBase, keysBase,
      sigDelta, keysDelta, nPerms)
    // materialized: three consumers (retire semi-joins ×2, survive antis)
    val pairsUp = pairsBase.unionByName(deltaPairs).materialize
    val labelsUp = GraphOps.componentsUpsertFrom(labelsBase,
      deltaPairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    // --- departure batch: keyed pair retire + touched-scoped relabel ---
    // retired = every standing pair touching a departure (O(Δ·bucket);
    // the per-side semi-joins may emit a both-departed pair twice — fine,
    // componentsDeleteFrom distincts endpoints)
    val delA = departedIds.select(col("doc_id").as("doc_a"))
    val delB = departedIds.select(col("doc_id").as("doc_b"))
    val retired = pairsUp.join(broadcast(delA), Seq("doc_a"), "left_semi")
      .unionByName(pairsUp.join(broadcast(delB), Seq("doc_b"), "left_semi")
        .select(col("doc_a"), col("doc_b"), col("est_jaccard")))
    // surviving = maintained pair table after the delete (two broadcast
    // anti-joins — the keyed-delete shape of a doc-keyed pair store)
    val surviving = pairsUp.join(broadcast(delA), Seq("doc_a"), "left_anti")
      .join(broadcast(delB), Seq("doc_b"), "left_anti")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    val labelsFinal = GraphOps.componentsDeleteFrom(labelsUp,
      surviving.select(col("doc_a").as("src"), col("doc_b").as("dst")),
      retired.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    // maintained index artifacts: append the delta sketch, drop departures
    // (signatures are pure per-doc functions — a keyed append + keyed
    // delete IS the maintenance, nothing re-sketched)
    val delIds = departedIds.select(col("doc_id"))
    val sigM = sigBase.unionByName(sigDelta)
      .join(broadcast(delIds), Seq("doc_id"), "left_anti")
    val keysM = keysBase.unionByName(keysDelta)
      .join(broadcast(delIds), Seq("doc_id"), "left_anti")
    (sigM, keysM, surviving, labelsFinal)
  }

  /** The O(Δ)-WRITE delta decomposition of [[maintainState]] — per
    * standing artifact, the rows a write-back cycle actually persists
    * (the r14 shape wrote all four maintained artifacts back in full):
    *
    *   - sigU / keysU: the arrival batch's surviving sketch rows — pure
    *     per-doc functions, O(Δ) by construction (tombstones = the
    *     departure ids, supplied by the caller);
    *   - pairsU: the surviving CREATED pairs (delta-created, not retired
    *     same cycle); pairsT: the retired pair keys — both delta-bounded
    *     (created pairs touch an arrival, retired pairs touch a
    *     departure);
    *   - labelsU: the labeling rows that differ from the base — new nodes
    *     + relabeled touched nodes; labelsT: base nodes ABSENT from the
    *     maintained labeling (the departures plus any survivor the delete
    *     left pair-less — componentsDeleteFrom drops nodes whose touched
    *     component lost every edge). Both computed as one co-bucketed
    *     anti-join against the standing labeling (an exchange-free
    *     compare; rows OUT are O(touched), which is what the write pays).
    *
    * Identity (DeltaStoreSpec / the cycle2 oracle): for each artifact,
    * base ∖ (delta keys) ∪ upserts ≡ the corresponding maintainState
    * output. */
  def maintainDeltas(sigBase: DataFrame, keysBase: DataFrame,
                     pairsBase: DataFrame, labelsBase: DataFrame,
                     arrivals: DataFrame, departedIds: DataFrame,
                     nPerms: Int = 16, bands: Int = 4)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    import Iterative._
    val sigDelta = MinhashPortable.minhashPortable(arrivals, nPerms).materialize
    val keysDelta = MinhashPortable.bandKeys(sigDelta, nPerms / bands)
    val deltaPairs = MinhashPortable.upsertPairsFrom(sigBase, keysBase,
      sigDelta, keysDelta, nPerms).materialize
    val pairsUp = pairsBase.unionByName(deltaPairs).materialize
    val labelsUp = GraphOps.componentsUpsertFrom(labelsBase,
      deltaPairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val delA = departedIds.select(col("doc_id").as("doc_a"))
    val delB = departedIds.select(col("doc_id").as("doc_b"))
    val retired = pairsUp.join(broadcast(delA), Seq("doc_a"), "left_semi")
      .unionByName(pairsUp.join(broadcast(delB), Seq("doc_b"), "left_semi")
        .select(col("doc_a"), col("doc_b"), col("est_jaccard")))
    val surviving = pairsUp.join(broadcast(delA), Seq("doc_a"), "left_anti")
      .join(broadcast(delB), Seq("doc_b"), "left_anti")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    val labelsFinal = GraphOps.componentsDeleteFrom(labelsUp,
      surviving.select(col("doc_a").as("src"), col("doc_b").as("dst")),
      retired.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val delIds = departedIds.select(col("doc_id"))
    val sigU = sigDelta.join(broadcast(delIds), Seq("doc_id"), "left_anti")
    val keysU = keysDelta.join(broadcast(delIds), Seq("doc_id"), "left_anti")
    val pairsU = deltaPairs.join(broadcast(delA), Seq("doc_a"), "left_anti")
      .join(broadcast(delB), Seq("doc_b"), "left_anti")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    val pairsT = retired.select(col("doc_a"), col("doc_b")).distinct()
    // labelPropagation checkpoints inside componentsDeleteFrom, so the two
    // diffs below scan a clean materialized frame, not a doubled lineage
    val labelsU = labelsFinal.join(labelsBase, Seq("node", "label"), "left_anti")
    val labelsT = labelsBase.select(col("node"))
      .join(labelsFinal.select(col("node")), Seq("node"), "left_anti")
    (sigU, keysU, pairsU, pairsT, labelsU, labelsT)
  }

  /** CTE chain (no WITH keyword) computing the fixed-point labeling of the
    * LSH pair graph over one corpus slice, namespaced by `pfx`: emits
    * `p_$pfx` (pairs), `e_$pfx` (symmetric edges), `l_${pfx}_0..rounds`.
    * The final labeling relation is `l_${pfx}_$rounds`. */
  private def labelChainSql(docsRel: String, pfx: String, nPerms: Int,
                            bands: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""l_${pfx}_$i AS MATERIALIZED (
         |  SELECT l.node, LEAST(l.label, COALESCE(MIN(nl.label), l.label)) AS label
         |  FROM l_${pfx}_${i - 1} l
         |  LEFT JOIN e_$pfx ON l.node = e_$pfx.src
         |  LEFT JOIN l_${pfx}_${i - 1} nl ON e_$pfx.dst = nl.node
         |  GROUP BY l.node, l.label)""".stripMargin
    }.mkString(",\n")
    val pairs = MinhashPortable.minhashLshPortableSqlFrom(docsRel, nPerms, bands)
    s"""p_$pfx AS MATERIALIZED ($pairs),
       |e_$pfx AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM p_$pfx
       |  UNION ALL SELECT doc_b, doc_a FROM p_$pfx),
       |l_${pfx}_0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e_$pfx),
       |$steps""".stripMargin
  }

  /** Oracle: dedup_resolve's fixed-point recompute verbatim in shape —
    * plain min-label propagation run past its fixed point — over the
    * from-scratch LSH pair graph of the POST-CHANGE corpus. */
  def resolveIncSql(nPerms: Int = 16, bands: Int = 4, rounds: Int = 16): String =
    s"""WITH ${labelChainSql("(SELECT * FROM documents WHERE doc_id % 10 <> 5)", "pc", nPerms, bands, rounds)}
       |SELECT node AS doc_id, label AS canonical_id, node = label AS keep
       |FROM l_pc_$rounds""".stripMargin

  /** Oracle for the two-cycle WRITE-BACK rung (Stores.resolveCycle2Store):
    * the fixed-point re-resolve of the corpus after BOTH maintenance
    * cycles — base (%10 != 0) ⊎ arrivals₁ (%20 == 0) ∖ departures₁
    * (%20 == 5) ⊎ arrivals₂ (%20 == 10) ∖ departures₂ (%20 == 15) =
    * every doc with doc_id %20 ∉ {5, 15}. The hash gate proves that
    * cycle 1's artifacts written back to the catalog and REREAD by cycle 2
    * compose to exactly the state two independent full re-resolves imply. */
  def resolveCycle2Sql(nPerms: Int = 16, bands: Int = 4, rounds: Int = 16): String =
    s"""WITH ${labelChainSql("(SELECT * FROM documents WHERE doc_id % 20 NOT IN (5, 15))", "pc", nPerms, bands, rounds)}
       |SELECT node AS doc_id, label AS canonical_id, node = label AS keep
       |FROM l_pc_$rounds""".stripMargin

  /** Oracle for the delta form: BOTH fixed-point recomputes from scratch —
    * the standing labeling over the base corpus (pre-arrival, %10 != 0) and
    * the post-change labeling (%10 != 5) — full-outer diffed on doc_id. The
    * hash gate proves the composed O(Δ) maintenance path emits exactly the
    * verdict changes two independent full re-resolves imply. */
  def resolveIncDeltaSql(nPerms: Int = 16, bands: Int = 4, rounds: Int = 16): String =
    s"""WITH ${labelChainSql("(SELECT * FROM documents WHERE doc_id % 10 <> 0)", "bc", nPerms, bands, rounds)},
       |${labelChainSql("(SELECT * FROM documents WHERE doc_id % 10 <> 5)", "pc", nPerms, bands, rounds)},
       |bv AS (SELECT node AS doc_id, label AS b_can FROM l_bc_$rounds),
       |pv AS (SELECT node AS doc_id, label AS p_can, node = label AS p_keep FROM l_pc_$rounds)
       |SELECT COALESCE(pv.doc_id, bv.doc_id) AS doc_id,
       |  CASE WHEN bv.doc_id IS NULL THEN 'I'
       |       WHEN pv.doc_id IS NULL THEN 'D' ELSE 'U' END AS op,
       |  COALESCE(pv.p_can, bv.b_can) AS canonical_id,
       |  COALESCE(pv.p_keep, COALESCE(pv.doc_id, bv.doc_id) = bv.b_can) AS keep
       |FROM pv FULL JOIN bv ON pv.doc_id = bv.doc_id
       |WHERE pv.doc_id IS NULL OR bv.doc_id IS NULL OR pv.p_can <> bv.b_can""".stripMargin
}
