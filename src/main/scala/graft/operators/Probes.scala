package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probe-set resolution for the ANN / retrieval family.
  *
  * Every search operator takes an optional probe DataFrame — any frame
  * with (`vec_id`, `embedding`) columns, e.g. the `split_holdout` test
  * split joined back to the embedding table, or a batch of freshly-encoded
  * query vectors (⇐ neo4j_knowledge_service.py:922 — retrieval takes an
  * arbitrary query vector, not a corpus prefix). When absent, operators
  * fall back to the deterministic first-`nProbes` slice of the corpus —
  * the oracle-friendly default every registered query uses, kept so the
  * DuckDB replays stay stated in pure SQL.
  *
  * Scale contract: the probe set is assumed SMALL relative to the corpus
  * (it rides `broadcast()` joins and, in the PQ/SQ paths, a bounded
  * driver-side collect into the per-probe lookup tables). A corpus-sized
  * probe side belongs to the symmetric all-pairs operators
  * (sparse_cosine, dedup_embedding), not this family.
  */
object Probes {

  /** The explicit probe frame, or the deterministic first-`nProbes`
    * corpus slice. Output is normalized to exactly (vec_id, embedding). */
  def resolve(embeddings: DataFrame, probes: Option[DataFrame],
              nProbes: Int): DataFrame =
    probes.getOrElse(embeddings.filter(col("vec_id") < nProbes))
      .select(col("vec_id"), col("embedding"))
}
