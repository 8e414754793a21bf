package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared helpers for iterative DataFrame algorithms (GraphOps' graph
  * loops, Pca's power iteration): per-round materialization that truncates
  * the otherwise-exponential lineage, and storage release for superseded
  * rounds. */
private[operators] object Iterative {

  /** Materialize an iteration step. `localCheckpoint()` stores blocks in
    * executor memory — the right call single-node, but NOT fault-tolerant:
    * on a 1000-executor run a lost executor kills the query. Set
    * `spark.graft.reliableCheckpoint=true` (and a
    * `sparkContext.setCheckpointDir`) to switch every per-round
    * materialization to reliable `checkpoint()` on cluster storage. */
  implicit class Materialize(private val df: DataFrame) extends AnyVal {
    /** Both checkpoint flavors INHERIT the child plan's estimated
      * Statistics (Spark 4 `LogicalRDD.fromDataset`); join estimates are
      * products, so iterative self-joins over the previous round's
      * checkpoint square the inherited BigInt every round — exponential-
      * bit-length driver arithmetic by round ~10 (measured: a minutes-long
      * single-threaded stall inside stats estimation). Capping at the
      * materialize boundary keeps every round's estimate word-sized; see
      * Bridge.capCheckpointStats for why the cap is semantics-free. */
    def materialize: DataFrame =
      org.apache.spark.sql.graftbridge.Bridge.capCheckpointStats(
        if (df.sparkSession.conf.get("spark.graft.reliableCheckpoint", "false").toBoolean)
          df.checkpoint()
        else df.localCheckpoint())
  }

  /** Force a persisted frame's cache to build NOW (one count job). An
    * InMemoryRelation whose cached plan has not executed yet reports
    * UnknownPartitioning (measured — CachePartProbe), so an iterative loop
    * whose ROUND-1 plan is created before any job touched the cache pays
    * one redundant full-size ENSURE_REQUIREMENTS exchange on the
    * pre-partitioned edge side — the exact shuffle the persisted
    * co-partition exists to remove; rounds ≥ 2 plan against the built
    * cache and were already exchange-free. Building eagerly trades that
    * round-1 edge shuffle (write + fetch of the whole edge set) for one
    * cache-scan count job. r16; guide §2.4. */
  def build(df: DataFrame): DataFrame = { df.count(); df }

  /** Release the storage behind a SUPERSEDED materialized frame. A
    * localCheckpoint's cached blocks ARE its data (the lineage is
    * truncated — there is nothing to recompute from), so this must only be
    * called on frames that are provably never read again: the previous
    * round of an iterative loop, once the round that replaces it is itself
    * materialized. Without it every round's frame stays pinned in the
    * block manager for the session lifetime — on a real cluster that is
    * executor-memory pressure growing with iteration count, and in the
    * interleaved bench it was the r09 3–6× level shift on this family.
    * Structurally a no-op on anything that is not a bare checkpoint scan
    * (the match only fires on a top-level LogicalRDD), and on reliable
    * checkpoints (their data lives on cluster storage, not the block
    * manager — the unpersist call is then harmless). */
  def release(df: DataFrame): Unit =
    if (df != null)
      try df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      } catch { case scala.util.control.NonFatal(_) => () }
}
