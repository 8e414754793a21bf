package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** APPEND-DELTA persistence for maintained index stores — the
  * merge-on-read segment layout (Iceberg/Delta MOR, LSM levels) that makes
  * the WRITE side of index maintenance O(Δ) instead of O(index).
  *
  * The r14 write-back cycles proved maintenance COMPUTE and EMISSION are
  * O(Δ), but every cycle still persisted its maintained artifact with a
  * full `overwrite.saveAsTable` — O(index) write I/O per cycle (measured
  * at the 100× tier: the graph cycle's cold write-back was 1,266 s vs a
  * 34 s warm pass; at 100 TB an index rewrite per maintenance batch is
  * disqualifying). This module replaces that shape:
  *
  *   - the BASE segment is written once at ingest (bucketed — the
  *     existing store layout, `Stores.ensureBucketed`);
  *   - each maintenance cycle appends ONE delta segment: an upsert table
  *     (full payload rows for every touched primary key) plus a tombstone
  *     table (pk columns of retired keys) — both O(Δ) rows, O(Δ) bytes;
  *   - readers consume the UNION VIEW [[merged]]: per-pk latest-wins,
  *     folded newest-last. Deltas are tiny by contract (the bounded-batch
  *     class every maintenance rung already assumes), so they ride
  *     broadcast anti-joins and the bucketed base scan NEVER re-shuffles;
  *   - [[compact]] is the OPTIMIZE job: fold base + segments into a fresh
  *     bucketed base and retire the segments — run on a cadence, not per
  *     cycle (the planning analog of operators/Compaction.compactionPlan,
  *     which bins small files; here the bins are whole segments).
  *
  * Upsert semantics are WHOLESALE per pk: a delta's upsert table must
  * carry the COMPLETE new row-set of every pk it touches (one row for
  * row-shaped stores — codes, labels, doclens; the full adjacency /
  * signature set for group-shaped stores keyed by node / doc_id). A pk
  * absent from every segment keeps its base rows verbatim; a pk in a
  * tombstone table with no newer upsert is gone. Tombstoning a pk that
  * was never present is a no-op (retire-created-then-retired pairs).
  *
  * Segment identity: (store name, sf dir, cycle number) — deterministic
  * pure functions of the corpus snapshot, like every other store, so a
  * rebuild can never change values and the catalog-or-build lifecycle is
  * shared with Stores.
  */
object DeltaStore {

  private def uTable(name: String, d: String, cycle: Int): String =
    s"graft_store_${name}_u${cycle}_${Stores.tag(d)}"
  private def tTable(name: String, d: String, cycle: Int): String =
    s"graft_store_${name}_t${cycle}_${Stores.tag(d)}"
  private def aTable(name: String, d: String, cycle: Int): String =
    s"graft_store_${name}_a${cycle}_${Stores.tag(d)}"

  /** True iff cycle `cycle`'s delta segment is already persisted. */
  def hasCycle(s: SparkSession, name: String, d: String, cycle: Int): Boolean =
    s.catalog.tableExists(uTable(name, d, cycle)) &&
      s.catalog.tableExists(tTable(name, d, cycle))

  /** Persist ONE maintenance cycle's delta segment — the O(Δ) write that
    * replaces the full-index overwrite. `upserts` carries the complete
    * new row-set per touched pk; `tombstones` the pk columns of retired
    * keys. Both land as plain (unbucketed) tables: a delta is broadcast-
    * sized by the bounded-batch contract, so bucketing buys nothing and
    * would cost a shuffle. Idempotent per (name, cycle): built once per
    * corpus snapshot like every ensure*. */
  def writeCycle(s: SparkSession, name: String, d: String, cycle: Int,
                 upserts: => DataFrame, tombstones: => DataFrame): Unit =
    synchronized {
      if (!hasCycle(s, name, d, cycle)) {
        val ut = uTable(name, d, cycle)
        Stores.dropStaleLocation(s, ut)
        upserts.write.mode("overwrite").saveAsTable(ut)
        val tt = tTable(name, d, cycle)
        Stores.dropStaleLocation(s, tt)
        tombstones.write.mode("overwrite").saveAsTable(tt)
      }
    }

  /** The MERGE-ON-READ union view over base + delta segments 1..`cycles`:
    * per-pk latest-wins, folded in CONSTANT plan depth (r15 verdict item
    * 7: the previous newest-last foldLeft put one anti-join + union on the
    * base PER SEGMENT — read amplification linear in un-compacted cycles,
    * visible as ann_ivf_cycle4 ≈ 2.7× ann_ivf_cycle2). The segments are
    * delta-bounded by contract, so the winner resolution (latest upsert
    * per pk unless a strictly-later tombstone retired it; a same-cycle
    * tombstone+upsert resolves to the upsert, matching the old fold order)
    * runs entirely over tiny segment tables, and the bucketed base pays
    * exactly ONE broadcast anti-join regardless of segment count — the
    * base scan still never exchanges, and consuming joins that broadcast
    * their probe side (the store read-path convention) are unaffected by
    * the union. */
  def merged(s: SparkSession, name: String, d: String, base: DataFrame,
             pk: Seq[String], cycles: Int): DataFrame =
    if (cycles <= 0) base
    else if (cycles == 1) {
      // one segment needs no winner resolution — keep the single-fold
      // shape (one anti-join + union) instead of paying the multi-segment
      // machinery's extra broadcast stages on every read
      val u = s.table(uTable(name, d, 1))
      val t = s.table(tTable(name, d, 1))
      val touched = u.select(pk.map(col): _*)
        .unionByName(t.select(pk.map(col): _*)).distinct()
      base.join(broadcast(touched), pk, "left_anti")
        .unionByName(u.select(base.columns.map(col).toSeq: _*))
    } else {
      val pkc = pk.map(col)
      val allU = (1 to cycles).map(i =>
        s.table(uTable(name, d, i)).withColumn("_cyc", lit(i))).reduce(_ unionByName _)
      val allT = (1 to cycles).map(i =>
        s.table(tTable(name, d, i)).select(pkc: _*).withColumn("_cyc", lit(i)))
        .reduce(_ unionByName _)
      val lastUp = allU.groupBy(pkc: _*).agg(max(col("_cyc")).as("_upc"))
      val lastTomb = allT.groupBy(pkc: _*).agg(max(col("_cyc")).as("_tc"))
      val live = lastUp.join(lastTomb, pk, "left_outer")
        .filter(col("_tc").isNull || col("_upc") >= col("_tc"))
        .select(pkc :+ col("_upc"): _*)
      val winners = allU.join(broadcast(live), pk)
        .filter(col("_cyc") === col("_upc"))
        .select(base.columns.map(col).toSeq: _*)
      val touched = allU.select(pkc: _*).unionByName(allT.select(pkc: _*)).distinct()
      base.join(broadcast(touched), pk, "left_anti").unionByName(winners)
    }

  /** COMPACTION — the OPTIMIZE job run on a cadence: fold the merged view
    * back into one fresh bucketed base segment (`name_c`) so read
    * amplification resets and the segment list empties. Returns the
    * compacted table. The write is O(index) BY DESIGN — that is what
    * compaction is — but it is scheduled (amortized over many cycles),
    * not paid per maintenance batch; the per-cycle write stays O(Δ). */
  def compact(s: SparkSession, name: String, d: String, base: DataFrame,
              pk: Seq[String], cycles: Int, bucketKeys: Seq[String],
              buckets: Int): DataFrame =
    Stores.ensureBucketed(s, s"${name}_c$cycles", d, bucketKeys, buckets) {
      merged(s, name, d, base, pk, cycles)
    }

  // ---- additive stores (counters: per-term df, corpus scalars) -----------

  /** Persist one cycle's ADDITIVE delta — signed value rows for counter
    * stores (a BM25 df row is +1 per arriving doc containing the term,
    * −1 per departing one). O(Δ) write like [[writeCycle]]. */
  def writeAdditive(s: SparkSession, name: String, d: String, cycle: Int,
                    delta: => DataFrame): Unit = synchronized {
    val at = aTable(name, d, cycle)
    if (!s.catalog.tableExists(at)) {
      Stores.dropStaleLocation(s, at)
      delta.write.mode("overwrite").saveAsTable(at)
    }
  }

  /** Merge-on-read for additive stores: union base + signed deltas, sum
    * per key, drop fully-retired keys (all counters zero). `keys` may be
    * empty (single-row scalar stores). */
  def mergedAdditive(s: SparkSession, name: String, d: String,
                     base: DataFrame, keys: Seq[String],
                     values: Seq[String], cycles: Int): DataFrame = {
    val all = (1 to cycles).foldLeft(base)((cur, i) =>
      cur.unionByName(s.table(aTable(name, d, i))))
    val sums = values.map(v => sum(col(v)).as(v))
    val agg =
      if (keys.isEmpty) all.agg(sums.head, sums.tail: _*)
      else all.groupBy(keys.map(col): _*).agg(sums.head, sums.tail: _*)
    if (keys.isEmpty) agg
    else agg.filter(values.map(v => col(v) =!= 0L).reduce(_ || _))
  }

  /** The (segment, kind, n_rows) MANIFEST of a delta store — the catalog
    * metadata a compaction scheduler consumes (the input shape of
    * operators/Compaction.compactionPlan: segments are the "files", row
    * counts the "sizes"; a scheduler bins small segments into rewrite
    * jobs exactly like OPTIMIZE bins small files). Counts come from the
    * PERSISTED segment tables, so a registered manifest's hash gate
    * proves the landed segments carry exactly the batch algebra the
    * cycle writers claim — a missing tombstone or a double-written
    * upsert breaks the hash. Bounded: one count job per segment,
    * metadata-sized output. */
  def manifest(s: SparkSession, name: String, d: String, base: DataFrame,
               cycles: Int): DataFrame = {
    import s.implicits._
    val rows = (("base", "base", base.count())) +:
      (1 to cycles).flatMap(i => Seq(
        (s"u$i", "upsert", s.table(uTable(name, d, i)).count()),
        (s"t$i", "tombstone", s.table(tTable(name, d, i)).count())))
    s.createDataset(rows.toSeq).toDF("segment", "kind", "n_rows")
  }

  // ---- spec / probe support ------------------------------------------------

  /** (upsert rows, tombstone rows) of one persisted cycle — the numbers
    * StoresSpec pins against the batch sizes to prove the write is O(Δ). */
  def cycleRows(s: SparkSession, name: String, d: String,
                cycle: Int): (Long, Long) =
    (s.table(uTable(name, d, cycle)).count(),
      s.table(tTable(name, d, cycle)).count())

  /** Total bytes under one cycle's segment tables (warehouse files) — the
    * write-I/O number the 10×-tier A/B compares against a full-index
    * overwrite. */
  def cycleBytes(s: SparkSession, name: String, d: String, cycle: Int): Long =
    Seq(uTable(name, d, cycle), tTable(name, d, cycle)).map { t =>
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, t.toLowerCase)
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }.sum
}
