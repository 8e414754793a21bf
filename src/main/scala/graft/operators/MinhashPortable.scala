package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minhash signatures with an ENGINE-PORTABLE hash family — the
  * oracle-checkable twin of Dedup's xxhash64 minhash (which is rows-only
  * because xxhash64 has no DuckDB equivalent). Same algorithm, different
  * kernel: shingle → base-31 rolling hash mod p (fingerprint precedent),
  * then k universal-hash permutations h_i(x) = (a_i·x + b_i) mod p with
  * Knuth-scrambled literal coefficients; the signature entry is the
  * per-permutation minimum. Every step is BIGINT-safe integer arithmetic
  * (a_i, x < p ≈ 2³⁰ ⇒ a_i·x < 2⁶⁰), so DuckDB replays it exactly and the
  * whole signature hash-matches — upgrading the minhash family's evidence
  * from rows-only to oracle-green.
  *
  * Emitted exploded as (doc_id, perm, minh) — k rows per doc, the layout
  * the LSH banding join consumes directly. One narrow mapPartitions kernel
  * (per-char folds via Catalyst HOFs are CodegenFallback), zero shuffle:
  * linear at 100 TB. Docs with < 3 tokens have no shingle and are dropped
  * on both engines. */
object MinhashPortable {

  val Mod = 1000000007L

  /** The per-doc signature kernel — ONE definition shared by the batch
    * exploded layout below and the streaming near-dedup
    * (Streams.streamingNearDedup), so the two paths cannot drift. Returns
    * null when the doc has no 3-token shingle (dropped on both engines). */
  private[graft] def signature(text: String, nPerms: Int = 16): Array[Long] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < 3) return null
    val xs = new Array[Long](toks.length - 2)
    var i = 0
    while (i < toks.length - 2) {
      val s = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      var h = 0L
      var j = 0
      while (j < s.length) {
        h = (h * 31L + s.charAt(j)) % Mod
        j += 1
      }
      xs(i) = h
      i += 1
    }
    val sig = new Array[Long](nPerms)
    var perm = 0
    while (perm < nPerms) {
      val a = ((perm + 1).toLong * 2654435761L) % Mod
      val b = ((perm + 1).toLong * 40503L) % Mod
      var mn = Long.MaxValue
      var t = 0
      while (t < xs.length) {
        val v = (a * xs(t) + b) % Mod
        if (v < mn) mn = v
        t += 1
      }
      sig(perm) = mn
      perm += 1
    }
    sig
  }

  def minhashPortable(documents: DataFrame, nPerms: Int = 16): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val sig = signature(text, nPerms)
        if (sig == null) Iterator.empty
        else (0 until nPerms).iterator.map(p => (docId, p.toLong, sig(p)))
      }
      .toDF("doc_id", "perm", "minh")
  }

  /** End-to-end LSH near-dup candidates over the PORTABLE signatures —
    * the hash-oracle-checked twin of Dedup.minhashLsh: band the k minima
    * (bands×rowsPerBand), key each band by the ordered concatenation of
    * its values (STRING_AGG ORDER BY perm ↔ sort_array+array_join — no
    * engine-specific band hash needed), equi-join on (band, key) for
    * candidates, and score each candidate by the signature-estimated
    * Jaccard (matching perms / k — the estimator LSH theory is built on).
    * Same scale shape as the xxhash variant: candidates only materialize
    * through shared band buckets, est-sim join is O(pairs·k). */
  def minhashLshPortable(documents: DataFrame, nPerms: Int = 16,
                         bands: Int = 4): DataFrame = {
    require(bands > 0 && nPerms % bands == 0, s"bands=$bands must divide nPerms=$nPerms")
    val rows = nPerms / bands
    val sig = minhashPortable(documents, nPerms)
    val keys = bandKeys(sig, rows)
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    estJaccard(cand, sig, nPerms)
  }

  /** Per-(doc, band) LSH bucket keys over a signature table. */
  private[graft] def bandKeys(sig: DataFrame, rows: Int): DataFrame = sig
    .groupBy(col("doc_id"), (col("perm") / rows).cast("long").as("band"))
    .agg(array_join(
      transform(array_sort(collect_list(struct(col("perm"), col("minh")))),
        x => x.getField("minh").cast("string")), ",").as("bkey"))

  /** Signature-estimated Jaccard (matching perms / k) for candidate pairs. */
  private def estJaccard(cand: DataFrame, sig: DataFrame, nPerms: Int): DataFrame = {
    val sa = sig.select(col("doc_id").as("doc_a"), col("perm"), col("minh").as("ma"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("perm"), col("minh").as("mb"))
    cand.join(sa, "doc_a").join(sb, Seq("doc_b", "perm"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).cast("double") / nPerms)
        .as("est_jaccard"))
  }

  /** Incremental LSH-index maintenance — the dedup-index analog of
    * ivf_upsert/kmv_merge: the indexed corpus (base = doc_id%10 != 0,
    * the deterministic stand-in for "already indexed") keeps its persisted
    * band-key + signature tables untouched; an arrival batch (delta =
    * doc_id%10 == 0) is SKETCHED ALONE and its band keys equi-joined
    * against the standing index ∪ its own keys, emitting exactly the
    * near-dup pairs that involve a new doc, tagged delta_base /
    * delta_delta.
    *
    * Unlike IVF (whose cells are data-dependent, so upsert needs a drift/
    * retrain verdict), a minhash signature is a PURE PER-DOC function —
    * delta-indexing is exactly lossless, and this operator's oracle PROVES
    * that cross-engine: Spark computes the incremental form (only delta
    * docs sketched, joined to the standing index), DuckDB computes the
    * FULL corpus recompute restricted to pairs touching a delta doc; the
    * hash gate asserts they are identical.
    *
    * At 100 TB this is the difference between re-sketching the corpus per
    * arrival batch and O(Δ) sketch work + one equi-join against a
    * bucketed band-key table (co-partition by (band, bkey) at scale);
    * candidates still only materialize through shared buckets. */
  def minhashLshUpsert(documents: DataFrame, nPerms: Int = 16,
                       bands: Int = 4, mod: Long = 10L): DataFrame = {
    require(bands > 0 && nPerms % bands == 0, s"bands=$bands must divide nPerms=$nPerms")
    val isDelta = pmod(col("doc_id"), lit(mod)) === 0L
    // standing index: band keys + signatures of the already-indexed corpus
    // (computed here from the base slice; persisted tables in production —
    // UpsertProbe measures that form against loaded parquet)
    val sigBase = minhashPortable(documents.filter(!isDelta), nPerms)
    minhashLshUpsertFrom(sigBase, bandKeys(sigBase, nPerms / bands),
        documents.filter(isDelta), nPerms, bands)
      .withColumn("kind",
        when(pmod(col("doc_a"), lit(mod)) === 0L && pmod(col("doc_b"), lit(mod)) === 0L,
          lit("delta_delta")).otherwise(lit("delta_base")))
  }

  /** Production-shaped core of [[minhashLshUpsert]]: given the PERSISTED
    * standing index (signature + band-key tables, loaded from storage) and
    * an arrival batch, emit the near-dup pairs the batch introduces —
    * (doc_a, doc_b, est_jaccard). Only the batch is sketched (the O(text)
    * shingling work); the standing tables are consumed as-is through one
    * (band, bkey) equi-join + the bounded scoring join. */
  def minhashLshUpsertFrom(sigBase: DataFrame, keysBase: DataFrame,
                           deltaDocs: DataFrame, nPerms: Int = 16,
                           bands: Int = 4): DataFrame = {
    require(bands > 0 && nPerms % bands == 0, s"bands=$bands must divide nPerms=$nPerms")
    val rows = nPerms / bands
    // the arrival batch is the only thing newly sketched
    val sigDelta = minhashPortable(deltaDocs, nPerms)
    upsertPairsFrom(sigBase, keysBase, sigDelta, bandKeys(sigDelta, rows), nPerms)
  }

  /** The arrival-created pair join given ALREADY-SKETCHED delta artifacts —
    * shared by [[minhashLshUpsertFrom]] and the CDC emission rung so the
    * two cannot drift. */
  private[graft] def upsertPairsFrom(sigBase: DataFrame, keysBase: DataFrame,
                              sigDelta: DataFrame, keysDelta: DataFrame,
                              nPerms: Int): DataFrame = {
    import Iterative._
    // the delta side BROADCASTS (a bounded arrival batch): the standing
    // key table is scanned once, never shuffled — without the hint the
    // size-unknown delta side forced a full shuffle of the standing keys
    // per batch (measured at the 100× tier). Materialized: consumed by
    // the participant restriction AND the scoring join.
    val cand = broadcast(keysDelta.as("d"))
      .join(keysBase.union(keysDelta).as("x"),
        col("d.band") === col("x.band") && col("d.bkey") === col("x.bkey") &&
          col("d.doc_id") =!= col("x.doc_id"))
      .select(
        least(col("d.doc_id"), col("x.doc_id")).as("doc_a"),
        greatest(col("d.doc_id"), col("x.doc_id")).as("doc_b"))
      .distinct().materialize
    // score against the PARTICIPATING docs' signatures only — unrestricted,
    // the scoring join shuffles the whole standing signature table per
    // batch (measured at the 100× tier: the store A/B was join-bound at
    // 2.4× until this semi-join; a 100 TB index cannot re-shuffle its
    // signature store to score a bounded arrival batch)
    val ids = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sigNeeded = sigBase.union(sigDelta)
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
    estJaccard(cand, sigNeeded, nPerms)
  }

  /** CDC EMISSION rung of LSH upsert (r13 verdict item 1 — the one
    * surviving unbounded-output registration): one maintenance cycle's
    * COMPLETE changefeed, i.e. everything a downstream consumer must apply
    * to its own copy of the maintained index — and NOTHING that merely
    * restates standing state:
    *
    *   op='S' — signature rows APPENDED to the persisted signature table
    *            (doc_id, perm, minh; Δ·nPerms rows),
    *   op='K' — band-key rows APPENDED to the band-key table
    *            (doc_id, band, bkey; Δ·bands rows — the postings-append
    *            analog of bm25_upsert's additive artifact maintenance),
    *   op='P' — the arrival-CREATED near-dup pairs appended to the pair
    *            table (doc_id = doc_a, doc_b, est_jaccard, kind;
    *            O(Δ·bucket) rows).
    *
    * Total emission is O(Δ·(nPerms + bands + bucket)) — bounded by the
    * ARRIVAL BATCH at any corpus size, where minhash_lsh_upsert's
    * registered shape was measured output-bound at the 100× tier
    * (SCALING.md r13: the store A/B collapsed to 1.36× because the pair
    * restatement dominated; a daily maintenance job at 100 TB cannot
    * restate a trillion-pair index). Precedent: dedup_resolve_delta's
    * 'I'/'U'/'D' verdict feed (ResolveInc.resolveDeltaFrom) and
    * minhash_lsh_delete_retired (the delete-side analog). Upsert creates
    * and never mutates (signatures are pure per-doc functions), so the
    * feed needs no 'U'/'D' direction: append-only CDC. Columns not
    * applicable to an op are NULL — the same nullable-changefeed layout
    * cdc_apply consumes. */
  def minhashLshUpsertDelta(documents: DataFrame, nPerms: Int = 16,
                            bands: Int = 4, mod: Long = 10L): DataFrame = {
    require(bands > 0 && nPerms % bands == 0, s"bands=$bands must divide nPerms=$nPerms")
    val isDelta = pmod(col("doc_id"), lit(mod)) === 0L
    val sigBase = minhashPortable(documents.filter(!isDelta), nPerms)
    minhashLshUpsertDeltaFrom(sigBase, bandKeys(sigBase, nPerms / bands),
      documents.filter(isDelta), nPerms, bands, mod)
  }

  /** Production-shaped core of [[minhashLshUpsertDelta]]: standing index
    * passed in (persisted tables in the store rung), only the arrival
    * batch sketched; emits the three-part changefeed. */
  def minhashLshUpsertDeltaFrom(sigBase: DataFrame, keysBase: DataFrame,
                                deltaDocs: DataFrame, nPerms: Int = 16,
                                bands: Int = 4, mod: Long = 10L): DataFrame = {
    require(bands > 0 && nPerms % bands == 0, s"bands=$bands must divide nPerms=$nPerms")
    import Iterative._
    // materialized: consumed by the 'S' emission, the band-key derive and
    // the pair scoring join — unmaterialized, the Δ sketch runs three times
    val sigDelta = minhashPortable(deltaDocs, nPerms).materialize
    val keysDelta = bandKeys(sigDelta, nPerms / bands).materialize
    val pairs = upsertPairsFrom(sigBase, keysBase, sigDelta, keysDelta, nPerms)
      .withColumn("kind",
        when(pmod(col("doc_a"), lit(mod)) === 0L && pmod(col("doc_b"), lit(mod)) === 0L,
          lit("delta_delta")).otherwise(lit("delta_base")))
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val nullD = lit(null).cast("double")
    sigDelta.select(lit("S").as("op"), col("doc_id"), col("perm"), col("minh"),
        nullL.as("band"), nullS.as("bkey"), nullL.as("doc_b"),
        nullD.as("est_jaccard"), nullS.as("kind"))
      .unionByName(keysDelta.select(lit("K").as("op"), col("doc_id"),
        nullL.as("perm"), nullL.as("minh"), col("band"), col("bkey"),
        nullL.as("doc_b"), nullD.as("est_jaccard"), nullS.as("kind")))
      .unionByName(pairs.select(lit("P").as("op"), col("doc_a").as("doc_id"),
        nullL.as("perm"), nullL.as("minh"), nullL.as("band"), nullS.as("bkey"),
        col("doc_b"), col("est_jaccard"), col("kind")))
  }

  /** Oracle for [[minhashLshUpsertDelta]]: each changefeed part recomputed
    * from scratch — delta signatures/band keys directly, pairs as the
    * full-corpus LSH restricted to delta-touching pairs (the upsert
    * oracle's restriction) — so the hash gate proves the appended
    * artifacts AND the appended pairs are exactly what a from-scratch
    * rebuild implies. */
  def minhashLshUpsertDeltaSql(nPerms: Int = 16, bands: Int = 4): String = {
    val rows = nPerms / bands
    val deltaRel = "(SELECT * FROM documents WHERE doc_id % 10 = 0)"
    s"""WITH sd AS MATERIALIZED (${minhashPortableSqlFrom(deltaRel, nPerms)}),
       |kd AS (
       |  SELECT doc_id, CAST(perm // $rows AS BIGINT) AS band,
       |    STRING_AGG(CAST(minh AS VARCHAR), ',' ORDER BY perm) AS bkey
       |  FROM sd GROUP BY doc_id, perm // $rows),
       |fp AS MATERIALIZED (${minhashLshPortableSql(nPerms, bands)})
       |SELECT 'S' AS op, doc_id, perm, minh,
       |  CAST(NULL AS BIGINT) AS band, CAST(NULL AS VARCHAR) AS bkey,
       |  CAST(NULL AS BIGINT) AS doc_b, CAST(NULL AS DOUBLE) AS est_jaccard,
       |  CAST(NULL AS VARCHAR) AS kind
       |FROM sd
       |UNION ALL
       |SELECT 'K', doc_id, NULL, NULL, band, bkey, NULL, NULL, NULL FROM kd
       |UNION ALL
       |SELECT 'P', doc_a, NULL, NULL, NULL, NULL, doc_b, est_jaccard,
       |  CASE WHEN doc_a % 10 = 0 AND doc_b % 10 = 0 THEN 'delta_delta'
       |       ELSE 'delta_base' END
       |FROM fp WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin
  }

  /** Oracle for [[minhashLshUpsert]]: the FULL-corpus LSH pairs restricted
    * to pairs involving a delta doc — identical output iff incremental
    * indexing loses (and invents) nothing. */
  def minhashLshUpsertSql(nPerms: Int = 16, bands: Int = 4): String =
    s"""WITH full_pairs AS MATERIALIZED (${minhashLshPortableSql(nPerms, bands)})
       |SELECT doc_a, doc_b, est_jaccard,
       |  CASE WHEN doc_a % 10 = 0 AND doc_b % 10 = 0 THEN 'delta_delta'
       |       ELSE 'delta_base' END AS kind
       |FROM full_pairs
       |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin

  /** DELETE direction of LSH index maintenance — the retract half of
    * [[minhashLshUpsert]] (reference analog: graph_service.py:241
    * delete_node, where Neo4j maintains its indexes through deletes). A
    * minhash signature is a PURE PER-DOC function, so deletion is exactly
    * lossless by construction: remove the departing doc_ids' rows from
    * the persisted signature + band-key tables (a broadcast anti-join
    * against the tiny delete list; in a doc_id-keyed store, a keyed
    * delete) — nothing is re-sketched, no surviving doc is touched. The
    * registered query then emits the surviving near-dup pair set FROM the
    * maintained index, while the oracle re-sketches the post-delete
    * corpus from scratch: the hash gate proves the maintained tables are
    * exactly the from-scratch ones. */
  def minhashLshDelete(documents: DataFrame, nPerms: Int = 16,
                       bands: Int = 4): DataFrame = {
    require(bands > 0 && nPerms % bands == 0, s"bands=$bands must divide nPerms=$nPerms")
    val isDel = pmod(col("doc_id"), lit(10L)) === 0L
    // standing index over the full corpus (persisted tables in production)
    val sigBase = minhashPortable(documents, nPerms)
    minhashLshDeleteFrom(sigBase, bandKeys(sigBase, nPerms / bands),
      documents.filter(isDel).select(col("doc_id")), nPerms)
  }

  /** Production-shaped core of [[minhashLshDelete]]: given the PERSISTED
    * standing index and the delete list (ids only — signatures being pure
    * per-doc functions, the text is not needed), drop the departing rows
    * from both tables and emit the surviving candidate pairs. */
  def minhashLshDeleteFrom(sigBase: DataFrame, keysBase: DataFrame,
                           delIds: DataFrame, nPerms: Int = 16): DataFrame = {
    val (sigM, keysM) = lshDeleteArtifacts(sigBase, keysBase, delIds)
    pairsFromIndex(sigM, keysM, nPerms)
  }

  /** The full candidate pair set OF a standing (signature, band-key) index —
    * the band self-join + signature-estimated Jaccard shared by the batch
    * query, the delete read path, and the maintained pair table's initial
    * build (ResolveInc). */
  private[graft] def pairsFromIndex(sig: DataFrame, keys: DataFrame,
                                    nPerms: Int = 16): DataFrame = {
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    estJaccard(cand, sig, nPerms)
  }

  /** The maintained (signature, band-key) tables after the delete —
    * package-level so the delete-then-reinsert identity spec can compose
    * them back through [[minhashLshUpsertFrom]]. */
  private[graft] def lshDeleteArtifacts(sigBase: DataFrame, keysBase: DataFrame,
                                        delIds: DataFrame): (DataFrame, DataFrame) =
    (sigBase.join(delIds, Seq("doc_id"), "left_anti"),
      keysBase.join(delIds, Seq("doc_id"), "left_anti"))

  /** Oracle for [[minhashLshDelete]]: full from-scratch LSH over the
    * post-delete corpus. */
  def minhashLshDeleteSql(nPerms: Int = 16, bands: Int = 4): String =
    minhashLshPortableSqlFrom("(SELECT * FROM documents WHERE doc_id % 10 <> 0)",
      nPerms, bands)

  /** The DELTA-BOUNDED output of LSH deletion — the pairs the delete
    * RETIRES (every standing near-dup pair touching a departing doc):
    * what a maintained pair/cluster table subtracts, mirroring
    * minhash_lsh_upsert's delta-bounded insert output. The 100× A/B
    * (SCALING.md r11) showed the full-surviving-pair emission of
    * [[minhashLshDelete]] is O(index) regardless of maintenance cost;
    * THIS is the production query shape — the departing docs' band keys
    * equi-join the standing index, output O(Δ·bucket), nothing
    * re-sketched. Tagged del_del / del_base like the upsert twin. */
  def minhashLshDeleteRetired(documents: DataFrame, nPerms: Int = 16,
                              bands: Int = 4): DataFrame = {
    require(bands > 0 && nPerms % bands == 0, s"bands=$bands must divide nPerms=$nPerms")
    val isDel = pmod(col("doc_id"), lit(10L)) === 0L
    val sigBase = minhashPortable(documents, nPerms)
    val keysBase = bandKeys(sigBase, nPerms / bands)
    val delIds = documents.filter(isDel).select(col("doc_id"))
    val keysDel = keysBase.join(delIds, Seq("doc_id"), "left_semi")
    val cand = keysDel.as("d")
      .join(keysBase.as("x"),
        col("d.band") === col("x.band") && col("d.bkey") === col("x.bkey") &&
          col("d.doc_id") =!= col("x.doc_id"))
      .select(
        least(col("d.doc_id"), col("x.doc_id")).as("doc_a"),
        greatest(col("d.doc_id"), col("x.doc_id")).as("doc_b"))
      .distinct()
    estJaccard(cand, sigBase, nPerms)
      .withColumn("kind",
        when(pmod(col("doc_a"), lit(10L)) === 0L && pmod(col("doc_b"), lit(10L)) === 0L,
          lit("del_del")).otherwise(lit("del_base")))
  }

  /** Oracle for [[minhashLshDeleteRetired]]: the full-corpus pair set
    * restricted to pairs touching a deleted doc. */
  def minhashLshDeleteRetiredSql(nPerms: Int = 16, bands: Int = 4): String =
    s"""WITH full_pairs AS MATERIALIZED (${minhashLshPortableSql(nPerms, bands)})
       |SELECT doc_a, doc_b, est_jaccard,
       |  CASE WHEN doc_a % 10 = 0 AND doc_b % 10 = 0 THEN 'del_del'
       |       ELSE 'del_base' END AS kind
       |FROM full_pairs
       |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin

  def minhashLshPortableSql(nPerms: Int = 16, bands: Int = 4): String =
    minhashLshPortableSqlFrom("documents", nPerms, bands)

  /** Batch statement of the HOT-BUCKET-CAPPED streaming near-dedup
    * contract (Streams.streamingNearDedup maxBucket): pair (a,b), a < b
    * in arrival (= doc_id) order, is a candidate iff a is among the first
    * `cap` arrivals of a shared (band, bkey) bucket — the retained set
    * the capped state compares b against. Scoring is unchanged (est is a
    * pure signature function), so the capped streaming replay hash-equals
    * THIS query exactly: the gate proves the bounded form's contract, not
    * an approximation. */
  def minhashLshCappedSql(nPerms: Int = 16, bands: Int = 4,
                          cap: Int = 32): String = {
    val rows = nPerms / bands
    s"""WITH sig AS MATERIALIZED (${minhashPortableSql(nPerms)}),
       |keys AS (
       |  SELECT doc_id, CAST(perm // $rows AS BIGINT) AS band,
       |    STRING_AGG(CAST(minh AS VARCHAR), ',' ORDER BY perm) AS bkey
       |  FROM sig GROUP BY doc_id, perm // $rows),
       |rk AS (
       |  SELECT doc_id, band, bkey,
       |    ROW_NUMBER() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS rn
       |  FROM keys),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rk a JOIN rk b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  WHERE a.rn <= $cap)
       |SELECT c.doc_a, c.doc_b,
       |  CAST(SUM(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) AS DOUBLE) / $nPerms
       |    AS est_jaccard
       |FROM cand c
       |JOIN sig sa ON sa.doc_id = c.doc_a
       |JOIN sig sb ON sb.doc_id = c.doc_b AND sb.perm = sa.perm
       |GROUP BY c.doc_a, c.doc_b""".stripMargin
  }

  private[graft] def minhashLshPortableSqlFrom(docsRel: String, nPerms: Int,
                                               bands: Int): String = {
    val rows = nPerms / bands
    s"""WITH sig AS MATERIALIZED (${minhashPortableSqlFrom(docsRel, nPerms)}),
       |keys AS (
       |  SELECT doc_id, CAST(perm // $rows AS BIGINT) AS band,
       |    STRING_AGG(CAST(minh AS VARCHAR), ',' ORDER BY perm) AS bkey
       |  FROM sig GROUP BY doc_id, perm // $rows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keys a JOIN keys b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |  CAST(SUM(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) AS DOUBLE) / $nPerms
       |    AS est_jaccard
       |FROM cand c
       |JOIN sig sa ON sa.doc_id = c.doc_a
       |JOIN sig sb ON sb.doc_id = c.doc_b AND sb.perm = sa.perm
       |GROUP BY c.doc_a, c.doc_b""".stripMargin
  }

  /** SimHash near-dup pairs under the portable hash family — the
    * oracle-checked twin of Dedup.simhashPairs. Per distinct shingle the
    * base rolling hash expands to 64 bits via a multiply + xor-shift
    * (v_k = (h·K + k·C) mod 2³²; bit = (v_k ⊕ v_k/2¹⁶) mod 2 — the same
    * decorrelation trick as the multi-table LSH planes), fingerprint bit k
    * = sign of the ±1 vote sum, assembled with bit-OR (NOT integer sum:
    * bit 63 would overflow BIGINT in one engine and HUGEINT-promote in the
    * other). Spark generates candidates with the 4×16-bit chunk pigeonhole
    * (any pair at hamming ≤ 3 shares a chunk) while the ORACLE brute-forces
    * every pair — the hash match therefore also PROVES the blocking loses
    * no pair at this distance. */
  def simhashPortable(documents: DataFrame, maxDist: Int = 3): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val fps = documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.map { case (docId, text) =>
          val toks = text.trim.split("\\s+")
          val shingles = scala.collection.mutable.LinkedHashSet.empty[String]
          var i = 0
          while (i < toks.length - 2) {
            shingles += (toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
            i += 1
          }
          val counts = new Array[Int](64)
          shingles.foreach { s =>
            var h = 0L
            var j = 0
            while (j < s.length) {
              h = (h * 31L + s.charAt(j)) % Mod
              j += 1
            }
            var k = 0
            while (k < 64) {
              val v = (h * 2654435761L + k.toLong * 40503L) % 4294967296L
              if (((v ^ (v / 65536L)) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
              k += 1
            }
          }
          var fp = 0L
          var k = 0
          while (k < 64) { if (counts(k) > 0) fp |= (1L << k); k += 1 }
          (docId, fp, shingles.nonEmpty)
        }
      }
      .toDF("doc_id", "fp", "has_sh")
      .filter(col("has_sh"))
    val chunks = array((0 until 4).map(b =>
      shiftright(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = fps.select(col("doc_id"), col("fp"), posexplode(chunks))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  def simhashPortableSql(maxDist: Int = 3): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |    FROM tk WHERE len(t) >= 3)),
       |hx AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(s, ''), x -> CAST(ord(x) AS BIGINT))),
       |    (acc, c) -> (acc * 31 + c) % $Mod) AS h
       |  FROM sh),
       |bits AS (
       |  SELECT doc_id, k,
       |    SUM(CASE WHEN xor((h * 2654435761 + k * 40503) % 4294967296,
       |                      ((h * 2654435761 + k * 40503) % 4294967296) // 65536) % 2 = 1
       |             THEN 1 ELSE -1 END) AS c
       |  FROM hx CROSS JOIN (SELECT unnest(range(0, 64)) AS k)
       |  GROUP BY doc_id, k),
       |fp AS (
       |  SELECT doc_id,
       |    BIT_OR(CASE WHEN c <= 0 THEN CAST(0 AS BIGINT)
       |                WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |                ELSE CAST(1 AS BIGINT) << k END) AS fp
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $maxDist""".stripMargin

  def minhashPortableSql(nPerms: Int = 16): String =
    minhashPortableSqlFrom("documents", nPerms)

  private def minhashPortableSqlFrom(docsRel: String, nPerms: Int): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM $docsRel),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(t) - 1),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |  FROM tk WHERE len(t) >= 3),
       |hx AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(s, ''), x -> CAST(ord(x) AS BIGINT))),
       |    (acc, c) -> (acc * 31 + c) % $Mod) AS x
       |  FROM sh),
       |perms AS (SELECT unnest(range(0, $nPerms)) AS perm)
       |SELECT doc_id, CAST(perm AS BIGINT) AS perm,
       |  MIN((((perm + 1) * 2654435761) % $Mod * x + ((perm + 1) * 40503) % $Mod) % $Mod) AS minh
       |FROM hx CROSS JOIN perms GROUP BY doc_id, perm""".stripMargin

  /** Sketch-error evaluation for the minhash estimator — every LSH
    * deployment's calibration step: for each LSH candidate pair, put the
    * signature-estimated Jaccard next to the EXACT shingle Jaccard and the
    * absolute error. Exact sets are computed only for the candidate pairs
    * LSH surfaced (bucket-bounded — never all pairs), so the eval costs
    * what the dedup already cost plus one bounded join. est is k-rational,
    * exact is a single integer division: every column is IEEE-exact, so
    * even this error report hash-matches the oracle. */
  /** Per-doc distinct shingle-hash sets under the portable family — the
    * exact-side input for minhashEval / pairFeatures. */
  private def shingleSets(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val toks = text.trim.split("\\s+")
        if (toks.length < 3) Iterator.empty
        else {
          val hs = scala.collection.mutable.SortedSet.empty[Long]
          var i = 0
          while (i < toks.length - 2) {
            val s = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
            var h = 0L
            var j = 0
            while (j < s.length) { h = (h * 31L + s.charAt(j)) % Mod; j += 1 }
            hs += h
            i += 1
          }
          Iterator.single((docId, hs.toArray))
        }
      }
      .toDF("doc_id", "hs")
  }

  def minhashEval(documents: DataFrame, nPerms: Int = 16, bands: Int = 4): DataFrame = {
    val cand = minhashLshPortable(documents, nPerms, bands)
    val sets = shingleSets(documents)
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("exact_jaccard", col("inter").cast("double") /
        (size(col("ha")) + size(col("hb")) - col("inter")).cast("double"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("exact_jaccard")))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        col("exact_jaccard"), col("abs_err"))
  }

  def minhashEvalSql(nPerms: Int = 16, bands: Int = 4): String =
    s"""WITH cand AS MATERIALIZED (${minhashLshPortableSql(nPerms, bands)}),
       |tk2 AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh2 AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |    FROM tk2 WHERE len(t) >= 3)),
       |hx2 AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(s, ''), x -> CAST(ord(x) AS BIGINT))),
       |    (acc, c) -> (acc * 31 + c) % $Mod) AS h
       |  FROM sh2),
       |sets AS (SELECT doc_id, list_distinct(list(h)) AS hs FROM hx2 GROUP BY doc_id)
       |SELECT c.doc_a, c.doc_b, c.est_jaccard,
       |  CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
       |    CAST(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS DOUBLE)
       |    AS exact_jaccard,
       |  ABS(c.est_jaccard -
       |    CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
       |      CAST(len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)) AS DOUBLE))
       |    AS abs_err
       |FROM cand c
       |JOIN sets a ON c.doc_a = a.doc_id
       |JOIN sets b ON c.doc_b = b.doc_id""".stripMargin

  /** Pair FEATURE table for training/calibrating a dedup decision model
    * (the ML-prep step after candidate generation: NearDedup-style
    * pipelines learn a keep/merge classifier over exactly these
    * signals): per LSH candidate pair — estimated Jaccard, exact
    * Jaccard, max directional containment, shingle-count ratio, and
    * same-language flag. Candidates stay bucket-bounded; exact sets join
    * only against surfaced pairs; every column is integer-derived or a
    * single IEEE division, so the feature table itself is hash-exact. */
  def pairFeatures(documents: DataFrame, nPerms: Int = 16, bands: Int = 4): DataFrame = {
    val cand = minhashLshPortable(documents, nPerms, bands)
    val sets = shingleSets(documents)
    val langs = documents.select(col("doc_id"), col("lang"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .join(langs.select(col("doc_id").as("doc_a"), col("lang").as("lang_a")), "doc_a")
      .join(langs.select(col("doc_id").as("doc_b"), col("lang").as("lang_b")), "doc_b")
      .withColumn("na", size(col("ha")).cast("long"))
      .withColumn("nb", size(col("hb")).cast("long"))
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("exact_jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .withColumn("containment", col("inter").cast("double") /
        least(col("na"), col("nb")).cast("double"))
      .withColumn("len_ratio", least(col("na"), col("nb")).cast("double") /
        greatest(col("na"), col("nb")).cast("double"))
      .withColumn("same_lang", col("lang_a") === col("lang_b"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("exact_jaccard"),
        col("containment"), col("len_ratio"), col("same_lang"))
  }

  def pairFeaturesSql(nPerms: Int = 16, bands: Int = 4): String =
    s"""WITH cand AS MATERIALIZED (${minhashLshPortableSql(nPerms, bands)}),
       |tk2 AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh2 AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, len(t) - 1),
       |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |    FROM tk2 WHERE len(t) >= 3)),
       |hx2 AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(s, ''), x -> CAST(ord(x) AS BIGINT))),
       |    (acc, c) -> (acc * 31 + c) % $Mod) AS h
       |  FROM sh2),
       |sets AS (SELECT doc_id, list_distinct(list(h)) AS hs FROM hx2 GROUP BY doc_id),
       |f AS (
       |  SELECT c.doc_a, c.doc_b, c.est_jaccard,
       |    CAST(len(a.hs) AS BIGINT) AS na, CAST(len(b.hs) AS BIGINT) AS nb,
       |    CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter,
       |    la.lang AS lang_a, lb.lang AS lang_b
       |  FROM cand c
       |  JOIN sets a ON c.doc_a = a.doc_id
       |  JOIN sets b ON c.doc_b = b.doc_id
       |  JOIN documents la ON c.doc_a = la.doc_id
       |  JOIN documents lb ON c.doc_b = lb.doc_id)
       |SELECT doc_a, doc_b, est_jaccard,
       |  CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS exact_jaccard,
       |  CAST(inter AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE) AS containment,
       |  CAST(LEAST(na, nb) AS DOUBLE) / CAST(GREATEST(na, nb) AS DOUBLE) AS len_ratio,
       |  lang_a = lang_b AS same_lang
       |FROM f""".stripMargin

  /** LSH-INDEX drift monitor — the rebucket trigger that completes the
    * retrain-trigger matrix (IVF occupancy: ivf_upsert's report; PQ
    * residual drift: ivf_pq_drift; graph staleness: ann_graph_drift):
    * per LSH band, the bucket-occupancy CONCENTRATION of the arrival
    * batch vs the standing base index. An LSH table whose arrivals pile
    * into few buckets has drifted away from the banding assumption
    * (near-dup cliques or a shifted shingle distribution) — candidate
    * generation degenerates toward the bucket² worst case and the band
    * key recipe should be re-drawn. Verdict per band: arrivals' max
    * bucket share exceeds `factor`× the base's max bucket share, decided
    * by INTEGER cross-multiplication (max_delta·tot_base >
    * factor·max_base·tot_delta) — every output value is an exact count
    * or an exact-integer comparison, so the DuckDB replay is a direct
    * hash match (at petabyte counts the cross-products would move to
    * DECIMAL; bench SFs stay far inside long range). One sketch pass per
    * slice + two (band, bkey) groupBys — O(corpus) narrow work, the
    * monitor's contract. */
  def minhashLshDrift(documents: DataFrame, nPerms: Int = 16, bands: Int = 4,
                      factor: Long = 2L): DataFrame = {
    val isArr = pmod(col("doc_id"), lit(10L)) === 0L
    val rows = nPerms / bands
    def occ(slice: DataFrame, cnt: String) =
      bandKeys(minhashPortable(slice, nPerms), rows)
        .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as(cnt))
    val aggB = occ(documents.filter(!isArr), "nb")
      .groupBy(col("band")).agg(sum(col("nb")).as("tot_base"),
        count(lit(1)).as("buckets_base"), max(col("nb")).as("max_base"))
    val aggA = occ(documents.filter(isArr), "na")
      .groupBy(col("band")).agg(sum(col("na")).as("tot_delta"),
        count(lit(1)).as("buckets_delta"), max(col("na")).as("max_delta"))
    aggB.join(aggA, Seq("band"), "full_outer")
      .withColumn("rebucket", coalesce(
        col("max_delta") * col("tot_base") >
          lit(factor) * col("max_base") * col("tot_delta"), lit(false)))
  }

  /** Oracle for [[minhashLshDrift]]: the portable sketch replayed per
    * slice, the same two-level occupancy aggregation, the same integer
    * cross-multiplied verdict. */
  def minhashLshDriftSql(nPerms: Int = 16, bands: Int = 4,
                         factor: Long = 2L): String = {
    val rows = nPerms / bands
    def keysCte(sigRel: String) =
      s"""SELECT doc_id, CAST(perm // $rows AS BIGINT) AS band,
         |    STRING_AGG(CAST(minh AS VARCHAR), ',' ORDER BY perm) AS bkey
         |  FROM $sigRel GROUP BY doc_id, perm // $rows""".stripMargin
    s"""WITH sigb AS MATERIALIZED (
       |${minhashPortableSqlFrom("(SELECT * FROM documents WHERE doc_id % 10 <> 0)", nPerms)}),
       |siga AS MATERIALIZED (
       |${minhashPortableSqlFrom("(SELECT * FROM documents WHERE doc_id % 10 = 0)", nPerms)}),
       |kb AS (${keysCte("sigb")}),
       |ka AS (${keysCte("siga")}),
       |ob AS (SELECT band, bkey, COUNT(*) AS nb FROM kb GROUP BY 1, 2),
       |oa AS (SELECT band, bkey, COUNT(*) AS na FROM ka GROUP BY 1, 2),
       |ab AS (
       |  SELECT band, CAST(SUM(nb) AS BIGINT) AS tot_base,
       |    COUNT(*) AS buckets_base, MAX(nb) AS max_base
       |  FROM ob GROUP BY 1),
       |aa AS (
       |  SELECT band, CAST(SUM(na) AS BIGINT) AS tot_delta,
       |    COUNT(*) AS buckets_delta, MAX(na) AS max_delta
       |  FROM oa GROUP BY 1)
       |SELECT COALESCE(ab.band, aa.band) AS band, tot_base, buckets_base,
       |  max_base, tot_delta, buckets_delta, max_delta,
       |  COALESCE(max_delta * tot_base > $factor * max_base * tot_delta,
       |    FALSE) AS rebucket
       |FROM ab FULL OUTER JOIN aa ON ab.band = aa.band""".stripMargin
  }
}
