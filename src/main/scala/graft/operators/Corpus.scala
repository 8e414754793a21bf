package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the C4/RefinedWeb-style filtering steps every
  * LLM training-data pipeline runs before dedup: quality gating, PII
  * scrubbing, deterministic sampling, corpus statistics. All narrow
  * transforms or single-shuffle rollups; every rule is a codegen'd column
  * expression, so the whole filter chain fuses into one scan pass.
  */
object Corpus {

  private def nTokens: Column =
    size(split(trim(col("text")), "\\s+")).cast("long")

  private def occ(term: String): Column =
    ((length(col("text")) - length(regexp_replace(col("text"), java.util.regex.Pattern.quote(term), ""))) / term.length).cast("long")

  /** Quality gate (the C4 recipe shape): length window, mean word length
    * sane, enough lexical diversity. Emits keep/drop with the reason —
    * pipelines audit drop reasons at scale. */
  def qualityFilter(documents: DataFrame): DataFrame = {
    val toks = nTokens
    val ttr = size(array_distinct(split(trim(col("text")), "\\s+"))).cast("double") / toks.cast("double")
    val awl = length(regexp_replace(col("text"), " ", "")).cast("double") / toks.cast("double")
    documents.select(
      col("doc_id"),
      when(toks < 10, "too_short")
        .when(toks > 100000, "too_long")
        .when(awl < 2.0, "words_too_short")
        .when(awl > 12.0, "words_too_long")
        .when(ttr < 0.3, "too_repetitive")
        .otherwise("keep").as("verdict"))
  }

  val qualityFilterSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
      |    CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
      |      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS ttr,
      |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS awl
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN toks < 10 THEN 'too_short'
      |       WHEN toks > 100000 THEN 'too_long'
      |       WHEN awl < 2.0 THEN 'words_too_short'
      |       WHEN awl > 12.0 THEN 'words_too_long'
      |       WHEN ttr < 0.3 THEN 'too_repetitive'
      |       ELSE 'keep' END AS verdict
      |FROM f""".stripMargin

  /** PII scrubbing: redact digit runs and email-shaped tokens. Simple RE2-
    * compatible patterns so engines (and the oracle) agree byte-for-byte. */
  def piiScrub(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
        "[0-9][0-9][0-9]+", "<NUM>").as("scrubbed"))

  val piiScrubSql: String =
    """SELECT doc_id,
      |regexp_replace(
      |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
      |  '[0-9][0-9][0-9]+', '<NUM>', 'g') AS scrubbed
      |FROM documents""".stripMargin

  /** Deterministic stratified sampling: keep ~pct% per language via a
    * multiplicative hash of doc_id — reproducible across runs/engines, no
    * RNG state, no sort. The train/test-split primitive at any scale. */
  def stratifiedSample(documents: DataFrame, pct: Int = 10): DataFrame =
    documents
      // mask to 31 bits before the multiply: (2^31-1)·2654435761 < 2^63, so
      // the product never wraps — Spark wraps silently on BIGINT overflow
      // while DuckDB raises, which would break cross-engine reproducibility
      // exactly at large ids
      .filter(pmod(col("doc_id").bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L, lit(100L)) < pct)
      .select(col("doc_id"), col("lang"))

  def stratifiedSampleSql(pct: Int = 10): String =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ((doc_id & 2147483647) * 2654435761) % 100 < $pct""".stripMargin

  /** Deterministic corpus shuffle — training-order randomization (the step
    * right before sequence packing: neighbors in crawl order must not be
    * neighbors in training order): shuffle_key is a multiplicative hash of
    * doc_id, so the permutation is reproducible across runs AND engines
    * (no RNG state); shard = key range bucket. The physical realization at
    * scale is `repartitionByRange(shuffle_key) + sortWithinPartitions` —
    * a single range shuffle, no global rank anywhere (a global position
    * column would need an unpartitioned window; consumers read shards in
    * shard order instead). */
  def corpusShuffle(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val key = pmod(col("doc_id").bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L, lit(1000003L))
    documents.select(
      col("doc_id"),
      key.as("shuffle_key"),
      pmod(key, lit(nShards.toLong)).as("shard"))
  }

  def corpusShuffleSql(nShards: Int = 8): String =
    s"""SELECT doc_id,
       |((doc_id & 2147483647) * 2654435761) % 1000003 AS shuffle_key,
       |(((doc_id & 2147483647) * 2654435761) % 1000003) % $nShards AS shard
       |FROM documents""".stripMargin

  /** Deterministic train/val/test holdout assignment — the split every
    * training run needs pinned BEFORE any curation so no pipeline stage can
    * leak eval docs into training. Same multiplicative-hash discipline as
    * `stratifiedSample`, decorrelated from `corpusShuffle`'s key by the
    * xor-shift fold (an affine-only family would make split and shuffle
    * order correlated — the multi-table-LSH lesson). Narrow, zero-shuffle,
    * reproducible across runs AND engines. */
  def splitHoldout(documents: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val h = pmod(col("doc_id").bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L, lit(4294967296L))
    val bucket = pmod(h.bitwiseXOR(shiftright(h, 16)), lit(100L))
    documents.select(
      col("doc_id"), col("lang"), bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  def splitHoldoutSql(trainPct: Int = 80, valPct: Int = 10): String =
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |    xor((doc_id & 2147483647) * 2654435761 % 4294967296,
       |        ((doc_id & 2147483647) * 2654435761 % 4294967296) // 65536) % 100 AS bucket
       |  FROM documents)
       |SELECT doc_id, lang, bucket,
       |  CASE WHEN bucket < $trainPct THEN 'train'
       |       WHEN bucket < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM h""".stripMargin

  /** KMV (k-minimum-values) distinct sketch per event type — the
    * oracle-checkable twin of `sketchStats`' HyperLogLog (whose register
    * layout is engine-specific by construction). The k smallest values of a
    * uniform hash determine the cardinality estimate (k-1)·M/h_k
    * (Bar-Yossef et al.); under the engine-portable xor-shift hash both
    * sides compute bit-identical estimates, so the SKETCH ITSELF is
    * hash-oracle-verified — rare for an approximate structure. Scale shape:
    * the per-key state is k values (bounded TopKAgg, map-side partials ⇒
    * shuffle O(types·k) after the distinct), and KMV merges by
    * union-then-retake-k, the property that makes it a distributed
    * aggregate at all. */
  /** The ONE portable KMV hash (xor-shifted multiplicative) and estimator
    * — shared by [[kmvDistinct]]/[[kmvMerge]] and their SQL twins, whose
    * bit-equality the SketchSpec merge test asserts: a tweak applied to
    * one copy of four would only surface as an opaque hash mismatch. */
  private def kmvHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = pmod(key.bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L, lit(4294967296L))
    h.bitwiseXOR(shiftright(h, 16))
  }

  /** (k−1)·M/h_k, exact below k retained values (`nd` = that count). */
  private def kmvEstimate(mins: org.apache.spark.sql.Column,
                          nd: org.apache.spark.sql.Column, k: Int) =
    when(nd < k, nd.cast("double"))
      .otherwise(lit((k - 1).toDouble * 4294967296.0) /
        element_at(mins, k).getField("id").cast("double"))

  private val KmvHashSql: String =
    """xor((user_id & 2147483647) * 2654435761 % 4294967296,
      |        ((user_id & 2147483647) * 2654435761 % 4294967296) // 65536)""".stripMargin

  def kmvDistinct(events: DataFrame, k: Int = 8): DataFrame =
    events.select(col("event_type"), kmvHash(col("user_id")).as("hv")).distinct()
      .groupBy(col("event_type"))
      .agg(
        graft.functions.TopKAgg.topK(col("hv").cast("double") * -1, col("hv"), k).as("mins"),
        count(lit(1)).as("n_distinct"))
      .select(
        col("event_type"), col("n_distinct"),
        kmvEstimate(col("mins"), col("n_distinct"), k).as("est_users"))

  /** Incremental KMV — the sketch-PERSISTENCE pattern every production
    * profiling pipeline needs: each ingestion batch (here: one day of
    * events) computes its own k-min sketch; the merged estimate re-mins
    * the UNION of per-batch sketches. k-min sets form a semilattice
    * (every global k-smallest hash is k-smallest within its own batch),
    * so the two-phase result is BIT-IDENTICAL to the single-pass sketch —
    * and the oracle states exactly that: it replays the SINGLE-pass KMV,
    * so the hash gate proves "incremental maintenance == full recompute"
    * cross-engine. Scale shape: phase 1 is one map-combined groupBy per
    * batch partition emitting k values per (group, batch); the merge
    * phase touches only O(groups·batches·k) sketch rows — at 100 TB the
    * daily job reads yesterday's sketch TABLE, never yesterday's data. */
  def kmvMerge(events: DataFrame, k: Int = 8): DataFrame = {
    val sketches = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        kmvHash(col("user_id")).as("hv")).distinct()
      .groupBy(col("event_type"), col("day"))
      .agg(graft.functions.TopKAgg.topK(col("hv").cast("double") * -1, col("hv"), k).as("mins"))
    sketches
      .select(col("event_type"), explode(col("mins")).as("m"))
      .select(col("event_type"), col("m").getField("id").as("hv")).distinct()
      .groupBy(col("event_type"))
      .agg(
        graft.functions.TopKAgg.topK(col("hv").cast("double") * -1, col("hv"), k).as("mins"),
        count(lit(1)).as("n_sketch"))
      .select(
        col("event_type"),
        // below k retained values the sketch IS the exact distinct set, so
        // the threshold cases agree with the single-pass oracle exactly
        kmvEstimate(col("mins"), col("n_sketch"), k).as("est_users"))
  }

  /** Oracle: the SINGLE-pass KMV estimate — the day-batched merge must be
    * invisible in the result (see [[kmvMerge]]). */
  /** One SQL builder for both KMV oracles — both state the SINGLE-pass
    * sketch (that IS kmv_merge's correctness claim); the n_distinct
    * column is kmv_distinct's only extra. Hash snippet shared via
    * [[KmvHashSql]], estimator stated once here. */
  private def kmvSql(k: Int, includeNDistinct: Boolean): String = {
    val nd = if (includeNDistinct) " CAST(MAX(nd) AS BIGINT) AS n_distinct," else ""
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    $KmvHashSql AS hv
       |  FROM events),
       |r AS (
       |  SELECT event_type, hv,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS nd
       |  FROM h)
       |SELECT event_type,$nd
       |  CASE WHEN MAX(nd) < $k THEN CAST(MAX(nd) AS DOUBLE)
       |       ELSE ${(k - 1).toDouble * 4294967296.0} /
       |            CAST(MAX(CASE WHEN rn = $k THEN hv END) AS DOUBLE) END AS est_users
       |FROM r GROUP BY event_type""".stripMargin
  }

  def kmvMergeSql(k: Int = 8): String = kmvSql(k, includeNDistinct = false)

  def kmvDistinctSql(k: Int = 8): String = kmvSql(k, includeNDistinct = true)

  /** TURNSTILE distinct — the DELETE direction the sketch family lacked
    * (r11/r12 verdict item 3; reference analog: graph_service.py:241
    * delete_node — stats surfaces must stay correct through deletes):
    * a k-min sketch is NOT invertible (dropping
    * a retained minimum cannot recover the (k+1)-th value — documented at
    * kmvMerge), so the standard answer is a TURNSTILE layer underneath:
    * exact additive per-(group, key) counts, maintained by signed deltas
    * (+1 per arriving event, −1 per departing event). The distinct-key
    * view — and any k-min sketch — REBUILDS from the surviving keys
    * (cnt > 0), never from re-scanned data. Departure batch here:
    * event_id % 10 == 5 (an EVENT slice, so users lose only SOME events —
    * the partial-decrement case that actually exercises the turnstile;
    * a user survives iff any event remains).
    *
    * Output per event_type: exact surviving distinct users AND the
    * portable-KMV estimate over the surviving key set — both SQL-portable,
    * so the hash gate proves the subtraction exact end-to-end: an
    * under-subtracted key survives wrongly, an over-subtracted key
    * vanishes, and either breaks the hash against the from-scratch
    * post-delete recompute.
    *
    * Scale shape: the standing count table is one (type, user) groupBy at
    * ingest (map-side combined; bucketed by key in production), a delta
    * batch maintains it with O(Δ) negated counts + one keyed merge, and
    * the sketch rebuild shuffles O(groups·k) after the survivor filter. */
  def turnstileDistinct(events: DataFrame, k: Int = 8): DataFrame = {
    val isDel = pmod(col("event_id"), lit(10L)) === 5L
    // standing counts over the full stream (persisted table in production)
    turnstileDistinctFrom(turnstileCounts(events, sign = 1L),
      events.filter(isDel), k)
  }

  /** Signed per-(event_type, user_id) occurrence counts of one batch —
    * the turnstile delta (+1 arrivals, −1 departures). */
  private[graft] def turnstileCounts(events: DataFrame, sign: Long): DataFrame =
    events.groupBy(col("event_type"), col("user_id"))
      .agg((count(lit(1)) * sign).as("cnt"))

  /** Production-shaped core: given the PERSISTED standing count table and
    * a departure batch, subtract the batch's counts and emit the surviving
    * distinct view + KMV estimate. The merged count table (counts ⊎
    * negated delta, summed per key) is exactly what a keyed count store
    * maintains in place. */
  def turnstileDistinctFrom(standing: DataFrame, delEvents: DataFrame,
                            k: Int = 8): DataFrame = {
    val maintained = standing
      .unionByName(turnstileCounts(delEvents, sign = -1L))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0L)
    maintained
      .select(col("event_type"), kmvHash(col("user_id")).as("hv")).distinct()
      .groupBy(col("event_type"))
      .agg(
        graft.functions.TopKAgg.topK(col("hv").cast("double") * -1, col("hv"), k).as("mins"),
        count(lit(1)).as("n_distinct"))
      .select(col("event_type"), col("n_distinct"),
        kmvEstimate(col("mins"), col("n_distinct"), k).as("est_users"))
  }

  /** Oracle: the from-scratch post-delete recompute — distinct users and
    * single-pass KMV over events surviving the departure slice. */
  def turnstileDistinctSql(k: Int = 8): String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    $KmvHashSql AS hv
       |  FROM events WHERE event_id % 10 <> 5),
       |r AS (
       |  SELECT event_type, hv,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS nd
       |  FROM h)
       |SELECT event_type, CAST(MAX(nd) AS BIGINT) AS n_distinct,
       |  CASE WHEN MAX(nd) < $k THEN CAST(MAX(nd) AS DOUBLE)
       |       ELSE ${(k - 1).toDouble * 4294967296.0} /
       |            CAST(MAX(CASE WHEN rn = $k THEN hv END) AS DOUBLE) END AS est_users
       |FROM r GROUP BY event_type""".stripMargin

  /** Sketch-based statistics — the O(1)-memory cardinality/quantile tools
    * that replace exact distincts at 100 TB: HyperLogLog++ distinct users
    * and an approximate median per event type. rows-only (sketch estimates
    * are engine-specific by construction); the spec bounds estimate error
    * against exact values. */
  def sketchStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_median_value"))

  /** Corpus statistics rollup: per-language token/char volumes and doc
    * counts — the dashboard numbers of every curation pipeline. */
  /** Per-source dataset card — the one-page manifest a corpus release
    * ships with: doc/char/token totals, language spread, and the share of
    * the dominant-language slice. Single grouped pass with map-side
    * combine (all counters associative); integer sums + one exact
    * division, so it hash-matches the oracle at any partitioning. */
  def datasetCard(documents: DataFrame): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
    documents
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(nTok).as("sum_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("double")
          / count(lit(1)).cast("double")).as("en_frac"))
  }

  val datasetCardSql: String =
    """SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS sum_tokens,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS en_frac
      |FROM documents GROUP BY source""".stripMargin

  def stats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTokens).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(occ("the")).as("the_count"))

  val statsSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
      |CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |CAST(SUM((length(text) - length(replace(text, 'the', '')))/3) AS BIGINT) AS the_count
      |FROM documents GROUP BY lang""".stripMargin

  /** Cross-source overlap matrix — dataset-composition diligence (how
    * much of source A also appears in source B; the question every
    * multi-source training mix has to answer before weighting) — measured
    * at CHUNK granularity: whole-document hashing only catches verbatim
    * re-publication, while real cross-source contamination is shared
    * passages inside otherwise-different documents (the chunk_dedup
    * finding: duplicate content exists at chunk level where doc level
    * shows zero). Chunks are hashed per (source, hash) DISTINCT, then a
    * hash-keyed self-join counts shared hashes per source pair —
    * corpus-sized text never moves past the chunk hash, and pairs
    * materialize only through genuinely shared content. */
  def corpusOverlap(documents: DataFrame, chunkSize: Int = 256,
                    chunkOverlap: Int = 32): DataFrame = {
    val ch = Chunking.chunkFixed(documents, chunkSize, chunkOverlap)
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), md5(col("chunk_text")).as("h")).distinct()
    ch.as("a").join(ch.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def corpusOverlapSql(chunkSize: Int = 256, chunkOverlap: Int = 32): String =
    s"""WITH chx AS (${Chunking.chunkFixedSql(chunkSize, chunkOverlap)}),
       |sh AS (
       |  SELECT DISTINCT d.source, md5(chx.chunk_text) AS h
       |  FROM chx JOIN documents d USING (doc_id))
       |SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
       |FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin

  /** Quality-weighted sampling (the DCLM/FineWeb recipe: don't drop
    * low-quality text outright — downsample it): bucket each doc by a
    * quality signal (type-token ratio — integers divided, identical across
    * engines), then keep a bucket-dependent fraction via the overflow-safe
    * multiplicative hash stratifiedSample already uses. High keeps all,
    * mid half, low a tenth. One narrow scan, zero shuffle; rates are
    * compile-time constants (at scale: a broadcast rate table). */
  def qualitySample(documents: DataFrame, highPct: Int = 100, midPct: Int = 50,
                    lowPct: Int = 10): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val ttr = size(array_distinct(toks)).cast("double") / size(toks).cast("double")
    val bucket = when(ttr >= 0.9, "high").when(ttr >= 0.7, "mid").otherwise("low")
    val rate = when(col("bucket") === "high", highPct)
      .when(col("bucket") === "mid", midPct).otherwise(lowPct)
    documents
      .withColumn("bucket", bucket)
      .filter(pmod(col("doc_id").bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L, lit(100L))
        < rate.cast("long"))
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  def qualitySampleSql(highPct: Int = 100, midPct: Int = 50, lowPct: Int = 10): String =
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
       |              / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) >= 0.9
       |         THEN 'high'
       |         WHEN CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
       |              / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) >= 0.7
       |         THEN 'mid' ELSE 'low' END AS bucket
       |  FROM documents)
       |SELECT doc_id, lang, bucket FROM b
       |WHERE ((doc_id & 2147483647) * 2654435761) % 100 <
       |  CASE bucket WHEN 'high' THEN $highPct WHEN 'mid' THEN $midPct ELSE $lowPct END""".stripMargin
}
