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

  def minhashPortable(documents: DataFrame, nPerms: Int = 16): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val toks = text.trim.split("\\s+")
        if (toks.length < 3) Iterator.empty
        else {
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
          (0 until nPerms).iterator.map { perm =>
            val a = ((perm + 1).toLong * 2654435761L) % Mod
            val b = ((perm + 1).toLong * 40503L) % Mod
            var mn = Long.MaxValue
            var t = 0
            while (t < xs.length) {
              val v = (a * xs(t) + b) % Mod
              if (v < mn) mn = v
              t += 1
            }
            (docId, perm.toLong, mn)
          }
        }
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
    val keys = sig
      .groupBy(col("doc_id"), (col("perm") / rows).cast("long").as("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("perm"), col("minh")))),
          x => x.getField("minh").cast("string")), ",").as("bkey"))
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("doc_a"), col("perm"), col("minh").as("ma"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("perm"), col("minh").as("mb"))
    cand.join(sa, "doc_a").join(sb, Seq("doc_b", "perm"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).cast("double") / nPerms)
        .as("est_jaccard"))
  }

  def minhashLshPortableSql(nPerms: Int = 16, bands: Int = 4): String = {
    val rows = nPerms / bands
    s"""WITH sig AS MATERIALIZED (${minhashPortableSql(nPerms)}),
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

  def minhashPortableSql(nPerms: Int = 16): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
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
}
