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
