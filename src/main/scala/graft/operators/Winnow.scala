package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm) — the copy-detection primitive `doc_fingerprint` (one hash per
  * doc) cannot give: a POSITION-ROBUST fingerprint SET whose guarantee is
  * that any shared run of ≥ w+2 tokens between two documents produces at
  * least one shared fingerprint, while keeping density ≈ 2/(w+1) of all
  * shingles. Used at corpus scale for plagiarism/near-copy detection where
  * minhash's whole-document Jaccard is too coarse.
  *
  * Formulation: 3-gram shingle rolling hashes (the engine-portable base-31
  * family — `MinhashPortable` precedent), each window of w consecutive
  * hashes selects its minimum, ties broken by position via encoding the
  * pair into one BIGINT `h·2²¹ + pos` (h < 2³⁰ ⇒ the encoding fits 2⁵¹;
  * per-doc shingle positions are capped at 2²¹ — chunk longer docs first).
  * That makes "select window minimum with deterministic tie-break" a plain
  * windowed MIN + DISTINCT, which both engines evaluate identically —
  * an oracle-checkable fingerprint set.
  *
  * Scale shape: the kernel is a narrow zero-shuffle pass; the window is
  * partitioned by doc_id (never global), so the one shuffle is the per-doc
  * sort — parallel across documents, sequential only within one.
  */
object Winnow {

  val Mod = 1000000007L
  val PosBits = 21

  def winnowFingerprint(documents: DataFrame, w: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val hashes = documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val toks = text.trim.split("\\s+")
        (0 until toks.length - 2).iterator.map { i =>
          val s = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
          var h = 0L
          var j = 0
          while (j < s.length) { h = (h * 31L + s.charAt(j)) % Mod; j += 1 }
          (docId, i.toLong, h)
        }
      }
      .toDF("doc_id", "pos", "h")
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    hashes
      .withColumn("comb", min(shiftleft(col("h"), PosBits) + col("pos")).over(win))
      .filter(col("pos") >= w - 1) // full windows only
      .select(col("doc_id"), col("comb")).distinct()
      .select(
        col("doc_id"),
        shiftright(col("comb"), PosBits).as("fp_hash"),
        col("comb").bitwiseAND(lit((1L << PosBits) - 1)).as("fp_pos"))
  }

  def winnowFingerprintSql(w: Int = 4): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(range(1, len(t) - 1)) AS i, t
       |  FROM tk WHERE len(t) >= 3),
       |hx AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(t[i] || ' ' || t[i+1] || ' ' || t[i+2], ''),
       |          x -> CAST(ord(x) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % $Mod) AS h
       |  FROM sh),
       |win AS (
       |  SELECT doc_id, pos,
       |    MIN(h * ${1L << PosBits} + pos) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS comb
       |  FROM hx),
       |fp AS (SELECT DISTINCT doc_id, comb FROM win WHERE pos >= ${w - 1})
       |SELECT doc_id, comb // ${1L << PosBits} AS fp_hash,
       |  comb % ${1L << PosBits} AS fp_pos
       |FROM fp""".stripMargin

  /** Cross-document fingerprint MATCHING — the second half of MOSS:
    * documents sharing winnowed fingerprints are plagiarism/reuse
    * suspects, and the shared-fingerprint count approximates the length
    * of the copied region. Pairs materialize only through equal hashes
    * (inverted-index join over the sparse fingerprint table — winnowing
    * already thinned shingles ~w-fold), so cost follows true reuse, not
    * corpus². */
  def winnowMatches(documents: DataFrame, w: Int = 4, minShared: Int = 2): DataFrame = {
    val fp = winnowFingerprint(documents, w)
      .select(col("doc_id"), col("fp_hash")).distinct()
    fp.as("a").join(fp.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def winnowMatchesSql(w: Int = 4, minShared: Int = 2): String =
    s"""WITH f AS MATERIALIZED (${winnowFingerprintSql(w)}),
       |fpp AS (SELECT DISTINCT doc_id, fp_hash FROM f)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |FROM fpp a JOIN fpp b
       |  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= $minShared""".stripMargin
}
