package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Containment near-dup detection — |A∩B| / |A| over word shingles.
  *
  * Jaccard misses the "small doc embedded in a big doc" case by design: a
  * 100-word doc fully contained in a 10 000-word doc has Jaccard ≈ 0.01 but
  * containment 1.0. That asymmetry is why quote/subset duplication (licence
  * headers, quoted articles, copy-pasted sections) needs its own operator
  * (cf. reference chunk/dedup surface, transformers.py:137's overlap
  * machinery; same shingle model as Dedup.ngramJaccard).
  *
  * Scale shape: the (lang, length-bucket) blocking Jaccard uses is WRONG
  * here — containment pairs have wildly different lengths, so blocking by
  * length would hide exactly the pairs the operator exists to find. Instead
  * the scale lever is a document-frequency cap on the inverted index:
  * shingles appearing in more than maxDf docs (boilerplate phrases) are
  * dropped from the index before the pair join, so join fan-out per shingle
  * is ≤ maxDf² and total cost is driven by true rare-shingle overlap, never
  * block-size². Containment is then measured over each doc's RARE shingles
  * (the discriminative ones) — the standard trick of DF-pruned inverted
  * indexes. One narrow shingle pass + two hash-groupBy shuffles + one
  * equi-join: survives 100 TB.
  */
object Containment {

  /** Pairs (doc_a < doc_b) whose rare-shingle containment (either
    * direction) reaches `threshold`. Emits both directional containments
    * as IEEE-exact doubles (single division — bit-identical across
    * engines). */
  def containmentPairs(documents: DataFrame, w: Int = 3, threshold: Double = 0.8,
                       maxDf: Int = 50): DataFrame = {
    require(w > 0 && maxDf > 0 && threshold > 0.0, s"bad params w=$w maxDf=$maxDf threshold=$threshold")
    val spark = documents.sparkSession
    import spark.implicits._
    val sh = documents.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, lang, text) =>
          Dedup.shinglesOf(text, w).map(s => (docId, lang, Dedup.hashShingle(s)))
        }
      }
      .toDF("doc_id", "lang", "s")
    val df = sh.groupBy(col("lang"), col("s"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("lang"), col("s"))
    val rare = sh.join(df, Seq("lang", "s"))
    val n = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = rare.as("a").join(rare.as("b"),
        col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(n.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(n.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("cont_a", col("c").cast("double") / col("na").cast("double"))
      .withColumn("cont_b", col("c").cast("double") / col("nb").cast("double"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select(col("doc_a"), col("doc_b"), col("cont_a"), col("cont_b"))
  }

  /** DuckDB replay: identical DF-capped inverted index over raw shingle
    * strings (Spark joins on 64-bit shingle hashes — counts agree unless
    * two distinct shingles of one doc collide, odds ≈ n²/2⁶⁵; the
    * ngramJaccard oracle set the precedent). */
  def containmentPairsSql(w: Int = 3, threshold: Double = 0.8, maxDf: Int = 50): String =
    s"""WITH tk AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, lang, ${Dedup.shinglesSqlFromToks("t", w)} AS sh FROM tk),
       |ex AS (SELECT doc_id, lang, unnest(sh) AS s FROM sh),
       |rare AS (
       |  SELECT ex.doc_id, ex.lang, ex.s FROM ex
       |  JOIN (SELECT lang, s FROM ex GROUP BY 1, 2 HAVING COUNT(*) <= $maxDf) d
       |    ON ex.lang = d.lang AND ex.s = d.s),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY 1),
       |pr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |  FROM rare a JOIN rare b
       |    ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       CAST(c AS DOUBLE) / CAST(na.n AS DOUBLE) AS cont_a,
       |       CAST(c AS DOUBLE) / CAST(nb.n AS DOUBLE) AS cont_b
       |FROM pr
       |JOIN n na ON pr.doc_a = na.doc_id
       |JOIN n nb ON pr.doc_b = nb.doc_id
       |WHERE GREATEST(CAST(c AS DOUBLE) / CAST(na.n AS DOUBLE),
       |               CAST(c AS DOUBLE) / CAST(nb.n AS DOUBLE)) >= $threshold""".stripMargin
}
