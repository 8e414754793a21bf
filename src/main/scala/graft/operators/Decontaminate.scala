package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents sharing word n-grams
  * with a held-out evaluation set (the PaLM/GPT-3 style contamination
  * check every serious pretraining pipeline runs before training).
  *
  * Plan shape at 100 TB: the eval set's distinct n-gram hashes are SMALL
  * (benchmarks are a few MB, ~1e6 n-grams) — they broadcast to every
  * executor, so the training corpus is flagged in ONE narrow scan + hash
  * probe with a per-doc aggregate; the corpus never shuffles its text.
  * Joining on md5(shingle) keeps the probe key 16 bytes and the same hash is
  * portable to the DuckDB oracle (production would use xxhash64).
  *
  * The test corpus stands in for both sides: docs with doc_id % evalMod == 0
  * play the benchmark, the rest the training corpus.
  */
object Decontaminate {

  def decontaminate(documents: DataFrame, w: Int = 3, evalMod: Int = 29): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // typed kernel for shingling — Catalyst HOFs (transform/array_distinct)
    // are CodegenFallback and interpret per element, which dominated this
    // query's wall time; same precedent as the MinHash kernels in Dedup.
    // The eval/train split happens BEFORE the kernel: a filter cannot push
    // below an opaque mapPartitions, so filtering after would shingle the
    // whole corpus twice.
    def shingled(df: DataFrame) = df.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(iter => iter.flatMap { case (id, t) =>
        Dedup.shinglesOf(t, w).iterator.map(s => (id, s))
      })
      .toDF("doc_id", "shingle")
    val eval = shingled(documents.filter(col("doc_id") % evalMod === 0))
      .select(md5(col("shingle")).as("h"), col("doc_id").as("eval_id"))
      .distinct()
    val train = shingled(documents.filter(col("doc_id") % evalMod =!= 0))
      .select(col("doc_id"), md5(col("shingle")).as("h"))
    train.join(broadcast(eval), "h")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("h")).as("n_hit_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  def decontaminateSql(w: Int = 3, evalMod: Int = 29): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSqlFromToks("t", w)}) AS shingle FROM tk),
       |ev AS (
       |  SELECT DISTINCT md5(shingle) AS h, doc_id AS eval_id FROM sh WHERE doc_id % $evalMod = 0),
       |tr AS (
       |  SELECT doc_id, md5(shingle) AS h FROM sh WHERE doc_id % $evalMod <> 0)
       |SELECT doc_id,
       |  CAST(COUNT(DISTINCT h) AS BIGINT) AS n_hit_ngrams,
       |  CAST(COUNT(DISTINCT eval_id) AS BIGINT) AS n_eval_docs
       |FROM tr JOIN ev USING (h)
       |GROUP BY doc_id""".stripMargin
}
