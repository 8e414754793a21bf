package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-pack building (services/code/pack_builder.py): rank candidates by
  * relevance, then take greedily under a character budget.
  *
  * The budget cut is a global running sum over the ranked order — the naive
  * expression (`Window.orderBy` with no partitionBy) funnels every scored
  * row through ONE reducer. Instead this is a two-phase distributed prefix
  * sum:
  *
  *   1. `repartitionByRange` on the pack order, so partition i holds a
  *      contiguous slice of the global ranking; prefix-sum each slice
  *      locally (narrow, order-preserving mapPartitions — no second
  *      shuffle, and the slice totals fall out as `max(local_cum)`).
  *   2. Per-slice totals (exactly numPartitions rows) → cumulative offsets
  *      via a window over that BOUNDED table; broadcast the offsets back
  *      and add. The only unpartitioned window in the plan runs over
  *      `numShufflePartitions` rows, never over the corpus.
  */
object PackBuilder {

  private def occ(term: String) =
    ((length(col("text")) - length(regexp_replace(col("text"), java.util.regex.Pattern.quote(term), ""))) / term.length).cast("long")

  def pack(documents: DataFrame, terms: Seq[String], budgetChars: Long = 4000L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val kw = terms.map(occ).reduce(_ + _)
    val nParts = spark.sessionState.conf.numShufflePartitions
    val sliced = documents
      .withColumn("score", kw)
      .filter(col("score") > 0)
      .select(col("doc_id").cast("long"), col("score"), col("n_chars").cast("long"))
      .repartitionByRange(nParts, desc("score"), col("doc_id"))
      .sortWithinPartitions(desc("score"), col("doc_id"))
    // RDD mapPartitionsWithIndex, NOT TaskContext.getPartitionId(): the
    // task id is wrong under downstream coalesce (several slices execute
    // in one task and would all report the same pid); the split index is
    // the true slice id regardless of task placement. Both downstream
    // branches also share this one shuffle instead of re-exchanging.
    // persisted because BOTH downstream branches (slice totals + final join)
    // read it: without the persist each branch re-runs the range exchange
    // lineage (measured 2× warm cost at sf0.1). At cluster scale the same
    // two reads happen either way; MEMORY_AND_DISK trades executor storage
    // for not recomputing the scan+score.
    val withLocal = sliced.as[(Long, Long, Long)].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var cum = 0L
        it.map { case (id, sc, nc) => cum += nc; (pid, id, sc, cum) }
      }
      .toDF("pid", "doc_id", "score", "local_cum")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val off = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(col("pid"))
      .agg(max(col("local_cum")).as("slice_total"))
      .withColumn("offset", coalesce(sum(col("slice_total")).over(off), lit(0L)))
      .select(col("pid"), col("offset"))
    withLocal.join(broadcast(offsets), Seq("pid"))
      .withColumn("cum_chars", col("local_cum") + col("offset"))
      .filter(col("cum_chars") <= budgetChars)
      .select(col("doc_id"), col("score"), col("cum_chars"))
  }

  def packSql(terms: Seq[String], budgetChars: Long = 4000L): String = {
    val kw = terms
      .map(t => s"CAST((length(text) - length(replace(text, '$t', '')))/${t.length} AS BIGINT)")
      .mkString(" + ")
    s"""WITH scored AS (
       |  SELECT doc_id, n_chars, $kw AS score FROM documents WHERE ($kw) > 0),
       |c AS (
       |  SELECT doc_id, score,
       |    CAST(SUM(n_chars) OVER (ORDER BY score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
       |  FROM scored)
       |SELECT doc_id, score, cum_chars FROM c WHERE cum_chars <= $budgetChars""".stripMargin
  }

  /** Sequence packing — the GPT-style concat-and-chunk step that turns a
    * curated corpus into fixed-token training sequences: within a shard,
    * documents are concatenated in a deterministic order and cut every
    * `maxTokens`; each doc learns its sequence id and offset.
    *
    * Scale shape: packing is SHARD-LOCAL by construction (shard =
    * hash-mod of doc_id), so the running sum is a window partitioned by
    * (lang, shard) — bounded partitions, embarrassingly parallel, and no
    * global ordering anywhere. One shuffle. At 100 TB the shard count
    * scales with the corpus and each training file is one shard's output.
    */
  def seqPack(documents: DataFrame, maxTokens: Int = 512, nShards: Int = 8): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"), nTok.as("n_tok"))
      .withColumn("prior_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tok"),
        expr(s"prior_tok div $maxTokens").as("seq_id"),
        pmod(col("prior_tok"), lit(maxTokens.toLong)).as("seq_offset"))
  }

  def seqPackSql(maxTokens: Int = 512, nShards: Int = 8): String =
    s"""WITH f AS (
       |  SELECT doc_id, lang, doc_id % $nShards AS shard,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, shard, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior_tok
       |  FROM f)
       |SELECT doc_id, lang, shard, n_tok,
       |  CAST(prior_tok // $maxTokens AS BIGINT) AS seq_id,
       |  CAST(prior_tok % $maxTokens AS BIGINT) AS seq_offset
       |FROM c""".stripMargin
}
