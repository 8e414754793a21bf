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
    val withLocal = sliced.as[(Long, Long, Long)].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var cum = 0L
        it.map { case (id, sc, nc) => cum += nc; (pid, id, sc, cum) }
      }
      .toDF("pid", "doc_id", "score", "local_cum")
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
}
