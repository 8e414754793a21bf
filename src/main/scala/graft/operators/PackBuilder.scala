package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-pack building (services/code/pack_builder.py): rank candidates by
  * relevance, then take greedily under a character budget — expressed as a
  * running-sum window over the ranked order (one shuffle; the budget cut is
  * a filter, not a driver loop).
  */
object PackBuilder {

  private def occ(term: String) =
    ((length(col("text")) - length(regexp_replace(col("text"), java.util.regex.Pattern.quote(term), ""))) / term.length).cast("long")

  def pack(documents: DataFrame, terms: Seq[String], budgetChars: Long = 4000L): DataFrame = {
    val kw = terms.map(occ).reduce(_ + _)
    val w = Window.orderBy(desc("score"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .withColumn("score", kw)
      .filter(col("score") > 0)
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
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
