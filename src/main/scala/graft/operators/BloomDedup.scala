package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter incremental dedup — the standard pattern for deduplicating
  * a NEW ingestion batch against an already-indexed corpus without joining
  * the full corpus: build a Bloom filter over the existing side's segment
  * hashes (one aggregate, O(bits) driver memory), broadcast it, pre-filter
  * the incoming side to probable hits (a narrow scan that discards the
  * vast clean majority), and exact-verify only the survivors with a join.
  * False positives die in the verify join; false negatives are impossible —
  * so the OUTPUT is exactly the true overlap report and the filter is
  * purely a cost lever (at 100 TB it turns a corpus-sized shuffle into a
  * survivors-sized one).
  *
  * Segments are the same span-token blocks as line_dedup; EXISTING = docs
  * with doc_id % 2 == 0, INCOMING = the rest. Emits, per incoming doc with
  * any overlap, the count of distinct shared segments.
  */
object BloomDedup {

  def bloomDedup(documents: DataFrame, span: Int = 3,
                 expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val t = split(trim(col("text")), "\\s+")
    def blocks(df: DataFrame) = df
      .select(col("doc_id"), explode(Normalize.tokenBlocks(t, span)).as("block"))
    val existing = blocks(documents.filter(col("doc_id") % 2 === 0))
      .select(col("block")).distinct()
    val incoming = blocks(documents.filter(col("doc_id") % 2 =!= 0))
    // the cost lever: bloom over the existing side's segments (driver-side
    // sketch, broadcast in the closure), pre-filtering incoming rows
    val bloom = existing.stat.bloomFilter("block", expectedItems, fpp)
    val bBloom = spark.sparkContext.broadcast(bloom)
    val probable = incoming.as[(Long, String)]
      .filter(r => bBloom.value.mightContainString(r._2))
      .toDF("doc_id", "block")
    // exact verification: false positives drop out here, so the result is
    // identical to the bloom-free join (which is what the oracle runs)
    probable.join(existing, Seq("block"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("block")).as("n_shared_blocks"))
  }

  def bloomDedupSql(span: Int = 3): String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |bl AS (
       |  SELECT doc_id, unnest(${Normalize.tokenBlocksSql("t", span)}) AS block FROM tk),
       |existing AS (SELECT DISTINCT block FROM bl WHERE doc_id % 2 = 0),
       |incoming AS (SELECT doc_id, block FROM bl WHERE doc_id % 2 <> 0)
       |SELECT i.doc_id, CAST(COUNT(DISTINCT i.block) AS BIGINT) AS n_shared_blocks
       |FROM incoming i JOIN existing e ON i.block = e.block
       |GROUP BY i.doc_id""".stripMargin
}
