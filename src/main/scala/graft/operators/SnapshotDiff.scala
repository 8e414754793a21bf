package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data-capture primitive of every recurring
  * ingestion pipeline (re-crawls, dataset refreshes): full-outer join two
  * corpus snapshots on the document key, classify each row as
  * added / removed / changed by content hash, and emit only the delta.
  *
  * Scale shape: ONE shuffle, keyed by doc_id on both sides (at 100 TB both
  * snapshots are stored partitioned/bucketed by that key, making the join
  * co-located and shuffle-free); hashes are computed in the scan, so the
  * join carries 16-byte digests, never document bodies.
  *
  * The test corpus stands in for both snapshots deterministically:
  * OLD = docs with doc_id % 5 != 4, NEW = docs with doc_id % 3 != 2 and
  * text suffixed ' v2' when doc_id % 7 == 0 (a simulated re-crawl edit).
  */
object SnapshotDiff {

  def snapshotDiff(documents: DataFrame): DataFrame = {
    val old = documents.filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), md5(col("text")).as("old_hash"))
    val neu = documents.filter(col("doc_id") % 3 =!= 2)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("new_hash"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"), col("old_hash"), col("new_hash"))
  }

  val snapshotDiffSql: String =
    """WITH old AS (
      |  SELECT doc_id, md5(text) AS old_hash FROM documents WHERE doc_id % 5 <> 4),
      |neu AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS new_hash
      |  FROM documents WHERE doc_id % 3 <> 2),
      |d AS (
      |  SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id, old_hash, new_hash,
      |    CASE WHEN old_hash IS NULL THEN 'added'
      |         WHEN new_hash IS NULL THEN 'removed'
      |         WHEN old_hash <> new_hash THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id)
      |SELECT doc_id, status, old_hash, new_hash FROM d WHERE status <> 'unchanged'""".stripMargin
}
