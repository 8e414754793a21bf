package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch CDC apply — the set-based re-expression of the reference's node
  * CRUD surface (graph_service.py `create_node` / `batch_create_nodes` /
  * `delete_node`; knowledge_service update paths): instead of one Cypher
  * round-trip per mutation, a day's operations log is applied to the base
  * table in ONE full-outer hash join keyed by the node id — MERGE INTO
  * semantics (insert / update / delete / keep), the lakehouse upsert shape
  * that scales to billions of rows because both sides shuffle (or are
  * bucket-co-located) on the same key exactly once.
  *
  * The test corpus stands in deterministically: BASE = docs with
  * doc_id % 2 == 0 (payload = md5(text)); OPS = upsert for doc_id % 5 == 0
  * (payload = md5(text || ' v2')), delete for doc_id % 5 == 1. Emits the
  * post-merge table with the action each row took (deletes vanish).
  */
object CdcApply {

  def cdcApply(documents: DataFrame): DataFrame = {
    val base = documents.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), md5(col("text")).as("payload"))
    val ops = documents
      .filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 1)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, "upsert").otherwise("delete").as("op"),
        when(col("doc_id") % 5 === 0, md5(concat(col("text"), lit(" v2")))).as("new_payload"))
    base.join(ops, Seq("doc_id"), "full_outer")
      .withColumn("action",
        when(col("op") === "delete" && col("payload").isNotNull, "deleted")
          .when(col("op") === "upsert" && col("payload").isNull, "inserted")
          .when(col("op") === "upsert", "updated")
          .when(col("op").isNull && col("payload").isNotNull, "kept"))
      // a delete for an absent key is a no-op (action null) and deleted
      // rows leave the table; everything else survives the merge
      .filter(col("action").isNotNull && col("action") =!= "deleted")
      .select(col("doc_id"),
        coalesce(col("new_payload"), col("payload")).as("payload"),
        col("action"))
  }

  val cdcApplySql: String =
    """WITH base AS (
      |  SELECT doc_id, md5(text) AS payload FROM documents WHERE doc_id % 2 = 0),
      |ops AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN 'upsert' ELSE 'delete' END AS op,
      |    CASE WHEN doc_id % 5 = 0 THEN md5(text || ' v2') END AS new_payload
      |  FROM documents WHERE doc_id % 5 = 0 OR doc_id % 5 = 1),
      |m AS (
      |  SELECT COALESCE(base.doc_id, ops.doc_id) AS doc_id, payload, op, new_payload,
      |    CASE WHEN op = 'delete' AND payload IS NOT NULL THEN 'deleted'
      |         WHEN op = 'upsert' AND payload IS NULL THEN 'inserted'
      |         WHEN op = 'upsert' THEN 'updated'
      |         WHEN op IS NULL AND payload IS NOT NULL THEN 'kept' END AS action
      |  FROM base FULL OUTER JOIN ops ON base.doc_id = ops.doc_id)
      |SELECT doc_id, COALESCE(new_payload, payload) AS payload, action
      |FROM m WHERE action IS NOT NULL AND action <> 'deleted'""".stripMargin
}
