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

  /** SCD2 history build — the other half of the lakehouse upsert story:
    * instead of merging to the latest state (cdcApply), keep every version
    * with its validity interval. The change stream is each user's event_type
    * transitions (events where the value differs from the previous one);
    * versions get [valid_from, valid_to) from the change ts and the NEXT
    * change's ts (lead), is_current marks the open interval.
    *
    * All windows are partitioned by user_id — per-key history, never a
    * global sort, so the build is one shuffle on the natural key at any
    * scale. Ordering/comparison uses microsecond longs on both engines
    * (Spark's events ts is nanos truncated to micros; DuckDB keeps nanos —
    * epoch_us/unix_micros reconcile them bit-exactly). */
  def scd2(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
    val changes = events
      .withColumn("tsu", unix_micros(col("ts")))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("next_tsu", lead(col("tsu"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type").as("value"),
        date_format(timestamp_micros(col("tsu")), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(timestamp_micros(col("next_tsu")), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("next_tsu").isNull.as("is_current"))
  }

  val scd2Sql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
      |v AS (
      |  SELECT user_id, tsu, event_type,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS BIGINT) AS version,
      |    LEAD(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS next_tsu
      |  FROM c)
      |SELECT user_id, version, event_type AS value,
      |  strftime(make_timestamp(tsu), '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(make_timestamp(next_tsu), '%Y-%m-%d %H:%M:%S') AS valid_to,
      |  next_tsu IS NULL AS is_current
      |FROM v""".stripMargin
}
