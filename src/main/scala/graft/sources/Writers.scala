package graft.sources

import org.apache.spark.sql.DataFrame

/** Store step of the ingestion pipeline (services/pipeline/storers.py) —
  * in the reference chunks+embeddings land in Neo4j; here they land as
  * partitioned, compacted parquet: the lakehouse encoding that scales to
  * 100 TB and that every downstream graft operator reads.
  */
object Writers {

  /** Write a chunk/embedding table partitioned by a low-cardinality key,
    * compacted to sane file counts (the small-file problem is the #1
    * operational failure of big ingestion jobs). The REBALANCE hint lets
    * AQE size the output partitions from the runtime shuffle statistics —
    * one pass over the data, vs the count()+repartition two-pass. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.hint("rebalance", org.apache.spark.sql.functions.col(partitionCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Append-mode variant for incremental ingestion batches. */
  def appendBatch(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("append").partitionBy(partitionCol).parquet(path)

  /** Bucketed catalog table: pre-hash-partition + sort by the join key at
    * write time so every later equi-join/aggregation on that key runs with
    * ZERO shuffle (co-located, sort-merge without exchange). The right
    * answer for fact tables joined repeatedly on the same key at 100 TB —
    * pay the shuffle once at ingest, never again. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
