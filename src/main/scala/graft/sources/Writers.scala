package graft.sources

import org.apache.spark.sql.DataFrame

/** Store step of the ingestion pipeline (services/pipeline/storers.py) —
  * in the reference chunks+embeddings land in Neo4j; here they land as
  * partitioned, compacted parquet: the lakehouse encoding that scales to
  * 100 TB and that every downstream graft operator reads.
  */
object Writers {

  /** Write a chunk/embedding table partitioned by a low-cardinality key.
    * `targetFileRows` compacts tiny tasks into sane file counts (small-file
    * problem is the #1 operational failure of big ingestion jobs). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       targetFileRows: Long = 1000000L): Unit = {
    val n = math.max(1, math.min(df.sparkSession.sparkContext.defaultParallelism,
      (df.count() / targetFileRows + 1).toInt))
    df.repartition(n, org.apache.spark.sql.functions.col(partitionCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)
  }

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
