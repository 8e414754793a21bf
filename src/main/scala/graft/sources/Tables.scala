package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the test corpus (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader
  * boundary is the single place a deployment would swap in its own catalog.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.parquet has shipped with several physical encodings of `ts`
    * (TIMESTAMP(NANOS) read as long via nanosAsLong, timestamp[us] read as
    * TIMESTAMP_NTZ, plain TIMESTAMP). Downstream operators assume session-tz
    * TimestampType, so adapt on the loaded schema rather than hardcoding one
    * encoding — DuckDB's oracle reads the same file natively, so values agree
    * in every case. The NTZ→session-TZ cast does NOT block predicate
    * pushdown: under the UTC session Catalyst rewrites ts filters through
    * the cast onto the NTZ scan column (verified: PushedFilters carries the
    * range predicate on the timestamp_ntz ReadSchema). */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    val adapted = df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
    require(adapted.schema("ts").dataType == TimestampType,
      s"events loader must yield ts: TimestampType, got ${adapted.schema("ts").dataType}")
    adapted
  }
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
