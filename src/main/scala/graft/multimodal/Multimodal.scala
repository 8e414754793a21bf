package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, with batch-shaped per-partition feature extraction — the
  * `mapInPandas` shape, JVM-native via mapPartitions.
  *
  * The actual media decode (JPEG/PNG/audio codecs) is STUBBED — no media
  * libraries ship in this container. `decodeStub` produces a deterministic
  * fake so the Spark-side plumbing (schema, partitioning, batch iteration,
  * column contracts) is real and testable; swap `decodeStub` for a codec
  * call in production.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata struct to each document —
    * the ingest shape for an image/audio corpus (payload would come from
    * `spark.read.format("binaryFile")` at scale). */
  def withPayload(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", encode(col("text"), "UTF-8").cast(BinaryType))
      .withColumn("media_meta", struct(
        lit("image/fake").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (pmod(crc32(encode(col("text"), "UTF-8")), lit(1920L)) + 1L).as("width"),
        (pmod(crc32(encode(col("text"), "UTF-8")) * 31L, lit(1080L)) + 1L).as("height")))

  /** Deterministic fake decode: byte histogram moments standing in for
    * pixel statistics. Replace with a real codec in production.
    * (Marked stub per the build contract — the plumbing around it is real.) */
  private def decodeStub(payload: Array[Byte]): (Double, Double, Long) = {
    if (payload == null || payload.isEmpty) return (0.0, 0.0, 0L)
    var sum = 0L
    var sumSq = 0L
    payload.foreach { b => val v = (b & 0xFF).toLong; sum += v; sumSq += v * v }
    val n = payload.length.toDouble
    val mean = sum / n
    (mean, sumSq / n - mean * mean, payload.length.toLong)
  }

  /** Metadata projection — pure column ops, partition-preserving. */
  def metadata(documents: DataFrame): DataFrame =
    withPayload(documents).select(
      col("doc_id"),
      col("media_meta.mime").as("mime"),
      col("media_meta.n_bytes").as("n_bytes"),
      col("media_meta.width").as("width"),
      col("media_meta.height").as("height"))

  /** Batch feature extraction over payload partitions: iterate each
    * partition once, decode per row, emit a feature row. This is exactly
    * the mapInPandas batch contract (iterator-of-batches in, iterator out)
    * — swap decodeStub for the real codec and the plan is unchanged. */
  def batchFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, payload) =>
          val (mean, variance, n) = decodeStub(payload)
          (docId, mean, variance, n)
        }
      }
      .toDF("doc_id", "byte_mean", "byte_var", "n_bytes")
  }
}
