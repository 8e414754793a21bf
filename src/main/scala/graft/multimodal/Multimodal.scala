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

  /** Frame sampling — the video-ingest shape: one payload row explodes
    * into every `every`-th fixed-span frame. Fully declarative (sequence +
    * explode + binary substring, all codegen'd); a real codec would only
    * replace the slicing with keyframe offsets. rows-only: DuckDB cannot
    * slice blobs, so the spec carries verification (boundaries, stride,
    * reconstruction). */
  def frameSample(documents: DataFrame, frameBytes: Int = 256, every: Int = 4): DataFrame =
    withPayload(documents)
      .withColumn("n_frames",
        greatest(ceil(col("media_meta.n_bytes") / lit(frameBytes.toDouble)).cast("long"), lit(1L)))
      .withColumn("frame_index", explode(sequence(lit(0L), col("n_frames") - 1)))
      .filter(pmod(col("frame_index"), lit(every.toLong)) === 0)
      .select(col("doc_id"), col("frame_index"),
        expr(s"substring(payload, CAST(frame_index*$frameBytes + 1 AS INT), $frameBytes)")
          .as("frame"))
      .select(col("doc_id"), col("frame_index"),
        md5(col("frame")).as("frame_digest"),
        octet_length(col("frame")).cast("long").as("frame_bytes"))

  /** Resize — deterministic fake: stride-subsample the payload bytes to a
    * target "pixel" budget and update the metadata, preserving the
    * binary-in/binary-out contract a real resampler would have. Batch
    * kernel shape (mapPartitions = the mapInPandas contract). */
  def resizeBatch(documents: DataFrame, targetW: Int = 64, targetH: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val budget = targetW * targetH
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, payload) =>
          val n = if (payload == null) 0 else payload.length
          val out =
            if (n <= budget) payload
            else {
              val stride = n.toDouble / budget
              Array.tabulate(budget)(i => payload((i * stride).toInt.min(n - 1)))
            }
          (docId, targetW.toLong, targetH.toLong, out.length.toLong, out)
        }
      }
      .toDF("doc_id", "width", "height", "n_bytes", "payload")
  }

  /** Harness-facing resize view: scalar digest instead of the raw binary
    * column (same convention as embed_docs/minhash_signature). */
  def resizeDigest(documents: DataFrame): DataFrame =
    resizeBatch(documents)
      .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
        md5(col("payload")).as("payload_digest"))

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
