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

  /** DuckDB's `md5_number_lower(s)`: the LAST 8 digest bytes read
    * little-endian, rebuilt here from Spark's hex md5 by reversing the
    * byte pairs of chars 17..32 and conv'ing base 16 (conv is unsigned
    * 64-bit, so the value lands intact in DECIMAL(20,0)). This is the
    * engine-portable 64-bit content hash the multimodal metadata uses —
    * it is what upgraded mm_meta/mm_frames/mm_resize from rows-only to
    * hash-oracle-checked. */
  private def md5NumLower(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = md5(bin)
    val le = concat((0 until 8).reverse.map(i => substring(h, 17 + 2 * i, 2)): _*)
    conv(le, 16, 10).cast("decimal(20,0)")
  }

  /** DuckDB's `md5_number_upper(s)`: first 8 digest bytes little-endian. */
  private def md5NumUpper(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = md5(bin)
    val le = concat((0 until 8).reverse.map(i => substring(h, 1 + 2 * i, 2)): _*)
    conv(le, 16, 10).cast("decimal(20,0)")
  }

  /** Attach a binary payload + typed metadata struct to each document —
    * the ingest shape for an image/audio corpus (payload would come from
    * `spark.read.format("binaryFile")` at scale). Width/height are
    * deterministic md5-derived stand-ins for decoded dimensions. */
  def withPayload(documents: DataFrame): DataFrame = {
    val enc = encode(col("text"), "UTF-8")
    documents
      .withColumn("payload", enc.cast(BinaryType))
      .withColumn("media_meta", struct(
        lit("image/fake").as("mime"),
        octet_length(enc).cast("long").as("n_bytes"),
        ((md5NumLower(enc) % 1920) + 1).cast("long").as("width"),
        ((md5NumUpper(enc) % 1080) + 1).cast("long").as("height")))
  }

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
    * column (same convention as embed_docs/minhash_signature). Registered
    * at 16×16 so the byte-budget (256) sits BELOW the corpus doc sizes
    * (44..577 bytes) and the stride-subsample path actually executes —
    * at the old 64×64 every doc fit the budget and the digest column
    * verified nothing. */
  def resizeDigest(documents: DataFrame, targetW: Int = 16, targetH: Int = 16): DataFrame =
    resizeBatch(documents, targetW, targetH)
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

  // ---- DuckDB oracles. The corpus is pure ASCII (verified: octet_length
  //      == length for every doc), so payload bytes == text chars and the
  //      oracle can replay byte slicing/hashing with string functions;
  //      md5_number_lower/upper are DuckDB builtins matched bit-for-bit by
  //      the conv-based Spark helpers above. ----

  val metadataSql: String =
    """SELECT doc_id, 'image/fake' AS mime,
      |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |CAST(md5_number_lower(text) % 1920 + 1 AS BIGINT) AS width,
      |CAST(md5_number_upper(text) % 1080 + 1 AS BIGINT) AS height
      |FROM documents""".stripMargin

  val batchFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |    list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS codes
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, nb,
      |    CAST(list_sum(codes) AS BIGINT) AS s1,
      |    CAST(list_sum(list_transform(codes, v -> v * v)) AS BIGINT) AS s2
      |  FROM b)
      |SELECT doc_id,
      |  CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE) AS byte_mean,
      |  CAST(s2 AS DOUBLE) / CAST(nb AS DOUBLE)
      |    - (CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE))
      |    AS byte_var,
      |  nb AS n_bytes
      |FROM s""".stripMargin

  def frameSampleSql(frameBytes: Int = 256, every: Int = 4): String =
    s"""WITH p AS (
       |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
       |f AS (
       |  SELECT doc_id, text,
       |    unnest(range(0, GREATEST(CAST(ceil(CAST(nb AS DOUBLE) / $frameBytes.0) AS BIGINT), 1)))
       |      AS frame_index
       |  FROM p)
       |SELECT doc_id, CAST(frame_index AS BIGINT) AS frame_index,
       |  md5(substr(text, CAST(frame_index * $frameBytes + 1 AS BIGINT), $frameBytes)) AS frame_digest,
       |  CAST(octet_length(encode(substr(text, CAST(frame_index * $frameBytes + 1 AS BIGINT), $frameBytes)))
       |    AS BIGINT) AS frame_bytes
       |FROM f WHERE frame_index % $every = 0""".stripMargin

  def resizeDigestSql(targetW: Int = 16, targetH: Int = 16): String = {
    val budget = targetW * targetH
    s"""WITH p AS (
       |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
       |r AS (
       |  SELECT doc_id, nb,
       |    CASE WHEN nb <= $budget THEN text
       |         ELSE array_to_string(list_transform(range(0, $budget),
       |           i -> substr(text,
       |             CAST(LEAST(CAST(TRUNC(CAST(i AS DOUBLE) * (CAST(nb AS DOUBLE) / $budget.0))
       |               AS BIGINT), nb - 1) AS BIGINT) + 1, 1)), '')
       |    END AS rp
       |  FROM p)
       |SELECT doc_id, CAST($targetW AS BIGINT) AS width, CAST($targetH AS BIGINT) AS height,
       |  CAST(octet_length(encode(rp)) AS BIGINT) AS n_bytes, md5(rp) AS payload_digest
       |FROM r""".stripMargin
  }
}
