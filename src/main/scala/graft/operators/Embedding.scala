package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Batch embedding generation — the Spark-native re-expression of the
  * reference's embedding pipeline (services/pipeline/embeddings.py): in the
  * reference every chunk goes through an embedding model; here the model
  * call is replaced by a deterministic hashed-feature projection (the
  * "feature hashing" / fasttext-style bag-of-hashed-ngrams trick) so the
  * pipeline shape — narrow per-row transform, no shuffle, embarrassingly
  * parallel — is real and benchmarkable. Swap `embedKernel` for an ONNX/JNI
  * model call in production; the plan is unchanged.
  */
object Embedding {

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def hashTok(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    splitmix64(h)
  }

  /** Deterministic hashed-feature embedding: each token adds ±1 to the
    * dimension its hash selects; L2-normalized. */
  def embedKernel(text: String, dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    text.trim.split("\\s+").foreach { t =>
      val h = hashTok(t)
      val j = java.lang.Math.floorMod(h, dim)
      val sign = if (((h >>> 32) & 1L) == 1L) 1.0 else -1.0
      acc(j) += sign
    }
    var norm = 0.0
    acc.foreach(v => norm += v * v)
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    acc.map(v => (v * inv).toFloat)
  }

  /** Embed a (id, text) column pair — narrow mapPartitions, zero shuffle. */
  def embed(df: DataFrame, idCol: String, textCol: String, dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(iter => iter.map { case (id, text) => (id, embedKernel(text, dim)) })
      .toDF("id", "embedding")
  }

  /** Harness-facing embedding view: raw `array<float>` vectors are for
    * pipeline use; the driver's comparator needs scalar columns, so the
    * registered query emits a 64-bit digest per vector (bit-exact — any
    * kernel change flips it). */
  def embedDigest(documents: DataFrame, dim: Int = 64): DataFrame =
    embed(documents, "doc_id", "text", dim)
      .select(col("id").as("doc_id"), xxhash64(col("embedding")).as("emb_digest"))

  /** End-to-end RAG ingestion + retrieval (the north-star pipeline:
    * "batch embedding generation + DataFrame joins for retrieval"):
    * chunk documents → embed each chunk → cosine-join the corpus index →
    * top-k index hits per probe chunk. Every stage is a DataFrame
    * transform; the only shuffle is the final per-probe top-k window. */
  def ragRetrieve(documents: DataFrame, index: DataFrame,
                  nProbeDocs: Int = 10, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = Chunking.chunkFixed(documents.filter(col("doc_id") < nProbeDocs))
    val probeVecs = embed(
      chunks.select((col("doc_id") * 1000 + col("chunk_index")).as("chunk_id"), col("chunk_text")),
      "chunk_id", "chunk_text")
      .select(col("id").as("chunk_id"), col("embedding").as("pv"))
    index
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(probeVecs))
      .withColumn("cos", VectorOps.cosine(col("embedding"), col("pv")))
      .groupBy(col("chunk_id"))
      .agg(graft.functions.TopKAgg.topK(col("cos"), col("vec_id"), k).as("topk"))
      .select(col("chunk_id"), posexplode(col("topk")))
      .select(col("chunk_id"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("cos"))
  }
}
