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

  /** Mean-pooled class centroids over the embedding corpus — the pooling
    * step of every bi-encoder pipeline (chunk vectors → doc vector, doc
    * vectors → class prototype). Emitted exploded as (label, dim, n,
    * mean_val): per-dim sums ride DECIMAL(38,18) through the string cast
    * (order-independent across partitionings), the mean divides back in
    * double via the string-cast recipe — hash-exact vs the oracle at any
    * parallelism. One map-combined shuffle keyed by (label, dim). */
  def meanPool(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v").cast("string").cast("decimal(38,18)")).as("dsum"))
      .select(col("label"), col("dim"), col("n"),
        (col("dsum").cast("string").cast("double") / col("n")).as("mean_val"))

  val meanPoolSql: String =
    """WITH e AS (
      |  SELECT label, embedding AS a, unnest(range(1, len(embedding) + 1)) AS i
      |  FROM embeddings),
      |x AS (
      |  SELECT label, CAST(i - 1 AS BIGINT) AS dim,
      |    CAST(CAST(a[i] AS VARCHAR) AS DECIMAL(38,18)) AS dv
      |  FROM e)
      |SELECT label, dim, COUNT(*) AS n,
      |  CAST(CAST(SUM(dv) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean_val
      |FROM x GROUP BY label, dim""".stripMargin

  /** Engine-PORTABLE hashed-feature embedding — the oracle-checkable twin
    * of `embed` (whose splitmix64 kernel has no DuckDB equivalent, keeping
    * embed_docs rows-only). Same fasttext-style model: each token hashes to
    * a dimension (base-31 rolling hash mod p, the fingerprint family), adds
    * ±1 by the xor-shift sign bit, and the vector L2-normalizes. Everything
    * stays integer until the final normalize — the squared norm is an exact
    * integer, sqrt and one division are correctly-rounded IEEE on both
    * engines — so the full embedding matrix hash-matches DuckDB.
    * Emitted exploded as (doc_id, dim, val) on hit dimensions only (a dim
    * no token mapped to is absent — identical on both engines); one narrow
    * zero-shuffle kernel, linear at 100 TB. */
  /** Shared accumulator for the portable kernel: per-dim ±1 sums, hit
    * flags, and the exact-integer squared norm. */
  private def portableAcc(text: String, dim: Int): (Array[Long], Array[Boolean], Long) = {
    val acc = new Array[Long](dim)
    val hits = new Array[Boolean](dim)
    text.trim.split("\\s+").foreach { t =>
      var h = 0L
      var i = 0
      while (i < t.length) { h = (h * 31L + t.charAt(i)) % 1000000007L; i += 1 }
      val j = (h % dim).toInt
      val v = (h * 2654435761L + 40503L) % 4294967296L
      if (((v ^ (v >>> 16)) & 1L) == 1L) acc(j) += 1L else acc(j) -= 1L
      hits(j) = true
    }
    var sumsq = 0L
    var j = 0
    while (j < dim) { sumsq += acc(j) * acc(j); j += 1 }
    (acc, hits, sumsq)
  }

  def embedPortable(documents: DataFrame, dim: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val (acc, hits, sumsq) = portableAcc(text, dim)
        val norm = math.sqrt(sumsq.toDouble)
        (0 until dim).iterator.filter(hits).map { j =>
          (docId, j.toLong, if (norm == 0.0) 0.0 else acc(j) / norm)
        }
      }
      .toDF("doc_id", "dim", "val")
  }

  /** Dense-vector flavor of the portable embedding (float array, zero-filled
    * dims) — the drop-in probe encoder for the oracle-checked retrieval
    * pipeline. Same kernel, same narrow zero-shuffle shape as `embed`. */
  def embedPortableVec(df: DataFrame, idCol: String, textCol: String,
                       dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(iter => iter.map { case (id, text) =>
        val (acc, _, sumsq) = portableAcc(text, dim)
        val norm = math.sqrt(sumsq.toDouble)
        val vec = new Array[Float](dim)
        if (norm != 0.0) {
          var j = 0
          while (j < dim) { vec(j) = (acc(j) / norm).toFloat; j += 1 }
        }
        (id, vec)
      })
      .toDF("id", "embedding")
  }

  def embedPortableSql(dim: Int = 64): String =
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |hx AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(tok, ''), x -> CAST(ord(x) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % 1000000007) AS h
       |  FROM tk),
       |ac AS (
       |  SELECT doc_id, h % $dim AS dim,
       |    CAST(SUM(CASE WHEN xor((h * 2654435761 + 40503) % 4294967296,
       |                           ((h * 2654435761 + 40503) % 4294967296) // 65536) % 2 = 1
       |                  THEN 1 ELSE -1 END) AS BIGINT) AS acc
       |  FROM hx GROUP BY doc_id, h % $dim),
       |nm AS (
       |  SELECT doc_id, CAST(SUM(acc * acc) AS BIGINT) AS sumsq
       |  FROM ac GROUP BY doc_id)
       |SELECT a.doc_id, a.dim,
       |  CASE WHEN n.sumsq = 0 THEN 0.0
       |       ELSE CAST(a.acc AS DOUBLE) / sqrt(CAST(n.sumsq AS DOUBLE)) END AS val
       |FROM ac a JOIN nm n ON a.doc_id = n.doc_id""".stripMargin

  /** End-to-end RAG ingestion + retrieval (the north-star pipeline:
    * "batch embedding generation + DataFrame joins for retrieval"):
    * chunk documents → embed each chunk → cosine-join the corpus index →
    * top-k index hits per probe chunk. Every stage is a DataFrame
    * transform; the only shuffle is the final per-probe top-k window.
    * chunk_id = doc_id * 1000 + chunk_index assumes < 1000 chunks per doc
    * (~450 KB of text at the 512/64 defaults); widen the multiplier or
    * key on the (doc_id, chunk_index) struct past that. RagRefresh
    * inherits the same convention. */
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

  /** The north-star pipeline with the PORTABLE encoder — chunk → embed →
    * cosine-join → bounded top-k, every stage hash-oracle-checkable: chunk
    * boundaries are the oracle-green chunkFixed split, probe vectors come
    * from `embedPortableVec` (DuckDB replays the kernel), and the cosine is
    * the fused CosineSimFF fold that DuckDB's list_sum transform matches
    * bit-for-bit (knn_join precedent). Same plan as `ragRetrieve`: probe
    * side broadcast, scoring in one codegen pass, shuffle O(chunks·k) via
    * the bounded TopKAgg. */
  def ragRetrievePortable(documents: DataFrame, index: DataFrame,
                          nProbeDocs: Int = 10, k: Int = 3): DataFrame = {
    val chunks = Chunking.chunkFixed(documents.filter(col("doc_id") < nProbeDocs))
    val probeVecs = embedPortableVec(
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

  def ragRetrievePortableSql(nProbeDocs: Int = 10, k: Int = 3, dim: Int = 64): String = {
    val cos = VectorOps.cosineSql("e.embedding", "p.pv", dim)
    s"""WITH probe_docs AS (SELECT * FROM documents WHERE doc_id < $nProbeDocs),
       |ch AS MATERIALIZED (${Chunking.chunkFixedSql().replace("FROM documents", "FROM probe_docs")}),
       |tk AS (
       |  SELECT doc_id * 1000 + chunk_index AS chunk_id,
       |    unnest(string_split_regex(trim(chunk_text), '\\s+')) AS tok
       |  FROM ch),
       |hx AS (
       |  SELECT chunk_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(tok, ''), x -> CAST(ord(x) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % 1000000007) AS h
       |  FROM tk),
       |ac AS (
       |  SELECT chunk_id, h % $dim AS dim,
       |    CAST(SUM(CASE WHEN xor((h * 2654435761 + 40503) % 4294967296,
       |                           ((h * 2654435761 + 40503) % 4294967296) // 65536) % 2 = 1
       |                  THEN 1 ELSE -1 END) AS BIGINT) AS acc
       |  FROM hx GROUP BY chunk_id, h % $dim),
       |nm AS (
       |  SELECT chunk_id, CAST(SUM(acc * acc) AS BIGINT) AS sumsq FROM ac GROUP BY chunk_id),
       |grid AS (
       |  SELECT chunk_id, unnest(range(0, $dim)) AS dim FROM nm),
       |pv AS (
       |  SELECT g.chunk_id,
       |    list(CAST(CASE WHEN n.sumsq = 0 THEN 0.0
       |                   ELSE CAST(COALESCE(a.acc, 0) AS DOUBLE) / sqrt(CAST(n.sumsq AS DOUBLE))
       |              END AS FLOAT) ORDER BY g.dim) AS pv
       |  FROM grid g
       |  LEFT JOIN ac a ON a.chunk_id = g.chunk_id AND a.dim = g.dim
       |  JOIN nm n ON n.chunk_id = g.chunk_id
       |  GROUP BY g.chunk_id)
       |SELECT p.chunk_id, e.vec_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY p.chunk_id ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rn,
       |  $cos AS cos
       |FROM embeddings e CROSS JOIN pv p
       |QUALIFY rn <= $k""".stripMargin
  }

  /** Embedding-model drift monitor — per-dimension mean shift between
    * corpus snapshots (vec_id parity ≙ snapshot id): the MLOps check that
    * catches a silently re-versioned or mis-normalized encoder before it
    * poisons the index. Means are decimal-exact sums of the floats'
    * string reprs divided in double (the doc_cluster recipe), so the
    * whole drift table hash-matches; delta = mean_new − mean_old, one
    * IEEE subtraction. One posexplode + (half, dim) groupBy. */
  def embedDrift(embeddings: DataFrame): DataFrame = {
    val exploded = embeddings.select(
      pmod(col("vec_id"), lit(2L)).as("half"),
      posexplode(col("embedding")).as(Seq("dim", "val")))
    def dmean(h: Long) =
      (sum(when(col("half") === h, col("val")).cast("string").cast("decimal(38,18)"))
        .cast("string").cast("double") /
        count(when(col("half") === h, lit(1))).cast("double"))
    exploded.groupBy(col("dim").cast("long").as("dim"))
      .agg(dmean(0L).as("mean_old"), dmean(1L).as("mean_new"))
      .withColumn("delta", col("mean_new") - col("mean_old"))
  }

  val embedDriftSql: String =
    """WITH ex AS (
      |  SELECT vec_id % 2 AS half,
      |    unnest(range(0, CAST(len(embedding) AS BIGINT))) AS dim,
      |    unnest(embedding) AS val
      |  FROM embeddings)
      |SELECT CAST(dim AS BIGINT) AS dim,
      |  CAST(CAST(SUM(CASE WHEN half = 0 THEN CAST(CAST(val AS VARCHAR) AS DECIMAL(38,18)) END)
      |    AS VARCHAR) AS DOUBLE) / CAST(COUNT(CASE WHEN half = 0 THEN 1 END) AS DOUBLE)
      |    AS mean_old,
      |  CAST(CAST(SUM(CASE WHEN half = 1 THEN CAST(CAST(val AS VARCHAR) AS DECIMAL(38,18)) END)
      |    AS VARCHAR) AS DOUBLE) / CAST(COUNT(CASE WHEN half = 1 THEN 1 END) AS DOUBLE)
      |    AS mean_new,
      |  CAST(CAST(SUM(CASE WHEN half = 1 THEN CAST(CAST(val AS VARCHAR) AS DECIMAL(38,18)) END)
      |    AS VARCHAR) AS DOUBLE) / CAST(COUNT(CASE WHEN half = 1 THEN 1 END) AS DOUBLE) -
      |  CAST(CAST(SUM(CASE WHEN half = 0 THEN CAST(CAST(val AS VARCHAR) AS DECIMAL(38,18)) END)
      |    AS VARCHAR) AS DOUBLE) / CAST(COUNT(CASE WHEN half = 0 THEN 1 END) AS DOUBLE)
      |    AS delta
      |FROM ex GROUP BY dim""".stripMargin
}
