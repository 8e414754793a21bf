package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Product quantization (PQ) — the memory layout behind every billion-vector
  * ANN index (FAISS IVF-PQ): split each d-dim vector into m subvectors,
  * quantize each against a per-subspace codebook of 2^b entries, and search
  * with asymmetric distance (probe stays exact, corpus side is its m codes).
  * A 64-dim float vector (256 B) compresses to m=8 one-byte codes — 32×.
  *
  * Scale shape:
  *   - codebooks are a bounded MODEL PARAMETER (m × nCodes subvectors;
  *     production trains them with k-means per subspace, here the
  *     deterministic first-nCodes stand-in) — inlined as literals, so
  *     ENCODING is a narrow codegen argmax projection: zero shuffle;
  *   - SEARCH broadcasts the probes, scores each encoded row via m codebook
  *     lookups + 8-dim dots, and bounds the shuffle with the TopKAgg
  *     partial aggregate: O(probes·k) shuffle rows, never O(corpus).
  *
  * Cross-engine determinism: the m per-subspace dot contributions are added
  * in a FIXED left-associated order and the oracle spells out the identical
  * parenthesization — IEEE doubles make the result bit-exact (a SUM()
  * aggregate would be summation-order-dependent).
  */
object ProductQuant {

  val Dim = 64

  /** First-nCodes codebooks: subspace s → nCodes subvectors of width
    * Dim/m, sliced from the first nCodes embeddings. */
  private def codebooks(embeddings: DataFrame, m: Int, nCodes: Int): Array[Array[Array[Float]]] = {
    import embeddings.sparkSession.implicits._
    val base = embeddings.filter(col("vec_id") < nCodes)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1).map(_._2)
    val w = Dim / m
    Array.tabulate(m)(s => base.map(v => v.slice(s * w, s * w + w)))
  }

  private def sub(c: Column, s: Int, w: Int): Column = slice(c, s * w + 1, w)

  /** PQ-encode every vector: per subspace, argmax-dot code (ties → smaller
    * code id). Narrow projection; emits codes + a scalar digest for the
    * harness (the codes array itself feeds pqSearch). */
  def pqEncode(embeddings: DataFrame, m: Int = 8, nCodes: Int = 16): DataFrame = {
    val cbs = codebooks(embeddings, m, nCodes)
    val w = Dim / m
    val codeCols = (0 until m).map { s =>
      val cands = (0 until nCodes).map { c =>
        struct(VectorOps.dot(sub(col("embedding"), s, w), typedlit(cbs(s)(c))).as("d"),
          lit(-c.toLong).as("negc"))
      }
      (-greatest(cands: _*).getField("negc")).as(s"code_$s")
    }
    embeddings.select(col("vec_id") +: codeCols: _*)
  }

  /** ANN search over the PQ-compressed corpus: probes (vec_id < nProbes)
    * score every encoded row by asymmetric distance — sum over subspaces of
    * dot(probe subvector, codebook[code]) — then keep top-k per probe. */
  def pqSearch(embeddings: DataFrame, m: Int = 8, nCodes: Int = 16,
               nProbes: Int = 10, k: Int = 3): DataFrame = {
    val cbs = codebooks(embeddings, m, nCodes)
    val w = Dim / m
    val encoded = pqEncode(embeddings, m, nCodes)
      .withColumnRenamed("vec_id", "neighbor_id")
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    // fixed left-associated double chain — the oracle writes the identical
    // parenthesization, so the sum is bit-exact without decimal round-trips
    val contrib = (0 until m).map { s =>
      val lut = typedlit(cbs(s).map(_.toSeq).toSeq)
      VectorOps.dot(sub(col("pv"), s, w), element_at(lut, (col(s"code_$s") + 1).cast("int")))
    }
    encoded.join(broadcast(probes), col("neighbor_id") =!= col("probe_id"))
      .withColumn("approx_score", contrib.reduce(_ + _).cast("double"))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("approx_score"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("approx_score"))
  }

  // ---- DuckDB oracle ----

  def pqSearchSql(m: Int = 8, nCodes: Int = 16, nProbes: Int = 10, k: Int = 3): String = {
    val w = Dim / m
    val encDot = VectorOps.dotSql("sv.sub_e", "c.emb_sub", w)
    s"""WITH ss AS (SELECT unnest(range(0, $m)) AS s),
       |cb AS (
       |  SELECT ss.s, e.vec_id AS code, e.embedding[ss.s*$w+1 : ss.s*$w+$w] AS emb_sub
       |  FROM embeddings e CROSS JOIN ss
       |  WHERE e.vec_id < $nCodes),
       |sv AS (
       |  SELECT e.vec_id, ss.s, e.embedding[ss.s*$w+1 : ss.s*$w+$w] AS sub_e
       |  FROM embeddings e CROSS JOIN ss),
       |enc AS (
       |  SELECT sv.vec_id, sv.s, c.code
       |  FROM sv JOIN cb c ON c.s = sv.s
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.s
       |    ORDER BY $encDot DESC, c.code) = 1),
       |encp AS (
       |  SELECT vec_id,
       |    ${(0 until m).map(s => s"MAX(CASE WHEN s = $s THEN code END) AS c$s").mkString(", ")}
       |  FROM enc GROUP BY 1),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < $nProbes),
       |scored AS (
       |  SELECT p.probe_id, n.vec_id AS neighbor_id,
       |    ${(0 until m).map(s =>
             VectorOps.dotSql(s"(p.pv[$s*$w+1 : $s*$w+$w])", s"cb$s.emb_sub", w))
             .reduce((a, b) => s"($a + $b)")} AS approx_score
       |  FROM encp n
       |  ${(0 until m).map(s => s"JOIN cb cb$s ON cb$s.s = $s AND cb$s.code = n.c$s").mkString("\n  ")}
       |  CROSS JOIN probes p
       |  WHERE n.vec_id <> p.probe_id)
       |SELECT probe_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY approx_score DESC, neighbor_id) AS BIGINT) AS rn,
       |  approx_score
       |FROM scored QUALIFY rn <= $k""".stripMargin
  }
}
