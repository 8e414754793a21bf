package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Product quantization (PQ) — the memory layout behind every billion-vector
  * ANN index (FAISS IVF-PQ): split each d-dim vector into m subvectors,
  * quantize each against a per-subspace codebook of nCodes entries, and
  * search with asymmetric distance (probe stays exact, corpus side is its m
  * codes). A 64-dim float vector (256 B) compresses to m=8 small codes — the
  * compression that lets a 100 TB embedding corpus live in executor memory.
  *
  * Scale shape (all narrow, zero shuffle until the bounded top-k):
  *   - codebooks are a bounded MODEL PARAMETER (m × nCodes subvectors;
  *     production trains them with k-means per subspace, here the
  *     deterministic first-nCodes stand-in);
  *   - ENCODE is a typed mapPartitions kernel (the 128-literal argmax
  *     expression tree compiled fine but cost seconds of codegen per run;
  *     the JVM kernel is bit-identical and compiles once with the jar);
  *   - SEARCH is the FAISS ADC trick: per probe, the m × nCodes partial
  *     dot products are precomputed ONCE into a lookup table (driver-side,
  *     bounded by probes·m·nCodes), broadcast, and each encoded row is
  *     scored by m table lookups — no per-pair vector math anywhere.
  *     TopKAgg bounds the only shuffle to O(probes·k).
  *
  * Cross-engine determinism: dots are sequential double MACs (the
  * DotProductFF/list_sum order) and the m contributions are added in a fixed
  * left-associated order; the oracle spells out the same parenthesization,
  * so results are bit-exact.
  */
object ProductQuant {

  val Dim = 64

  /** Sequential double MAC — same order as DotProductFF / DuckDB list_sum. */
  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** First-nCodes codebooks: subspace s → nCodes subvectors of width Dim/m. */
  private def codebooks(embeddings: DataFrame, m: Int, nCodes: Int): Array[Array[Array[Float]]] = {
    import embeddings.sparkSession.implicits._
    val base = embeddings.filter(col("vec_id") < nCodes)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1).map(_._2)
    val w = Dim / m
    Array.tabulate(m)(s => base.map(v => v.slice(s * w, s * w + w)))
  }

  /** PQ-encode every vector: per subspace, argmax-dot code (ties → smaller
    * code, via strict-greater ascending scan). Narrow kernel, zero shuffle. */
  def pqEncode(embeddings: DataFrame, m: Int = 8, nCodes: Int = 16): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cbs = codebooks(embeddings, m, nCodes)
    val w = Dim / m
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        iter.map { case (id, v) =>
          val codes = new Array[Int](m)
          var s = 0
          while (s < m) {
            val sub = v.slice(s * w, s * w + w)
            var bestC = 0
            var bestD = Double.NegativeInfinity
            var c = 0
            while (c < nCodes) {
              val d = dotD(sub, cbs(s)(c))
              if (d > bestD) { bestD = d; bestC = c }
              c += 1
            }
            codes(s) = bestC
            s += 1
          }
          (id, codes)
        }
      }
      .toDF("vec_id", "codes")
  }

  /** ANN search over the PQ-compressed corpus with per-probe ADC lookup
    * tables: lut(p)(s)(c) = dot(probe p's subvector s, codebook entry c),
    * computed once and broadcast; every encoded row scores as m lookups. */
  def pqSearch(embeddings: DataFrame, m: Int = 8, nCodes: Int = 16,
               nProbes: Int = 10, k: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cbs = codebooks(embeddings, m, nCodes)
    val w = Dim / m
    val probes: Array[(Long, Array[Float])] = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    // bounded: nProbes × m × nCodes doubles (FAISS's per-query distance table)
    val lut: Array[(Long, Array[Array[Double]])] = probes.map { case (pid, pv) =>
      (pid, Array.tabulate(m, nCodes)((s, c) => dotD(pv.slice(s * w, s * w + w), cbs(s)(c))))
    }
    val scored = pqEncode(embeddings, m, nCodes)
      .as[(Long, Array[Int])]
      .mapPartitions { iter =>
        iter.flatMap { case (nid, codes) =>
          lut.iterator.collect { case (pid, t) if pid != nid =>
            var score = 0.0
            var s = 0
            while (s < m) { score += t(s)(codes(s)); s += 1 }
            (pid, nid, score)
          }
        }
      }
      .toDF("probe_id", "neighbor_id", "approx_score")
    scored
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopKAgg.topK(col("approx_score"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")))
      .select(col("probe_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.score").as("approx_score"))
  }

  /** IVF-PQ — the composition every billion-vector index actually ships
    * (FAISS IndexIVFPQ): the IVF coarse quantizer routes each probe to ONE
    * cell, and within the cell candidates are scored from their PQ codes
    * via the broadcast ADC lookup table. Search cost = |cell| lookups per
    * probe (≈ corpus/nCells), memory = m bytes per vector. Both model
    * parameters (centroids + codebooks) are bounded driver-side artifacts,
    * exactly as in annIvf/pqSearch. */
  def ivfPqSearch(embeddings: DataFrame, nCells: Int = 16, m: Int = 8,
                  nCodes: Int = 16, nProbes: Int = 10, k: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Float])] = embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val cbs = codebooks(embeddings, m, nCodes)
    val w = Dim / m
    // narrow argmax-cosine cell assignment over inlined centroids (annIvf's
    // contract), fused with the PQ encode kernel in one typed pass
    def cellOf(v: Array[Float]): Long = {
      var bestC = 0L
      var bestD = Double.NegativeInfinity
      cents.foreach { case (id, c) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < v.length) {
          val x = v(i).toDouble; val y = c(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val cos = dot / (math.sqrt(na) * math.sqrt(nb))
        if (cos > bestD) { bestD = cos; bestC = id }
      }
      bestC
    }
    val probes: Array[(Long, Long, Array[Float])] = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1).map { case (pid, pv) => (pid, cellOf(pv), pv) }
    val lut: Map[Long, (Long, Array[Array[Double]])] = probes.map { case (pid, cell, pv) =>
      pid -> (cell, Array.tabulate(m, nCodes)((s, c) => dotD(pv.slice(s * w, s * w + w), cbs(s)(c))))
    }.toMap
    val scored = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        iter.flatMap { case (nid, v) =>
          val cell = cellOf(v)
          val codes = new Array[Int](m)
          var s = 0
          while (s < m) {
            val sub = v.slice(s * w, s * w + w)
            var bestC = 0; var bestD = Double.NegativeInfinity; var c = 0
            while (c < nCodes) {
              val d = dotD(sub, cbs(s)(c))
              if (d > bestD) { bestD = d; bestC = c }
              c += 1
            }
            codes(s) = bestC; s += 1
          }
          lut.iterator.collect { case (pid, (pcell, t)) if pcell == cell && pid != nid =>
            var score = 0.0
            var i = 0
            while (i < m) { score += t(i)(codes(i)); i += 1 }
            (pid, nid, score)
          }
        }
      }
      .toDF("probe_id", "neighbor_id", "approx_score")
    scored
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

  def ivfPqSearchSql(nCells: Int = 16, m: Int = 8, nCodes: Int = 16,
                     nProbes: Int = 10, k: Int = 3): String = {
    val w = Dim / m
    val ccos = VectorOps.cosineSql("e.embedding", "c.embedding")
    val encDot = VectorOps.dotSql("sv.sub_e", "c.emb_sub", w)
    s"""WITH cents AS (
       |  SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < $nCells),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, c.cell_id AS cell
       |  FROM embeddings e CROSS JOIN cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $ccos DESC, c.cell_id) = 1),
       |ss AS (SELECT unnest(range(0, $m)) AS s),
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
       |  SELECT vec_id AS probe_id, embedding AS pv, cell FROM assigned WHERE vec_id < $nProbes),
       |scored AS (
       |  SELECT p.probe_id, n.vec_id AS neighbor_id,
       |    ${(0 until m).map(s =>
             VectorOps.dotSql(s"(p.pv[$s*$w+1 : $s*$w+$w])", s"cb$s.emb_sub", w))
             .reduce((a, b) => s"($a + $b)")} AS approx_score
       |  FROM encp n
       |  JOIN assigned na ON na.vec_id = n.vec_id
       |  ${(0 until m).map(s => s"JOIN cb cb$s ON cb$s.s = $s AND cb$s.code = n.c$s").mkString("\n  ")}
       |  JOIN probes p ON p.cell = na.cell AND n.vec_id <> p.probe_id)
       |SELECT probe_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY approx_score DESC, neighbor_id) AS BIGINT) AS rn,
       |  approx_score
       |FROM scored QUALIFY rn <= $k""".stripMargin
  }
}
