package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (`zip_with`/`aggregate`) — no UDFs, stays inside
  * whole-stage codegen.
  *
  * Re-expresses the vector-similarity retrieval of the reference
  * (neo4j_knowledge_service.py:922 `search_similar_nodes`) as column
  * expressions usable in joins/windows at any scale.
  *
  * Determinism note: the fold is a sequential left-to-right sum over list
  * elements in double precision, matching DuckDB's `list_sum` order so the
  * oracle hash-compares bit-exactly.
  */
object VectorOps {

  /** Dot product in double precision (sequential left fold), as a native
    * codegen'd expression — see [[DotProductFF]]. The HOF formulation
    * (`aggregate(zip_with(...))`) computes the same value but is
    * CodegenFallback (interpreted per element); the native kernel keeps
    * vector scoring inside WholeStageCodegen. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(DotProductFF(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Reference HOF formulation (kept for cross-checking the native kernel). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity — fused single-pass native kernel ([[CosineSimFF]]):
    * dot + both norms accumulated in one loop, bit-identical to the
    * composed dot/sqrt formulation. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CosineSimFF(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Cosine given a precomputed norm for each side (bench path: compute the
    * norm once per row instead of three dots per pair). */
  def cosinePrenorm(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** JVM twin of CosineSimFF's fold for broadcast-model kernels: the same
    * single-pass sequential double accumulation (dot, ‖a‖², ‖b‖²), so a
    * mapPartitions argmax over broadcast centroids is bit-identical to the
    * column-expression form it replaces. */
  def cosineFF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // ---- DuckDB oracle SQL fragments (kept adjacent so Spark + oracle stay in
  //      lock-step; both are sequential double-precision folds) ----
  def dotSql(a: String, b: String, dim: Int = 64): String =
    s"list_sum(list_transform(range(1,${dim + 1}), i -> CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)))"
  /** Squared L2 — the same sequential fold shape as the JVM l2D kernel. */
  def l2Sql(a: String, b: String, dim: Int = 64): String =
    s"list_sum(list_transform(range(1,${dim + 1}), i -> (CAST($a[i] AS DOUBLE)-CAST($b[i] AS DOUBLE))*(CAST($a[i] AS DOUBLE)-CAST($b[i] AS DOUBLE))))"
  def cosineSql(a: String, b: String, dim: Int = 64): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"
}
