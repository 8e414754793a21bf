package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-principal-component extraction over the embedding column via power
  * iteration — the dimensionality-reduction step that precedes ANN indexing
  * and whitening in large embedding pipelines (reduce d before you build
  * the IVF/PQ index; the reference's embedding surface stops at raw
  * vectors, this is the natural scale extension).
  *
  * Algorithm: center x̄ = x − μ, then iterate v ← normalize(Σ x̄ (x̄·v)) —
  * each iteration multiplies v by the covariance matrix WITHOUT ever
  * materializing the d×d covariance: one join+agg for the per-row scores
  * s = x̄·v (keyed by vec_id) and one for the per-dim accumulation
  * y = Σ s·x̄ (keyed by pos, d rows). Both shuffles are linear in
  * rows·dim with full map-side partial aggregation; v and μ are d-row
  * model tables broadcast to every task. At 100 TB this is the exact
  * shape of a distributed matvec; nothing grows with corpus².
  *
  * Cross-engine determinism (DuckDB oracle replays the whole iteration):
  * every reduction — per-dim means, per-row dots, per-dim accumulations —
  * sums DECIMAL(38,18) over each term's shortest double repr (exact,
  * summation-order-independent), decimal→double always via a string cast
  * (the direct cast is 1-ulp engine-dependent), and normalization is
  * L∞ (divide by max |y|: order-independent max + one exactly-rounded
  * division — no sqrt needed, though sqrt would also be IEEE-exact).
  * The per-iteration v collect is d=64 rows — a bounded model parameter,
  * same pattern as Cluster's centroid collect.
  *
  * Convergence caveat (measured): the synthetic test embeddings are
  * near-isotropic (λ2/λ1 ≈ 0.99), so no iteration budget yields a sharply
  * dominant component on THIS data — the registered contract is the exact
  * T-step iterate (bit-matched by the oracle), and PcaSpec checks the
  * guaranteed invariant instead: the projection's variance is ≥ the mean
  * per-dim variance (Rayleigh quotient from ones-init only grows). On real
  * embedding corpora with a spectral gap the same iterate IS the top PC. */
object Pca {

  private def decSum(t: org.apache.spark.sql.Column) =
    sum(t.cast("string").cast("decimal(38,18)")).cast("string").cast("double")

  private def dec(t: org.apache.spark.sql.Column) =
    t.cast("string").cast("decimal(38,18)")

  def pcaProject(embeddings: DataFrame, dim: Int = 64, iters: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val x = embeddings
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("val"))
    val mu = x.groupBy(col("pos"))
      .agg(decSum(col("val")).as("sm"), count(lit(1)).as("n"))
      .select(col("pos"), (col("sm") / col("n").cast("double")).as("m"))
    val c = x.join(broadcast(mu), "pos")
      .select(col("vec_id"), col("pos"), (col("val") - col("m")).as("c"))
      .persist()
    var v = (0 until dim).map(p => (p, 1.0)).toDF("pos", "v")
    for (_ <- 1 to iters) {
      val s = c.join(broadcast(v), "pos")
        .select(col("vec_id"), dec(col("c") * col("v")).as("t"))
        .groupBy(col("vec_id")).agg(decSum(col("t")).as("s"))
      val y = c.join(s, "vec_id")
        .select(col("pos"), dec(col("s") * col("c")).as("t"))
        .groupBy(col("pos")).agg(decSum(col("t")).as("y"))
      val rows = y.collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
      val m = rows.map(r => math.abs(r._2)).max
      v = rows.map { case (p, yv) => (p, yv / m) }.toSeq.toDF("pos", "v")
    }
    val out = c.join(broadcast(v), "pos")
      .select(col("vec_id"), dec(col("c") * col("v")).as("t"))
      .groupBy(col("vec_id")).agg(decSum(col("t")).as("pc1"))
    out
  }

  /** DuckDB oracle replaying centering + the full power iteration. */
  def pcaProjectSql(dim: Int = 64, iters: Int = 3): String = {
    def decSumSql(t: String) =
      s"CAST(CAST(SUM(CAST(CAST($t AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)"
    val steps = (1 to iters).map { i =>
      s"""s_$i AS MATERIALIZED (
         |  SELECT c.vec_id, ${decSumSql("c.c * v.v")} AS s
         |  FROM c JOIN v_${i - 1} v USING (pos) GROUP BY c.vec_id),
         |y_$i AS MATERIALIZED (
         |  SELECT c.pos, ${decSumSql("s.s * c.c")} AS y
         |  FROM c JOIN s_$i s USING (vec_id) GROUP BY c.pos),
         |m_$i AS (SELECT MAX(ABS(y)) AS m FROM y_$i),
         |v_$i AS (SELECT pos, y / m AS v FROM y_$i, m_$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH rng AS (SELECT unnest(range(0, $dim)) AS pos),
       |x AS MATERIALIZED (
       |  SELECT vec_id, rng.pos, CAST(embedding[rng.pos + 1] AS DOUBLE) AS val
       |  FROM embeddings CROSS JOIN rng),
       |mu AS (
       |  SELECT pos, ${decSumSql("val")} / CAST(COUNT(*) AS DOUBLE) AS m
       |  FROM x GROUP BY pos),
       |c AS MATERIALIZED (
       |  SELECT x.vec_id, x.pos, x.val - mu.m AS c FROM x JOIN mu USING (pos)),
       |v_0 AS (SELECT pos, CAST(1.0 AS DOUBLE) AS v FROM rng),
       |$steps
       |SELECT c.vec_id, ${decSumSql("c.c * v.v")} AS pc1
       |FROM c JOIN v_$iters v USING (pos) GROUP BY c.vec_id""".stripMargin
  }
}
