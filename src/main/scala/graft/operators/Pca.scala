package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Iterative._

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
    // co-partition the centered matrix by vec_id ONCE: every iteration
    // (a) aggregates scores by vec_id and (b) joins those scores back on
    // vec_id — with c hash-distributed on the key, both the per-iteration
    // groupBy(vec_id) and the c⋈s join reuse the one up-front shuffle
    // instead of re-exchanging the full rows·dim matrix per step (the
    // pos-keyed sides stay broadcast/d-row-sized). At 100 TB the exploded
    // matrix is the corpus — one shuffle total, not one per iteration.
    val c = x.join(broadcast(mu), "pos")
      .select(col("vec_id"), col("pos"), (col("val") - col("m")).as("c"))
      .repartition(col("vec_id")).sortWithinPartitions("vec_id").persist()
    try {
      var v = (0 until dim).map(p => (p, 1.0)).toDF("pos", "v")
      // per-row score s_i = Σ_p c[i,p]·v[p] as a WINDOW sum over the
      // vec_id group instead of a groupBy + self-join: the join spelling
      // either broadcasts the n-row score frame (row-count-sized — the
      // hits unbounded-broadcast lesson) or re-shuffles the matrix per
      // iteration; the window moves NOTHING — c is already clustered on
      // vec_id, so each iteration is one sorted pass over the cached
      // partitions plus the d-row y exchange. Decimal window sums are
      // order-independent, so the value is bit-identical to the groupBy.
      val byVec = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
      for (_ <- 1 to iters) {
        val y = c.join(broadcast(v), "pos")
          .withColumn("s",
            sum(dec(col("c") * col("v"))).over(byVec).cast("string").cast("double"))
          .select(col("pos"), dec(col("s") * col("c")).as("t"))
          .groupBy(col("pos")).agg(decSum(col("t")).as("y"))
        val rows = y.collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
        val m = rows.map(r => math.abs(r._2)).max
        v = rows.map { case (p, yv) => (p, yv / m) }.toSeq.toDF("pos", "v")
      }
      // materialize the projection so the returned plan scans the
      // checkpoint — returning a plan that leaned on c's cache would
      // either pin the exploded matrix for the session or (unpersisted)
      // silently recompute centering at consumption
      c.join(broadcast(v), "pos")
        .select(col("vec_id"), dec(col("c") * col("v")).as("t"))
        .groupBy(col("vec_id")).agg(decSum(col("t")).as("pc1"))
        .materialize
    } finally c.unpersist(blocking = false)
  }

  /** DuckDB oracle replaying centering + the full power iteration. */
  def pcaProjectSql(dim: Int = 64, iters: Int = 3): String = {
    def decSumSql(t: String) =
      s"CAST(CAST(SUM(CAST(CAST($t AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)"
    // the per-row score is a WINDOW sum over the vec_id group (mirrors the
    // Spark spelling; decimal sums are order-independent so window ==
    // groupBy+join bit-for-bit)
    val winS =
      "CAST(CAST(SUM(CAST(CAST(c.c * v.v AS VARCHAR) AS DECIMAL(38,18))) " +
        "OVER (PARTITION BY c.vec_id) AS VARCHAR) AS DOUBLE)"
    val steps = (1 to iters).map { i =>
      s"""y_$i AS MATERIALIZED (
         |  SELECT pos, ${decSumSql("s * cc")} AS y FROM (
         |    SELECT c.pos AS pos, c.c AS cc, $winS AS s
         |    FROM c JOIN v_${i - 1} v USING (pos))
         |  GROUP BY pos),
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
