package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosinePrenormRule, CosineSimFF, DotProductFF, VectorOps}
import graft.sources.Tables

/** The cosine pre-norm pushdown rule: a cosine scored above a join must be
  * split into per-side norm projections below the join plus a single
  * dot-product per pair, with bit-identical results; plans out of scope
  * (cosine within one side, non-inner joins) must be untouched; the conf
  * flag must disable the rewrite.
  */
class CosinePrenormSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CosinePrenormRule
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == CosinePrenormRule)
  }

  private def pairScore = {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(probes))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        VectorOps.cosine(col("embedding"), col("pv")).as("cos"))
  }

  test("cosine over a join splits into prenorm projections, bit-identical") {
    val baseline = pairScore.collect()
    val (rewritten, plan) = withRule {
      val df = pairScore
      (df.collect(), df.queryExecution.optimizedPlan)
    }
    val survivors = plan.expressions.map(_.collect { case c: CosineSimFF => c }.size).sum
    assert(survivors == 0, s"expected the join-crossing CosineSimFF rewritten, found $survivors")
    val dots = plan.collect { case p => p.expressions.flatMap(_.collect { case d: DotProductFF => d }) }
      .flatten
    // one pair dot + two per-side norm dots
    assert(dots.size == 3, s"expected 3 DotProductFF nodes (pair + 2 norms), found ${dots.size}")
    assert(plan.toString.contains("_graft_prenorm"), "norm projections missing from plan")
    // bit-identical (exact Double equality via Row equals on collected sets)
    assert(baseline.toSet == rewritten.toSet, "prenorm rewrite changed results")
  }

  test("zero-norm vectors yield NULL identically with the rule on and off") {
    import spark.implicits._
    val l = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("lid", "lv")
    val r = Seq((10L, Array(0.0f, 1.0f)), (11L, Array(0.0f, 0.0f)),
        (12L, Array[Float]()))
      .toDF("rid", "rv")
    def scored = l.crossJoin(r)
      .select($"lid", $"rid", VectorOps.cosine($"lv", $"rv").as("cos"))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(x => (x.getLong(0), x.getLong(1)) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    val off = asMap(scored.collect())
    val on = withRule(asMap(scored.collect()))
    assert(off === on, "rule-on and rule-off disagree on degenerate vectors")
    // every pair touching a zero-norm or empty vector is NULL (the Divide /
    // kernel / DuckDB zero-divisor convention), the one real pair is not
    assert(off((2L, 10L)).contains(0.0))
    assert(off.removed((2L, 10L)).values.forall(_.isEmpty),
      s"zero-norm pairs must be NULL: $off")
  }

  test("cosine confined to one side is left untouched") {
    val emb = Tables.embeddings(spark, dir)
    val scored = emb.select(col("vec_id"),
      VectorOps.cosine(col("embedding"), reverse(col("embedding"))).as("selfcos"))
    val ids = emb.select(col("vec_id"))
    val joined = scored.join(ids, "vec_id").select(col("vec_id"), col("selfcos"))
    val plan = withRule(joined.queryExecution.optimizedPlan)
    val fused = plan.collect { case n =>
      n.expressions.map(_.collect { case c: CosineSimFF => c }.size).sum
    }.sum
    assert(fused >= 1, "in-scope-side cosine should survive unrewritten")
    assert(!plan.toString.contains("_graft_prenorm"), "no norm pushdown expected")
  }

  test("conf flag disables the rewrite") {
    spark.conf.set("spark.graft.cosinePrenorm.enabled", "false")
    try {
      val plan = withRule(pairScore.queryExecution.optimizedPlan)
      val fused = plan.expressions.map(_.collect { case c: CosineSimFF => c }.size).sum
      assert(fused == 1, s"flag off: expected the original CosineSimFF, found $fused")
    } finally spark.conf.unset("spark.graft.cosinePrenorm.enabled")
  }

  test("composes with CosineFusionRule: textbook spelling ends prenormed") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.functions.CosineFusionRule
    // the fusion rule matches LEGACY/TRY divides only (an ANSI divide's
    // zero-divisor ERROR can't be reproduced by the kernel's NULL), so the
    // textbook spelling composes under ansi=false
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      withRule {
        val emb = Tables.embeddings(spark, dir)
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
        val composed = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
          .crossJoin(broadcast(probes))
          .select(col("probe_id"), col("neighbor_id"),
            (VectorOps.dot(col("embedding"), col("pv")) /
              (sqrt(VectorOps.dot(col("embedding"), col("embedding"))) *
                sqrt(VectorOps.dot(col("pv"), col("pv"))))).as("cos"))
        val plan = composed.queryExecution.optimizedPlan
        assert(plan.toString.contains("_graft_prenorm"),
          "fusion + prenorm should leave pushed-down norms")
        val direct = pairScore.filter(col("probe_id") =!= col("neighbor_id"))
        val a = composed.filter(col("probe_id") =!= col("neighbor_id")).collect().toSet
        assert(a == direct.collect().toSet, "composed pipeline diverged from direct kernel")
      }
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.functions.CosineFusionRule)
    }
  }
}
