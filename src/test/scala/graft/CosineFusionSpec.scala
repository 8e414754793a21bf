package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosineFusionRule, CosineSimFF, VectorOps}
import graft.sources.Tables

/** The cosine-fusion optimizer rule: the textbook dot/(‖a‖·‖b‖) expression
  * must collapse to one CosineSimFF node in the optimized plan, with
  * bit-identical results.
  */
class CosineFusionSpec extends SparkSpec {

  test("dot/(sqrt*sqrt) fuses into CosineSimFF with identical results") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CosineFusionRule
    try {
      val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      // probe must be non-foldable: a literal's norm constant-folds before
      // the fusion batch runs, destroying the dot/(sqrt*sqrt) shape
      val probe = reverse(col("embedding"))
      val composed = emb.select(
        col("vec_id"),
        (VectorOps.dot(col("embedding"), probe) /
          (sqrt(VectorOps.dot(col("embedding"), col("embedding"))) *
            sqrt(VectorOps.dot(probe, probe)))).as("cos"))
      val fusedCount = composed.queryExecution.optimizedPlan
        .expressions.map(_.collect { case c: CosineSimFF => c }.size).sum
      assert(fusedCount == 1, s"expected 1 fused CosineSimFF node, found $fusedCount")
      // bit-identical to the native kernel called directly
      val direct = emb.select(col("vec_id"),
        VectorOps.cosine(col("embedding"), probe).as("cos"))
      assert(composed.exceptAll(direct).count() == 0 &&
        direct.exceptAll(composed).count() == 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == CosineFusionRule)
    }
  }
}
