package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosineFusionRule, CosineSimFF, VectorOps}
import graft.sources.Tables

/** The cosine-fusion optimizer rule: the textbook dot/(‖a‖·‖b‖) expression
  * must collapse to one CosineSimFF node in the optimized plan, with
  * bit-identical results.
  */
class CosineFusionSpec extends SparkSpec {

  private def composedFrame() = {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // probe must be non-foldable: a literal's norm constant-folds before
    // the fusion batch runs, destroying the dot/(sqrt*sqrt) shape
    val probe = reverse(col("embedding"))
    emb.select(
      col("vec_id"),
      (VectorOps.dot(col("embedding"), probe) /
        (sqrt(VectorOps.dot(col("embedding"), col("embedding"))) *
          sqrt(VectorOps.dot(probe, probe)))).as("cos"))
  }

  private def fusedCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan
      .expressions.map(_.collect { case c: CosineSimFF => c }.size).sum

  private def withFusion[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CosineFusionRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == CosineFusionRule)
  }

  private def withAnsi[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", on.toString)
    try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("dot/(sqrt*sqrt) fuses into CosineSimFF with identical results") {
    withFusion {
      // LEGACY divide (ansi off): NULL-on-zero-divisor matches the kernel,
      // so the fusion is semantics-preserving and fires
      withAnsi(on = false) {
        val composed = composedFrame()
        val n = fusedCount(composed)
        assert(n == 1, s"expected 1 fused CosineSimFF node, found $n")
        // bit-identical to the native kernel called directly
        val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
        val probe = reverse(col("embedding"))
        val direct = emb.select(col("vec_id"),
          VectorOps.cosine(col("embedding"), probe).as("cos"))
        assert(composed.exceptAll(direct).count() == 0 &&
          direct.exceptAll(composed).count() == 0)
      }
    }
  }

  test("ANSI-mode divide is left unfused (error semantics preserved)") {
    withFusion {
      withAnsi(on = true) {
        // an ANSI Divide raises DIVIDE_BY_ZERO on a zero-norm vector; the
        // fused kernel would turn that into NULL — so the rule must not fire
        val n = fusedCount(composedFrame())
        assert(n == 0, s"ANSI spelling must stay composed, found $n fused nodes")
      }
    }
  }
}
