package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT dot_product(a, b) ...")` works anywhere
  * (including pure-SQL deployments):
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductFF].getName, "dot_product"),
      GraftFunctions.dotProductBuilder))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimFF].getName, "cosine_sim"),
      GraftFunctions.cosineSimBuilder))
    GraftFunctions.optimizerRules.foreach(r => ext.injectOptimizerRule(_ => r))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftFunctions {
  /** The optimizer rules [[GraftExtensions]] injects — the ONE list that
    * bench/verify/plan-audit/plan-snapshot sessions register post-
    * construction, so the plans those surfaces measure, hash, audit, and
    * snapshot can never drift from each other by a missed call site. */
  val optimizerRules: Seq[org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    Seq(CosineFusionRule, CosinePrenormRule)

  /** Register [[optimizerRules]] on a RUNNING session (extensions only
    * apply at construction); idempotent, and synchronized like
    * [[graft.plans.AsofJoin.ensureStrategy]] — extraOptimizations is a
    * plain var, so an unsynchronized read-modify-write from two threads
    * sharing a getOrCreate session could drop a rule. */
  def registerOptimizerRules(spark: org.apache.spark.sql.SparkSession): Unit =
    synchronized {
      val cur = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations =
        cur ++ optimizerRules.filterNot(cur.contains)
    }

  val dotProductBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] => DotProductFF = { children =>
    require(children.length == 2, "dot_product expects exactly 2 arguments")
    DotProductFF(children(0), children(1))
  }

  val cosineSimBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] => CosineSimFF = { children =>
    require(children.length == 2, "cosine_sim expects exactly 2 arguments")
    CosineSimFF(children(0), children(1))
  }

  /** Register on an already-running session (extensions only apply at
    * session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerTempFunction(
      spark, "dot_product", dotProductBuilder)
    org.apache.spark.sql.graftbridge.Bridge.registerTempFunction(
      spark, "cosine_sim", cosineSimBuilder)
  }
}
