package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of the connected-components family cost: the
  * co-purchase edge derivation, then labelPropagation round by round
  * (propagate-materialize / changed-count / jump-materialize split), so
  * the optimization round targets the stage that actually dominates.
  * Mirrors the r15 loop shape: self-looped sym (no per-round update
  * join), lazy labels0, one jump per round.
  *
  *   sbt "Test/runMain graft.CcCostProbe <sfDir>"
  */
object CcCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerOptimizerRules(spark)
    val li = graft.sources.Tables.lineitem(spark, dir)
    li.count()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[cccost] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val edgeTable = graft.operators.GraphOps.copurchase(li)
    t("copurchase.count")(println("  edges=" + edgeTable.count()))
    val edges = t("edges.localCheckpoint()")(
      edgeTable.select(col("src"), col("dst")).localCheckpoint())
    // replicate the r15 labelPropagation loop with per-stage timing
    val sym0 = edges.unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val sym = t("sym.persist+count") {
      val s = sym0.select(col("src"), col("dst"), lit(false).as("self"))
        .unionAll(sym0.select(col("src")).distinct()
          .select(col("src"), col("src").as("dst"), lit(true).as("self")))
        .repartition(col("src")).persist()
      println("  sym=" + s.count()); s
    }
    var labels = sym.filter(col("self")).select(col("src").as("node"))
      .withColumn("label", col("node"))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < 30) {
      val propagated = t(s"round=$it propagate.materialize") {
        sym.join(labels.hint("SHUFFLE_HASH"), col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(min(col("label")).as("new_label"),
            min(when(col("self"), col("label"))).as("old_label"))
          .select(col("dst").as("node"), col("new_label"),
            (col("new_label") < col("old_label")).as("chg")).localCheckpoint()
      }
      changed = t(s"round=$it chg.count")(propagated.filter(col("chg")).count())
      val cur = propagated.select(col("node"), col("new_label").as("label"))
      labels = t(s"round=$it jump.materialize") {
        cur.as("a")
          .join(cur.select(col("node").as("ln"), col("label").as("ll")).as("b"),
            col("a.label") === col("b.ln"), "left_outer")
          .select(col("a.node").as("node"),
            least(col("a.label"), coalesce(col("ll"), col("a.label"))).as("label")).localCheckpoint()
      }
      it += 1
      println(s"[cccost] round=${it - 1} changed=$changed")
    }
    spark.stop()
  }
}
