package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-query formatted-plan snapshots for the OPTIMIZATION rounds:
  * `plans/r15/<name>_<suffix>.txt`, one file per query, so a plan claim in
  * OPTIMIZATION_r15.md ("2 Exchange -> 1") is checkable against committed
  * artifacts. Iterative queries execute eagerly during construction (their
  * registered frame is a checkpoint scan), so for those the snapshot is the
  * INNER per-round frame built unexecuted — that is where a loop-body
  * optimization shows.
  *
  *   sbt "Test/runMain graft.PlanSnap <suffix> [sfDir]"
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = "/root/repo/plans/r15"
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerOptimizerRules(spark)

    def fmt(df: DataFrame): String = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    def snap(name: String)(df: => DataFrame): Unit = {
      try Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
        fmt(df).getBytes(StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[plansnap] $name failed: ${e.getMessage}")
      }
      println(s"[plansnap] $name")
    }

    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)

    // ---- labelPropagation round-1 propagate frame (the CC/resolve family
    // loop body: graph_components(+inc/del/stores), dedup_resolve*) -------
    snap("labelprop_round")(
      graft.operators.GraphOps.labelPropRoundProbe(
        graft.operators.GraphOps.copurchase(li)))

    // ---- knnGraph seed pass (ann_graph family build front) --------------
    snap("ann_graph_seed")(graft.operators.GraphAnn.seedPairsProbe(emb))

    // ---- lazy registered queries whose full plan is meaningful ----------
    Seq("graph_hits", "sparse_cosine", "export_graph").foreach { n =>
      snap(n)(SparkEntry.queries(n)(spark, sfDir))
    }
    spark.stop()
  }
}
