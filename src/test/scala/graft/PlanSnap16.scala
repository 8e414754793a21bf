package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 per-query formatted-plan snapshots: `plans/r16/<name>_<suffix>.txt`
  * — the committed artifacts OPTIMIZATION_r16.md's plan claims are checked
  * against. Iterative queries execute eagerly during construction (their
  * registered frame is a checkpoint scan), so for those the snapshot is the
  * INNER loop-body frame built unexecuted (descent round, beam round,
  * pagerank/HITS rounds); `graph_components_del` and `ann_ivf_cycle4` are
  * dumped as their registered frames (the merge/read tail is where those
  * changes show).
  *
  *   sbt "Test/runMain graft.PlanSnap16 <suffix> [sfDir]"
  */
object PlanSnap16 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = "/root/repo/plans/r16"
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
        System.err.println(s"[plansnap16] $name failed: ${e.getMessage}")
      }
      println(s"[plansnap16] $name")
    }

    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)

    // ---- graph-ANN: seed pass, descent round, beam round -----------------
    snap("ann_graph_seed")(graft.operators.GraphAnn.seedPairsProbe(emb))
    locally {
      // rounds = 0 → the materialized seed graph; the dumped frame is ONE
      // descent round over it (the knnGraph loop body)
      val g0 = graft.operators.GraphAnn.knnGraph(emb, rounds = 0)
      snap("ann_descent_round")(
        graft.operators.GraphAnn.descentRound(g0, emb, cap = 64, kb = 16))
      val sym = g0.select(col("node"), col("nbr"))
        .unionAll(g0.select(col("nbr").as("node"), col("node").as("nbr")))
        .distinct().localCheckpoint()
      val probeDf = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      val beam0 = graft.operators.GraphAnn.beamRoundProbe(
        probeDf.select(col("probe_id"), col("probe_id").as("node")),
        sym, emb, probeDf).localCheckpoint()
      snap("ann_beam_round")(
        graft.operators.GraphAnn.beamRoundProbe(beam0, sym, emb, probeDf))
    }

    // ---- CC family: the delete gate form (one labeling subtree) + the
    // unchanged propagate round for continuity ----------------------------
    snap("labelprop_round")(
      graft.operators.GraphOps.labelPropRoundProbe(
        graft.operators.GraphOps.copurchase(li)))
    snap("graph_components_del")(SparkEntry.queries("graph_components_del")(spark, sfDir))

    // ---- delta-store merge-on-read: the 4-segment IVF read path ---------
    snap("ann_ivf_cycle4")(SparkEntry.queries("ann_ivf_cycle4")(spark, sfDir))

    // ---- rank family loop bodies (r15 verdict item 9 spot-check) --------
    snap("graph_pagerank_round")(
      graft.operators.GraphOps.pageRankRoundProbe(
        graft.operators.GraphOps.copurchase(li)))
    snap("graph_hits_round")(
      graft.operators.GraphOps.hitsRoundProbe(
        graft.operators.GraphOps.hitsEdges(li)))

    spark.stop()
  }
}
