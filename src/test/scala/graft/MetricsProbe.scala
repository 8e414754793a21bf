package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Phase-insensitive cost probe: runs registered queries under a listener
  * and reports jobs / stages / tasks / shuffle bytes — the numbers a plan
  * change moves deterministically, unlike local wall-clock (±15-20%
  * machine phase swings documented since r4).
  *
  *   sbt "Test/runMain graft.MetricsProbe <sfDir> <query,query,...>"
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1)
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("ann_graph", "ann_graph_upsert", "graph_components_del",
        "ann_ivf_cycle4", "graph_pagerank"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerOptimizerRules(spark)
    try graft.sources.Tables.lineitem(spark, dir).count()
    catch { case _: Throwable => () }

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val sw = new AtomicLong; val sr = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def sweep(): Unit = {
      try {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        spark.catalog.clearCache()
        graft.sources.Stores.clearSessionMemos()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    for (n <- names) {
      // rep 1 warms stores/codegen; rep 2 is the reported number
      for (rep <- 1 to 2) {
        sweep()
        jobs.set(0); stages.set(0); tasks.set(0); sw.set(0); sr.set(0)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        Thread.sleep(400) // let the listener bus drain
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[metrics] $n rep$rep jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} shufW=${sw.get / 1048576.0}%.1f MiB " +
          f"shufR=${sr.get / 1048576.0}%.1f MiB wall=$wall%.2f s")
      }
    }
    spark.stop()
  }
}
