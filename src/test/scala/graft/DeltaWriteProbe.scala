package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GraphAnn}
import graft.sources.Writers

/** WRITE-I/O A/B for the r15 delta-segment conversion: per maintenance
  * cycle, the cost of persisting the FULL maintained artifact (the r14
  * shape — overwrite.saveAsTable of the whole index) vs the O(Δ) delta
  * segment (upserts + tombstones). Inputs are localCheckpointed first so
  * the probe times ONLY the write; run at 1× and 10× to show the delta
  * write no longer scales with index size while the full write does.
  *
  *   sbt "Test/runMain graft.DeltaWriteProbe <sfDir> [families]"
  */
object DeltaWriteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fams = args.lift(1).map(_.split(",").toSet).getOrElse(Set("ivf", "graph"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    emb.count()
    def vCyc(r: Long) = pmod(col("vec_id"), lit(20L)) === r
    def t[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def drop(tbl: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      // a fresh JVM's in-memory catalog doesn't own last run's location
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, tbl.toLowerCase)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def report(fam: String, fullRows: Long, deltaRows: Long,
               secFull: Double, secDelta: Double): Unit =
      println(s"""{"probe":"delta_write","family":"$fam","dir":"$dir",""" +
        s""""rows_full":$fullRows,"rows_delta":$deltaRows,""" +
        s""""sec_write_full":${f(secFull)},"sec_write_delta":${f(secDelta)},""" +
        s""""write_ratio":${f(secFull / secDelta)}}""")

    if (fams("ivf")) {
      val cents = Dedup.frozenCents(emb, 16)
      val base = Dedup.ivfAssign(emb.filter(!vCyc(0L) && !vCyc(10L)), cents)
      val arr1 = Dedup.ivfAssign(emb.filter(vCyc(0L)), cents).localCheckpoint()
      val dep1 = emb.filter(vCyc(5L)).select(col("vec_id")).localCheckpoint()
      val full1 = base.unionByName(arr1)
        .join(broadcast(dep1), Seq("vec_id"), "left_anti").localCheckpoint()
      drop("probe_ivf_full"); drop("probe_ivf_u"); drop("probe_ivf_t")
      val secFull = t(Writers.writeBucketedCols(full1, "probe_ivf_full", Seq("cell"), 16))
      val secDelta = t {
        arr1.write.mode("overwrite").saveAsTable("probe_ivf_u")
        dep1.write.mode("overwrite").saveAsTable("probe_ivf_t")
      }
      report("ivf", full1.count(), arr1.count() + dep1.count(), secFull, secDelta)
    }
    if (fams("graph")) {
      val gBase = GraphAnn.knnGraph(emb.filter(!vCyc(0L) && !vCyc(10L)))
      val delta = GraphAnn.upsertedGraphDelta(gBase,
        emb.filter(!vCyc(10L)), arrPred = vCyc(0L)).localCheckpoint()
      val full1 = gBase
        .join(delta.select(col("node")).distinct(), Seq("node"), "left_anti")
        .unionByName(delta).localCheckpoint()
      drop("probe_g_full"); drop("probe_g_u")
      val secFull = t(Writers.writeBucketedCols(full1, "probe_g_full", Seq("node"), 32))
      val secDelta = t(delta.write.mode("overwrite").saveAsTable("probe_g_u"))
      report("graph", full1.count(), delta.count(), secFull, secDelta)
    }
    spark.stop()
  }
}
