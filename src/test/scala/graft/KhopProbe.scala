package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** r11 one-shot: decompose graph_khop at a stress tier into edge-derive
  * (scan-bound) vs frontier-join vs final-dedup cost.
  *   sbt "Test/runMain graft.KhopProbe <dir>" */
object KhopProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loadAvg(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[khop] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    println(f"[khop] dir=$dir load=${loadAvg()}%.1f")
    val cust = graft.sources.Tables.customer(spark, dir)
    val ord = graft.sources.Tables.orders(spark, dir)
    val li = graft.sources.Tables.lineitem(spark, dir)
    // stage 1: edge derive + repartition + persist (the one edge shuffle)
    val eSrc = graft.operators.GraphOps.edges(ord, li).select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    val ne = time("edges derive+shuffle+persist")(eSrc.count())
    println(s"[khop] n_edges=$ne")
    // stage 2+3: the two frontier joins, each materialized
    var frontier = cust.filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").cast("long").as("node"), lit(0L).as("hops"))
      .localCheckpoint()
    var all = frontier
    println(s"[khop] n_seeds=${frontier.count()}")
    for (h <- 1 to 2) {
      frontier = time(s"hop$h join+distinct") {
        val f = frontier.hint("SHUFFLE_HASH").join(eSrc, col("node") === col("src"))
          .select(col("dst").as("node"), lit(h.toLong).as("hops"))
          .distinct().localCheckpoint()
        println(s"[khop] frontier$h=${f.count()}")
        f
      }
      all = all.unionAll(frontier)
    }
    time("final groupBy-min")(all.groupBy("node").agg(min(col("hops")).as("hops")).count())
    // reference: full end-to-end as the bench measures it
    time("end-to-end khop")(graft.operators.GraphOps.khop(cust, ord, li).count())
    spark.stop()
  }
}
