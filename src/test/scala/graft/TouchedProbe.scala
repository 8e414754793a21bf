package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** r11: touched-component fraction + scoped-vs-full A/B for
  * componentsDeleteFrom as a function of delete-batch size.
  *   Test/runMain graft.TouchedProbe <dir> [mod...] */
object TouchedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val mods = if (args.length > 1) args.drop(1).map(_.toLong).toSeq else Seq(1000L, 10000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.ansi.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.sources.Tables.lineitem(spark, dir)
    val labels = graft.operators.GraphOps.connectedComponents(li).localCheckpoint()
    val total = labels.count()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime()-t0)/1e9)
    }
    mods.foreach { mod =>
      val isDel = pmod(col("l_orderkey"), lit(mod)) === 0L
      val delE = graft.operators.GraphOps.copurchase(li.filter(isDel)).localCheckpoint()
      val delN = delE.select(explode(array(col("src"),col("dst"))).as("node")).distinct()
      val touched = delN.join(labels,"node").select("label").distinct()
      val nTouchedNodes = labels.join(touched,"label").count()
      val (nScoped, tScoped) = time {
        graft.operators.GraphOps.componentsDeleteFrom(labels,
          graft.operators.GraphOps.copurchase(li.filter(!isDel)), delE).count()
      }
      val (nFull, tFull) = time {
        graft.operators.GraphOps.connectedComponents(li.filter(!isDel)).count()
      }
      println(f"[touched] mod=$mod touched_nodes=$nTouchedNodes/${total} (${nTouchedNodes*100.0/total}%.1f%%) scoped=${tScoped}%.1fs full=${tFull}%.1fs agree=${nScoped==nFull} rows=$nScoped")
    }
    spark.stop()
  }
}
