package graft
import org.apache.spark.sql.SparkSession

/** Stage decomposition of the IVF-PQ delete-store read path vs the
  * from-scratch rebuild: store build (ingest), model load (memoized
  * after r15), cold + warm serving calls, scratch. The structural claim
  * the r15 model persistence makes — serving cost is corpus-size-
  * INDEPENDENT while scratch scales — reads directly off the 10×/100×
  * pair (STRESS_pq_model_r15.json).
  *
  *   sbt "Test/runMain graft.PqProfile <sfDir>"
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    emb.count()
    def t(l: String)(b: => Any): Unit = {
      val t0 = System.nanoTime(); val r = b
      println(f"[pqprof] $l: ${(System.nanoTime()-t0)/1e9}%.2f s ($r)")
    }
    t("codes store build+model")(graft.sources.Stores.ivfPqCodesStore(spark, dir).count())
    t("model load only")(graft.sources.Stores.ivfPqModelStore(spark, dir)._1.length)
    t("model load again")(graft.sources.Stores.ivfPqModelStore(spark, dir)._1.length)
    t("delete_store call 1")(graft.sources.Stores.ivfPqDeleteStore(spark, dir).count())
    t("delete_store call 2")(graft.sources.Stores.ivfPqDeleteStore(spark, dir).count())
    t("scratch ivfPqDelete")(graft.operators.ProductQuant.ivfPqDelete(emb).count())
    spark.stop()
  }
}
