package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness (not part of the library surface)
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    import graft.operators._
    val terms = Seq("filter", "join", "window")
    t("pack_a")(PackBuilder.pack(docs, terms).count())
    t("pack_a2")(PackBuilder.pack(docs, terms).count())
    // variant: persist the post-range-exchange slice table
    locally {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      def occ(term: String) =
        ((length(col("text")) - length(regexp_replace(col("text"), java.util.regex.Pattern.quote(term), ""))) / term.length).cast("long")
      val kw = terms.map(occ).reduce(_ + _)
      val nParts = spark.sessionState.conf.numShufflePartitions
      def run(): Long = {
        val sliced = docs
          .withColumn("score", kw)
          .filter(col("score") > 0)
          .select(col("doc_id").cast("long"), col("score"), col("n_chars").cast("long"))
          .repartitionByRange(nParts, desc("score"), col("doc_id"))
          .sortWithinPartitions(desc("score"), col("doc_id"))
        val withLocal = sliced.as[(Long, Long, Long)].rdd
          .mapPartitionsWithIndex { (pid, it) =>
            var cum = 0L
            it.map { case (id, sc, nc) => cum += nc; (pid, id, sc, cum) }
          }
          .toDF("pid", "doc_id", "score", "local_cum")
          .persist()
        val off = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
        val offsets = withLocal.groupBy(col("pid"))
          .agg(max(col("local_cum")).as("slice_total"))
          .withColumn("offset", coalesce(sum(col("slice_total")).over(off), lit(0L)))
          .select(col("pid"), col("offset"))
        val n = withLocal.join(broadcast(offsets), Seq("pid"))
          .withColumn("cum_chars", col("local_cum") + col("offset"))
          .filter(col("cum_chars") <= 4000L)
          .select(col("doc_id"), col("score"), col("cum_chars")).count()
        withLocal.unpersist()
        n
      }
      t("pack_persist")(run())
      t("pack_persist2")(run())
    }
    spark.stop()
  }
}
