package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Zipfian-vocabulary stress corpus for the sparse family (r10 verdict
  * item 6): the clique tier (StressGen) duplicates payloads — the dedup
  * WORST case, where every shared-term posting is a true near-dup — but
  * real corpora share terms through a skewed vocabulary, not through
  * duplication. This generator emits documents whose term stream follows
  * Zipf(1) over a V-type vocabulary via the log-uniform inverse-CDF trick
  * (t = floor(V^u) has p(t) ∝ 1/t), with u the SAME integer-hash noise
  * recipe StressGen uses for embedding perturbation — fully deterministic,
  * no RNG. Head terms (t1, t2, …) appear in nearly every doc (stopword
  * df), the tail is rare — exactly the df profile the sparse prefix
  * filter's df-desc term order is designed around.
  *
  *   sbt "Test/runMain graft.ZipfGen <nDocs> <outDir> [vocab] [len]"
  *
  * Output: documents.parquet with the standard schema (doc_id, text, lang,
  * source, n_chars) so Tables.documents and the sparse operators run
  * unchanged.
  */
object ZipfGen {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val outDir = args.lift(1).getOrElse("/tmp/zipf10")
    val vocab = args.lift(2).map(_.toInt).getOrElse(50000)
    val len = args.lift(3).map(_.toInt).getOrElse(80)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lnV = math.log(vocab.toDouble)
    val docs = spark.range(1, nDocs + 1L).as[Long].mapPartitions(_.map { id =>
      // per-doc length jitter (deterministic) keeps doclens non-degenerate
      val L = len / 2 + (id % len).toInt
      val sb = new StringBuilder
      var j = 0
      while (j < L) {
        // the StressGen hash recipe, keyed on (doc, position)
        val u = (((id * 2654435761L + j * 40503L) % 1000003L + 1000003L)
          % 1000003L).toDouble / 1000003.0
        // V^u for u∈[0,1) spans [1, V): floor lands in [1, V-1] ALWAYS (no
        // clamps needed), so the head term t1 exists and the support is
        // [1, V-1] — term tV is never emitted; its lost mass ~1/(V·H_V) is
        // negligible for a stress tier. (The former +1 shifted the support
        // to [2, V] and t1 never appeared.)
        val t = math.floor(math.exp(u * lnV)).toLong
        if (j > 0) sb.append(' ')
        sb.append('t').append(t)
        j += 1
      }
      val text = sb.toString
      (id, text, "en", "zipf", text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(8).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"zipf corpus: $nDocs docs, vocab=$vocab, len~[${len / 2},${len / 2 + len}) -> $outDir")
    spark.stop()
  }
}
