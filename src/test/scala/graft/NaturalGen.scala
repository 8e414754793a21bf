package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic NATURAL-density embedding corpus — the complement of
  * StressGen's perturbed replicas: there, the exact top-k of every probe
  * is its own replica cluster (gap ~1e-4); here vectors scatter around
  * C cluster centers with a spread comparable to the center separation,
  * so nearest neighbors are genuinely-near OTHER points with varied gaps
  * — recall measures neighborhood retrieval, not duplicate routing.
  *
  * Fully derivable (the StressGen noise recipe): cluster c = vec_id mod C;
  * component j = center(c, j) + Spread·u(vec_id, j), with center and u
  * integer-hash uniforms — same corpus on every run, any engine. Schema
  * matches the embeddings table (vec_id, embedding float[], label), so
  * Tables.embeddings/Recall10x read it unchanged. Test-scope tool:
  *
  *   sbt "Test/runMain graft.NaturalGen <nVectors> <outDir>"
  */
object NaturalGen {
  val Clusters = 64
  val Dim = 64
  val Spread = 0.3

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val outDir = args.lift(1).getOrElse(s"/tmp/nat$n")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.range(n).select(
      col("id").as("vec_id"),
      expr(
        s"""transform(sequence(0, ${Dim - 1}), j -> cast(
           |  (cast(((id % $Clusters) * 2654435761L + j * 40503L + 7L) % 2000003L
           |        AS DOUBLE) / 2000003.0D * 2.0D - 1.0D)
           |  + $Spread * (cast((id * 31L + j * 40503L + 11L) % 1000003L
           |        AS DOUBLE) / 1000003.0D - 0.5D)
           |  AS FLOAT))""".stripMargin).as("embedding"),
      (col("id") % Clusters).cast("int").as("label"))
    emb.repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"natural corpus: $n vectors, $Clusters clusters -> $outDir")
    spark.stop()
  }
}
