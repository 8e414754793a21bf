package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Embedding}
import graft.sources.{Loaders, Writers}

/** End-to-end ingestion → store → retrieval: the reference's whole pipeline
  * (loaders → transformers → embeddings → storers → query) as one flow
  * through real files on disk.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ingest a doc tree, chunk, embed, store partitioned, retrieve") {
    // 1. ingest: a small corpus on disk
    val dir = Files.createTempDirectory("graft-pipe")
    Files.writeString(dir.resolve("spark.md"), "# Spark\n\n" + ("fast query engine " * 40))
    Files.writeString(dir.resolve("ducks.txt"), "ducks pond water feathers " * 40)
    Files.writeString(dir.resolve("mixed.txt"), "fast query ducks " * 40)
    val w = org.apache.spark.sql.expressions.Window.orderBy("path")
    // deterministic small ids by path order: ducks=0, mixed=1, spark.md=2
    val docs = Loaders.readDocuments(spark, dir.toString)
      .withColumn("doc_id", row_number().over(w).cast("long") - 1)
    assert(docs.count() == 3)

    // 2. chunk + embed
    val chunks = Chunking.chunkFixed(docs.select(col("doc_id"), col("text")))
    assert(chunks.count() > 3) // docs exceed one chunk each
    val embedded = Embedding.embed(
      chunks.select((col("doc_id") * 1000 + col("chunk_index")).as("chunk_id"), col("chunk_text")),
      "chunk_id", "chunk_text")

    // 3. store partitioned parquet and read back
    val out = Files.createTempDirectory("graft-pipe-out").resolve("emb").toString
    Writers.writePartitioned(
      embedded.withColumn("shard", pmod(col("id"), lit(2L))), out, "shard")
    val index = spark.read.parquet(out)
      .select(col("id").cast("long").as("vec_id"), col("embedding"))
    assert(index.count() == embedded.count())

    // 4. retrieve: a probe written like the spark doc should hit its own
    //    chunks (spark.md = doc 2 → vec ids in [2000, 3000))
    val probeDocs = Seq((0L, "fast query engine fast query engine"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val hits = Embedding.ragRetrieve(probeDocs, index, nProbeDocs = 1, k = 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(hits.length == 3)
    val top = hits.minBy(_._3)
    assert(top._2 >= 2000L && top._2 < 3000L,
      s"expected a spark.md chunk as top hit, got vec ${top._2}")
  }
}
