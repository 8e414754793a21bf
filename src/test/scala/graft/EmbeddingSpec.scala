package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, VectorOps}
import graft.operators.Embedding

class EmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "pack my box with five dozen liquor jugs"),
    (2L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  test("embeddings are deterministic, unit-norm, and equal for equal text") {
    val e = Embedding.embed(docs, "doc_id", "text")
      .as[(Long, Array[Float])].collect().map(r => r._1 -> r._2.toSeq).toMap
    assert(e.size == 3)
    assert(e(0L) == e(2L))
    assert(e(0L) != e(1L))
    val norm = math.sqrt(e(0L).map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("ragRetrieve returns k index hits per probe chunk") {
    val index = Seq(
      (100L, Embedding.embedKernel("the quick brown fox", 64), 0),
      (101L, Embedding.embedKernel("liquor jugs galore", 64), 0),
      (102L, Embedding.embedKernel("unrelated text entirely", 64), 0))
      .toDF("vec_id", "embedding", "label")
    val docsWithMeta = docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Embedding.ragRetrieve(docsWithMeta, index, nProbeDocs = 2, k = 2)
      .as[(Long, Long, Long, Double)].collect()
    val byChunk = out.groupBy(_._1)
    assert(byChunk.size == 2) // doc 0 and doc 1, one chunk each
    assert(byChunk.values.forall(_.length == 2))
    // doc 0's chunk should rank the fox vector first
    assert(byChunk(0L).minBy(_._3)._2 == 100L)
  }

  test("dot_product is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .as[Double].head()
    assert(r == 11.0)
  }

  test("cosine_sim SQL function and fused kernel match composed dot form") {
    GraftFunctions.register(spark)
    val df = Seq((Array.tabulate(64)(i => (i * 0.37 - 5).toFloat),
                  Array.tabulate(64)(i => (3.1 - i * 0.11).toFloat))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val fused = df.select(VectorOps.cosine(col("a"), col("b"))).as[Double].head()
    val composed = df.select(
      VectorOps.dot(col("a"), col("b")) /
        (sqrt(VectorOps.dot(col("a"), col("a"))) * sqrt(VectorOps.dot(col("b"), col("b")))))
      .as[Double].head()
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM vecs").as[Double].head()
    assert(fused == composed && viaSql == fused)
  }

  test("native dot matches the HOF formulation bit-exactly") {
    val df = Seq((Array.tabulate(64)(i => (i * 0.37 - 5).toFloat),
                  Array.tabulate(64)(i => (3.1 - i * 0.11).toFloat))).toDF("a", "b")
    val native = df.select(VectorOps.dot(col("a"), col("b"))).as[Double].head()
    val hof = df.select(VectorOps.dotHof(col("a"), col("b"))).as[Double].head()
    assert(native == hof)
  }
}
