package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "binary-ish éè"))
    .toDF("doc_id", "text")

  test("metadata carries typed media fields for every row") {
    val m = Multimodal.metadata(docs).as[(Long, String, Long, Long, Long)].collect()
    assert(m.length == 3)
    assert(m.forall(_._2 == "image/fake"))
    assert(m.forall(r => r._4 >= 1 && r._4 <= 1920 && r._5 >= 1 && r._5 <= 1080))
    // n_bytes is the UTF-8 payload size, not the char count
    assert(m.find(_._1 == 3L).get._3 > "binary-ish xx".length)
  }

  test("batchFeatures computes per-row byte stats via mapPartitions") {
    val f = Multimodal.batchFeatures(docs).as[(Long, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(f.size == 3)
    val hello = f(1L)
    assert(hello._4 == "hello world".length)
    assert(hello._2 > 0 && hello._3 >= 0)
    val empty = f(2L)
    assert(empty._2 == 0.0 && empty._4 == 0L)
  }

  test("batch features are deterministic across runs") {
    val a = Multimodal.batchFeatures(docs).collect().map(_.toString).sorted.toSeq
    val b = Multimodal.batchFeatures(docs).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
