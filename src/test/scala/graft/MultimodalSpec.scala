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

  test("frameSample slices strided fixed-span frames with a full tail") {
    val big = Seq((7L, "ab" * 600)).toDF("doc_id", "text")  // 1200 bytes
    val frames = Multimodal.frameSample(big, frameBytes = 256, every = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    // 1200 bytes → 5 frames (0..4); stride 2 keeps 0, 2, 4
    assert(frames.map(_._2).toSeq == Seq(0L, 2L, 4L))
    assert(frames.take(2).forall(_._4 == 256L))
    assert(frames.last._4 == 1200 - 4 * 256)   // tail frame is short
    // identical content → identical digests (frames 0 and 2 repeat "ab")
    assert(frames(0)._3 == frames(1)._3)
  }

  test("resizeBatch subsamples to the pixel budget and keeps small payloads") {
    val mixed = Seq((1L, "x" * 10000), (2L, "tiny")).toDF("doc_id", "text")
    val r = Multimodal.resizeBatch(mixed, targetW = 8, targetH = 8)
      .select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(r(1L) == 64L)    // 10000 bytes subsampled to 8x8 budget
    assert(r(2L) == 4L)     // under budget: untouched
    val digests = Multimodal.resizeDigest(mixed)
      .select("doc_id", "payload_digest").as[(Long, String)].collect().toMap
    assert(digests.values.forall(_.length == 32))
  }

  test("batch features are deterministic across runs") {
    val a = Multimodal.batchFeatures(docs).collect().map(_.toString).sorted.toSeq
    val b = Multimodal.batchFeatures(docs).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
