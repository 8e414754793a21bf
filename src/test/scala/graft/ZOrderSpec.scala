package graft

import org.apache.spark.sql.functions._

import graft.sources.{Tables, Writers}

/** Z-order layout: the bit interleave must match the textbook Morton code,
  * and the clustered write must preserve content while tightening per-file
  * min/max ranges on BOTH keys (the property parquet skipping relies on).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def morton(a: Long, b: Long, bits: Int = 16): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder2 equals the textbook Morton interleave") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Writers.zorder2(col("a"), col("b")).as("z"))
    df.as[(Long, Long, Long)].collect().foreach { case (a, b, z) =>
      assert(z == morton(a, b), s"z($a,$b)")
    }
  }

  test("writeZOrdered preserves content and tightens per-file key ranges") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Writers.writeZOrdered(li, s"$dir/z", "l_orderkey", "l_partkey")
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == li.count())
    assert(back.exceptAll(li).count() == 0 && li.exceptAll(back).count() == 0)
    // locality: the per-file span of l_orderkey must be far below the
    // global span for most files (that spread is exactly what min/max
    // pruning exploits); a random layout gives ~global span everywhere
    val spans = back.withColumn("f", input_file_name())
      .groupBy("f").agg((max("l_orderkey") - min("l_orderkey")).as("span"))
      .as[(String, Long)].collect().map(_._2)
    val global = li.agg(max("l_orderkey") - min("l_orderkey")).head.getLong(0)
    assert(spans.count(_ < global / 2) >= spans.length / 2,
      s"z-order produced no locality: spans=${spans.toSeq.sorted} global=$global")
  }
}
