package graft

import java.nio.file.Files

import graft.operators.GraphOps

class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  // ring of 6 parts on sampled order keys (copurchase keeps l_orderkey % 100 == 0)
  private def lineitem = Seq(
    (100L, 1L), (100L, 2L), (200L, 2L), (200L, 3L), (300L, 3L), (300L, 4L))
    .toDF("l_orderkey", "l_partkey")
    .withColumn("l_suppkey", org.apache.spark.sql.functions.lit(1L))

  test("reliable checkpoint mode produces identical results to localCheckpoint") {
    val local = GraphOps.shortestPaths(lineitem).as[(Long, Long)].collect().toSet
    val dir = Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      val reliable = GraphOps.shortestPaths(lineitem).as[(Long, Long)].collect().toSet
      assert(reliable == local && reliable.nonEmpty)
      // the reliable path must actually write checkpoint data to the dir
      val written = Files.walk(dir).filter(Files.isRegularFile(_)).count()
      assert(written > 0)
    } finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
  }
}
