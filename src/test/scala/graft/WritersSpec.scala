package graft

import java.io.File

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.functions._

import graft.sources.Writers

/** The writers' parquet row-group bound, verified from the FOOTERS: a
  * single oversized row group is unsplittable (one scan task per file no
  * matter the cluster), so Writers pins parquet.block.size — this spec
  * writes data several times that bound and asserts the files actually
  * carry multiple row groups, each near the bound (SURVEY §5 / r08
  * verdict item 8: the round-5 stress trap must not resurrect through the
  * repo's own writers). */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  private def rowGroupCounts(dir: File): Seq[(String, Seq[Long])] = {
    def parquetFiles(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    val conf = spark.sessionState.newHadoopConf()
    parquetFiles(dir).map { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        import scala.jdk.CollectionConverters._
        f.getName -> reader.getFooter.getBlocks.asScala.toSeq
          .map(_.getTotalByteSize)
      } finally reader.close()
    }
  }

  test("writePartitioned output honors the bounded row-group size") {
    val out = new File(java.nio.file.Files.createTempDirectory("graft_writers").toFile, "t")
    val bound = 256L * 1024 // shrink the bound so the spec stays small
    spark.conf.set("spark.graft.parquetBlockBytes", bound.toString)
    try {
      // ~6 MiB of incompressible-ish payload in ONE output partition —
      // far over the bound, so a compliant writer MUST split row groups
      val df = spark.range(0, 20000, 1, 1).select(
        lit("a").as("p"),
        concat_ws("-", col("id"),
          sha2(col("id").cast("string"), 512),
          sha2((col("id") * 7).cast("string"), 512)).as("payload"))
      Writers.writePartitioned(df, out.getAbsolutePath, "p")
      val footers = rowGroupCounts(out)
      assert(footers.nonEmpty, "no parquet files written")
      val allGroups = footers.flatMap(_._2)
      assert(allGroups.size >= 2,
        s"expected the bound to split row groups, got $footers")
      // parquet's size check is estimate-based (every ~100 rows), so allow
      // slack — the trap being excluded is the ONE-giant-row-group file
      assert(allGroups.forall(_ <= bound * 8),
        s"row group far above the bound: $footers")
    } finally {
      spark.conf.unset("spark.graft.parquetBlockBytes")
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(out.getParentFile)
    }
  }
}
