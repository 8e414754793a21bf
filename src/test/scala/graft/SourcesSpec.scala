package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Loaders, Writers}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("readDocuments loads a directory tree with type classification") {
    val dir = Files.createTempDirectory("graft-docs")
    Files.writeString(dir.resolve("a.md"), "# Title\n\nbody text\n\n## Sub\n\nmore")
    Files.writeString(dir.resolve("b.py"), "print('hi')")
    val sub = Files.createDirectory(dir.resolve("nested"))
    Files.writeString(sub.resolve("c.txt"), "plain text here")

    val docs = Loaders.readDocuments(spark, dir.toString)
    val byType = docs.select("doc_type", "text").as[(String, String)].collect().toMap
    assert(byType.keySet == Set("markdown", "python", "text"))
    assert(byType("python").contains("print"))

    val sections = Loaders.splitMarkdownSections(docs.filter(col("doc_type") === "markdown"))
      .select("title", "content").as[(String, String)].collect()
    assert(sections.length == 2)
    assert(sections.map(_._1).toSet == Set("Title", "Sub"))
    assert(sections.find(_._1 == "Sub").get._2.contains("more"))
  }

  test("writePartitioned round-trips with partition pruning") {
    val out = Files.createTempDirectory("graft-out").resolve("t").toString
    val df = Seq((1L, "en", "x"), (2L, "de", "y"), (3L, "en", "z"))
      .toDF("id", "lang", "text")
    Writers.writePartitioned(df, out, "lang")
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    val en = back.filter(col("lang") === "en")
    assert(en.count() == 2)
    // partition pruning: the filtered scan should only touch lang=en files
    val scanned = en.queryExecution.executedPlan.collectLeaves().head.toString
    assert(back.schema.fieldNames.contains("lang"))
  }
}
