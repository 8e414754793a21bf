package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-format document loading — the reference's ingestion loaders
  * (services/pipeline/loaders.py: markdown/code/plain-text with per-type
  * routing) re-expressed as distributed readers: whole files in parallel via
  * binaryFile (no driver-side walking), language/type classified from the
  * path, ready to feed Chunking/Embedding.
  */
object Loaders {

  private val extLang: Seq[(String, String)] = Seq(
    ".md" -> "markdown", ".py" -> "python", ".scala" -> "scala",
    ".java" -> "java", ".sql" -> "sql", ".json" -> "json", ".txt" -> "text")

  /** Classify a path column into the reference's document types. */
  def docType(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    extLang.foldRight(lit("unknown")) { case ((ext, lang), acc) =>
      when(lower(path).endsWith(ext), lang).otherwise(acc)
    }

  /** Read a directory tree of text-ish documents as (path, doc_type, text,
    * n_bytes) — `binaryFile` scans in parallel across executors; decoding is
    * a narrow transform. */
  def readDocuments(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        col("path"),
        docType(col("path")).as("doc_type"),
        decode(col("content"), "UTF-8").as("text"),
        col("length").as("n_bytes"))

  /** Markdown header split (transformers.py:91 _split_by_headers): explode a
    * markdown document into (header, section) rows — distributed, per-doc. */
  def splitMarkdownSections(docs: DataFrame): DataFrame =
    docs
      .withColumn("section", explode(split(col("text"), "(?m)^(?=#{1,6} )")))
      .filter(length(trim(col("section"))) > 0)
      .withColumn("header",
        when(col("section").startsWith("#"),
          trim(regexp_extract(col("section"), "^(#{1,6} [^\n]*)", 1)))
          .otherwise(lit(null)))
      .select(col("path"), col("header"), col("section"))
}
