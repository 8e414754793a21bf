package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the Delta/Iceberg OPTIMIZE primitive:
  * given a manifest of file sizes per table partition, assign files to
  * target-size output bins so a rewrite job can coalesce them. Greedy
  * NEXT-FIT over files ordered size-desc (doc_id tie-break): a file opens a
  * new bin when it would overflow the current one; oversized files get a
  * bin of their own.
  *
  * Scale shape: the fold is sequential ONLY within one table partition's
  * manifest (thousands of entries — driver-of-one-partition scale by
  * construction; a manifest is metadata, not data), and partitions plan in
  * parallel via groupByKey. The corpus itself never moves — this emits the
  * plan the rewrite job executes.
  *
  * Oracle: DuckDB replays the identical fold with list_reduce over the
  * size-desc list, packing (current-fill | bin-csv) into one VARCHAR
  * accumulator (the chunk_words packed-state precedent), then zips the csv
  * back to the ordered file list — bin assignments hash-match exactly.
  */
object Compaction {

  /** (source, doc_id, n_chars, bin): `documents` stands in for the file
    * manifest — source ≙ table partition, n_chars ≙ file size. */
  def compactionPlan(documents: DataFrame, capacity: Long = 4000L): DataFrame = {
    require(capacity > 0L, s"capacity must be positive: $capacity")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (src, it) =>
        val files = it.toArray.sortBy(t => (-t._3, t._2))
        var bin = 0L
        var fill = 0L
        files.iterator.map { case (_, id, sz) =>
          if (fill + sz > capacity && fill > 0L) { bin += 1L; fill = sz }
          else fill += sz
          (src, id, sz, bin)
        }
      }
      .toDF("source", "doc_id", "n_chars", "bin")
  }

  def compactionPlanSql(capacity: Long = 4000L): String = {
    // packed accumulator: "<fill>|<bin-csv>"; helpers parse it per step
    val fill = "CAST(string_split(acc, '|')[1] AS BIGINT)"
    val csv = "string_split(acc, '|')[2]"
    val last = s"CASE WHEN $csv = '' THEN 0 ELSE CAST(string_split($csv, ',')[-1] AS BIGINT) END"
    val szi = "CAST(sz AS BIGINT)"
    s"""WITH g AS (
       |  SELECT source,
       |    list(struct_pack(id := doc_id, sz := n_chars)
       |         ORDER BY n_chars DESC, doc_id) AS lst
       |  FROM documents GROUP BY source),
       |st AS (
       |  SELECT source, lst, list_reduce(
       |    list_prepend('0|', list_transform(lst, x -> CAST(x.sz AS VARCHAR))),
       |    (acc, sz) -> CASE
       |      WHEN $fill + $szi > $capacity AND $fill > 0
       |      THEN $szi || '|' || (CASE WHEN $csv = '' THEN '' ELSE $csv || ',' END)
       |           || CAST($last + 1 AS VARCHAR)
       |      ELSE ($fill + $szi) || '|' || (CASE WHEN $csv = '' THEN '' ELSE $csv || ',' END)
       |           || CAST(CASE WHEN $csv = '' THEN 0 ELSE $last END AS VARCHAR)
       |    END) AS s
       |  FROM g)
       |SELECT source, lst[i].id AS doc_id, lst[i].sz AS n_chars,
       |  CAST(string_split(string_split(s, '|')[2], ',')[i] AS BIGINT) AS bin
       |FROM st CROSS JOIN (SELECT unnest(range(1, 10001)) AS i) r
       |WHERE i <= len(lst)""".stripMargin
  }
}
