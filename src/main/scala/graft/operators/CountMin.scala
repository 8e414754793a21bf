package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch term-frequency estimation — the fixed-memory streaming
  * counterpart of term_freq (Cormode & Muthukrishnan 2005). d hash rows ×
  * width cells; every occurrence increments one cell per row; the estimate
  * for a term is the MIN over its d cells — always ≥ the true count, with
  * overcount ≤ (e/width)·N w.h.p. The sketch is the archetypal 100 TB
  * profiling artifact: d·width integers summarize an unbounded token
  * stream, mergeable across partitions by plain cell-wise addition (which
  * is exactly what the groupBy(row, cell) SUM below does — map-side
  * partial aggregation IS the sketch merge).
  *
  * Engine-portable by construction: the same base-31 rolling hash mod p +
  * universal-hash row family as MinhashPortable (a_i·x+b_i mod p, Knuth
  * constants), so DuckDB rebuilds the identical sketch and the estimates
  * hash-match — a sketch query with an EXACT oracle.
  *
  * Scale shape: one distinct-term shuffle (the same cost term_freq already
  * pays) builds the sketch; the per-char hash fold runs over distinct
  * TERMS (bounded vocabulary), not token occurrences, so the interpreted
  * HOF is off the corpus-sized path. Probes (top-k terms) and the sketch
  * itself are broadcast-sized artifacts.
  */
object CountMin {

  val Mod: Long = MinhashPortable.Mod

  /** (term, tf) over the corpus slice — the distinct-term aggregate both
    * sketch builders share. */
  private def termCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))

  /** Per-char base-31 fold over the bounded distinct-term vocabulary. */
  private def withHash(tf: DataFrame): DataFrame =
    tf.withColumn("x",
      aggregate(split(col("term"), ""), lit(0L),
        (acc, c) => (acc * 31L + ascii(c)) % Mod))

  /** All d (row, cell) coordinates in ONE pass (a union of d branches
    * would re-run the distinct-term aggregate d times). */
  private def coordsCol(d: Int, width: Int) =
    array((0 until d).map { i =>
      val a = ((i + 1).toLong * 2654435761L) % Mod
      val b = ((i + 1).toLong * 40503L) % Mod
      struct(lit(i.toLong).as("row"),
        ((lit(a) * col("x") + lit(b)) % Mod % width).as("cell"))
    }: _*)

  /** Signed cell contributions of one corpus slice — a CMS is a vector in
    * an additive group, so a slice's sketch is just its (row, cell, ±tf)
    * stream and deletion is negation. */
  private def cellStream(documents: DataFrame, d: Int, width: Int,
                         sign: Long): DataFrame =
    withHash(termCounts(documents))
      .select((col("tf") * sign).as("tf"), explode(coordsCol(d, width)).as("rc"))
      .select(col("rc.row").as("row"), col("rc.cell").as("cell"), col("tf"))

  /** Point estimates for the top-`probes` exact terms of `corpus` against
    * a (row, cell, total) sketch: MIN over the term's d cells. */
  private def estimates(corpus: DataFrame, sketch: DataFrame, d: Int,
                        width: Int, probes: Int): DataFrame = {
    val probeCells = withHash(termCounts(corpus))
      .orderBy(desc("tf"), col("term")).limit(probes)
      .select(col("term"), col("tf"), explode(coordsCol(d, width)).as("rc"))
      .select(col("term"), col("tf"), col("rc.row").as("row"), col("rc.cell").as("cell"))
    probeCells.join(sketch, Seq("row", "cell"))
      .groupBy(col("term"), col("tf"))
      .agg(min(col("total")).as("cms_est"))
  }

  /** (term, tf, cms_est) for the top-`probes` exact terms: true count next
    * to the sketch estimate. Spec asserts est ≥ tf always (the CMS
    * guarantee); the oracle asserts bit-equality. */
  def cmsFreq(documents: DataFrame, d: Int = 4, width: Int = 256,
              probes: Int = 20): DataFrame = {
    require(d > 0 && width > 0 && probes > 0, s"bad params d=$d width=$width probes=$probes")
    val sketch = cellStream(documents, d, width, 1L)
      .groupBy(col("row"), col("cell")).agg(sum(col("tf")).as("total"))
    estimates(documents, sketch, d, width, probes)
  }

  /** TURNSTILE maintenance of the CMS — the model the sketch is named for
    * (Cormode & Muthukrishnan's turnstile stream: signed updates, so
    * deletion is exact negation; the CMS family's delete direction next
    * to turnstile_distinct's). The standing sketch (base corpus,
    * doc_id%10 != 0) composes CELL-WISE with an arrival batch (+,
    * %10 == 0) and a departure batch (−, %10 == 5): three mergeable
    * (row, cell) streams, one groupBy — no standing cell is ever
    * rebuilt, and the composed sketch is EXACTLY the from-scratch sketch
    * of the post-change corpus because the cells live in an additive
    * group. The registered result serves point estimates for the
    * post-corpus top terms; the oracle rebuilds the post-corpus sketch
    * from scratch — hash equality proves signed composition lossless. */
  def cmsTurnstile(documents: DataFrame, d: Int = 4, width: Int = 256,
                   probes: Int = 20): DataFrame = {
    require(d > 0 && width > 0 && probes > 0, s"bad params d=$d width=$width probes=$probes")
    estimates(documents.filter(pmod(col("doc_id"), lit(10L)) =!= 5L),
      turnstileSketch(documents, d, width), d, width, probes)
  }

  /** The composed signed sketch itself — package-visible so the spec can
    * pin the cell-drop claim directly: the (row, cell, total) set of the
    * composed sketch (retired cells filtered) must equal the from-scratch
    * sketch of the post-change corpus, which never materializes a zero
    * cell in the first place. The estimate join is unaffected by the drop
    * (min over surviving cells only sees cells its own terms still touch —
    * absent cells cannot be a standing term's min because every standing
    * term keeps d positive cells). */
  private[graft] def turnstileSketch(documents: DataFrame, d: Int = 4,
                                     width: Int = 256): DataFrame = {
    val cls = pmod(col("doc_id"), lit(10L))
    cellStream(documents.filter(cls =!= 0L), d, width, 1L)
      .unionByName(cellStream(documents.filter(cls === 0L), d, width, 1L))
      .unionByName(cellStream(documents.filter(cls === 5L), d, width, -1L))
      .groupBy(col("row"), col("cell")).agg(sum(col("tf")).as("total"))
      .filter(col("total") =!= 0L)
  }

  /** From-scratch sketch of an arbitrary corpus slice — the spec's
    * reference side for the turnstile cell identity. */
  private[graft] def scratchSketch(documents: DataFrame, d: Int = 4,
                                   width: Int = 256): DataFrame =
    cellStream(documents, d, width, 1L)
      .groupBy(col("row"), col("cell")).agg(sum(col("tf")).as("total"))

  /** `srcWhere` restricts the sketched corpus — the turnstile oracle
    * rebuilds the post-change sketch from scratch (doc_id %10 <> 5). */
  def cmsFreqSql(d: Int = 4, width: Int = 256, probes: Int = 20,
                 srcWhere: String = "TRUE"): String =
    s"""WITH tf AS (
       |  SELECT term, COUNT(*) AS tf FROM (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
       |    FROM documents WHERE ($srcWhere))
       |  WHERE term <> '' GROUP BY 1),
       |hx AS (
       |  SELECT term, tf, list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(term, ''), x -> CAST(ord(x) AS BIGINT))),
       |    (acc, c) -> (acc * 31 + c) % $Mod) AS x
       |  FROM tf),
       |cells AS (
       |  SELECT i.i AS row,
       |    ((((i.i + 1) * 2654435761 % $Mod) * x + (i.i + 1) * 40503 % $Mod) % $Mod) % $width AS cell,
       |    tf
       |  FROM hx CROSS JOIN (SELECT unnest(range(0, $d)) AS i) i),
       |sketch AS (SELECT row, cell, CAST(SUM(tf) AS BIGINT) AS total FROM cells GROUP BY 1, 2),
       |probe AS (SELECT term, tf, x FROM hx ORDER BY tf DESC, term LIMIT $probes),
       |pc AS (
       |  SELECT term, tf, i.i AS row,
       |    ((((i.i + 1) * 2654435761 % $Mod) * x + (i.i + 1) * 40503 % $Mod) % $Mod) % $width AS cell
       |  FROM probe CROSS JOIN (SELECT unnest(range(0, $d)) AS i) i)
       |SELECT pc.term, pc.tf, MIN(s.total) AS cms_est
       |FROM pc JOIN sketch s ON pc.row = s.row AND pc.cell = s.cell
       |GROUP BY 1, 2""".stripMargin
}
