package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed corpus suffix array by prefix doubling — the backbone
  * of EXACT substring deduplication (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better", builds suffix arrays
  * to strip verbatim duplicated spans; t42/t71 approximate the same
  * signal with bounded n-grams). Suffixes never cross document
  * boundaries (the per-document convention used for corpus dedup).
  *
  * Algorithm (Manber–Myers doubling, the standard distributed SA
  * construction — each round extends the compared prefix from 2^k to
  * 2^(k+1) chars):
  *   rank_0(p)   = dense rank of the single character at p
  *   rank_k+1(p) = dense rank of (rank_k(p), rank_k(p + 2^k))
  * with rank −1 for positions past the document end (a shorter
  * suffix that is a prefix of a longer one sorts first, matching
  * lexicographic string order). ⌈log₂ maxDocLen⌉ rounds; each round
  * is a constant number of keyed shuffles over the n positions, so
  * total work is O(n log maxLen) shuffle volume — no single machine
  * ever holds the corpus, unlike an in-memory suffix sort.
  *
  * Dense ranking is itself distributed: distinct keys →
  * range-repartition + in-partition sort → `zipWithIndex` (which
  * assigns contiguous global indexes from per-partition counts, the
  * classic sort-rank shape). No global single-partition window
  * anywhere.
  *
  * Determinism: ranks depend only on suffix CONTENT; equal suffixes
  * (byte-identical document tails) share a rank and callers break
  * ties by (doc, off). Spark and DuckDB both compare strings by
  * UTF-8 binary order, so the final rank order equals `ORDER BY
  * substr(text, off+1)` cross-engine. */
object SuffixArray {

  /** (doc, off, rank): the rank of the suffix of document `doc`
    * starting at 0-based char offset `off`, dense over distinct
    * suffix contents and ordered lexicographically. */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    ranksImpl(docs, idCol, textCol, targetWidth = None)

  /** Ranks by the first `width` characters only (width a power of
    * two): suffixes sharing a rank share their first `width` chars.
    * Runs ⌈log₂ width⌉ doubling rounds instead of ⌈log₂ maxLen⌉ —
    * the cheap entry point for fixed-length duplicated-span
    * detection ([[exactDupSpans]]). Early convergence (all ranks
    * distinct at a smaller width) is sound: distinct first-v-chars
    * implies distinct first-w-chars for every w ≥ v. */
  def ranksByPrefix(docs: DataFrame, idCol: String, textCol: String,
      width: Long): DataFrame = {
    require(width >= 1 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    ranksImpl(docs, idCol, textCol, targetWidth = Some(width))
  }

  /** Exact duplicated-span detection (the ExactSubstr semantics of
    * Lee et al. 2021): every maximal per-document span covered by
    * length-`minLen` windows that occur ≥ 2 times anywhere in the
    * corpus (other documents or elsewhere in the same one). Built on
    * [[ranksByPrefix]], so no substring is ever materialized or
    * hashed — two positions share a rank iff their first `minLen`
    * chars are byte-equal (no collision risk, unlike fingerprint
    * approaches; t42/t34 are the hashed alternatives). Shuffle
    * story: doubling rounds + ONE rank-keyed window for occurrence
    * counts + ONE doc-keyed window for island merging.
    * Output: (doc, span_start, span_end half-open). */
  def exactDupSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = ranksByPrefix(docs, idCol, textCol, minLen.toLong)
    val lens = docs.select(col(idCol).cast("long").as("doc"),
      length(col(textCol)).cast("long").as("len"))
    // only positions with a full window can anchor a duplicated span
    val eligible = r.join(lens, Seq("doc"))
      .filter(col("off") <= col("len") - minLen)
    val marked = eligible
      .withColumn("nocc", count(lit(1)).over(Window.partitionBy("rank")))
      .filter(col("nocc") >= 2)
    val byDoc = Window.partitionBy("doc").orderBy("off")
    marked
      .withColumn("prev_end",
        max(col("off") + minLen).over(byDoc.rowsBetween(
          Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_end").isNull || col("off") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("ni")).over(byDoc))
      .groupBy(col("doc"), col("island"))
      .agg(min(col("off")).as("span_start"),
        (max(col("off")) + minLen).as("span_end"))
      .drop("island")
  }

  private def ranksImpl(docs: DataFrame, idCol: String, textCol: String,
      targetWidth: Option[Long]): DataFrame = {
    val spark = docs.sparkSession
    val base = docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("doc"), col(textCol).as("t"))
    val chars = base
      .select(col("doc"), posexplode(split(col("t"), "")))
      .select(col("doc"), col("pos").cast("long").as("off"),
        col("col").as("ch"))

    val n = chars.count()
    if (n == 0)
      return chars.select(col("doc"), col("off"),
        lit(0L).as("rank")).limit(0)
    val maxLen = base.agg(max(length(col("t"))).cast("long"))
      .head.getLong(0)

    // rank_0: dense rank of the first character
    val charRanks = rankSortedDistinct(spark, chars.select("ch"), Seq("ch"))
    var p = chars.join(charRanks, Seq("ch"))
      .select(col("doc"), col("off"), col("r").as("rank"))
      .localCheckpoint()

    var w = 1L
    var converged = p.agg(max(col("rank"))).head.getLong(0) == n - 1
    while (!converged && w < maxLen && targetWidth.forall(w < _)) {
      // rank of the suffix 2^k positions later (−1 past the doc end)
      val shifted = p.select(col("doc"), (col("off") - w).as("off"),
        col("rank").as("rnext"))
      val paired = p.join(shifted, Seq("doc", "off"), "left")
        .withColumn("rnext", coalesce(col("rnext"), lit(-1L)))
      val pairRanks = rankSortedDistinct(spark,
        paired.select("rank", "rnext"), Seq("rank", "rnext"))
      p = paired.join(pairRanks, Seq("rank", "rnext"))
        .select(col("doc"), col("off"), col("r").as("rank"))
        .localCheckpoint() // truncate lineage: ⌈log n⌉ chained joins
      w *= 2
      // all ranks distinct → totally ordered, no further round can
      // change anything (legitimate ties — identical tails — keep the
      // loop alive until w covers maxLen, then stop with shared ranks)
      converged = p.agg(max(col("rank"))).head.getLong(0) == n - 1
    }
    p
  }

  /** Distributed dense rank: distinct rows of `cols`, globally sorted,
    * get contiguous indexes 0..d−1 in column `r`. Range partition +
    * per-partition sort keeps the sort distributed; `zipWithIndex`
    * turns per-partition counts into global offsets (one tiny driver
    * collect of partition sizes — the standard sort-rank pattern). */
  private def rankSortedDistinct(spark: SparkSession, df: DataFrame,
      cols: Seq[String]): DataFrame = {
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = df.distinct()
      .repartitionByRange(parts, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
    val schema = sorted.schema.add("r", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
