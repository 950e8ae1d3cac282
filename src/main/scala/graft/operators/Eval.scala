package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Classifier-evaluation metrics over corpus-scale score tables —
  * the measurement loop for quality filters (t38/t46): a filter
  * whose score can't separate the classes is just deleting data at
  * random, and AUC is the threshold-free way to know.
  *
  * Exact ROC-AUC via the Mann–Whitney rank identity:
  * AUC = (Σ ranks(pos) − n₊(n₊+1)/2) / (n₊·n₋). The global rank is
  * t80's distributed-ranking discipline — range-repartition +
  * in-partition sort + `zipWithIndex` — NEVER a single-partition
  * window (the textbook `row_number() OVER (ORDER BY score)` pulls
  * the whole corpus through one task). Ties break on the id column,
  * so the metric is a deterministic, engine-replayable contract
  * (score ties are measure-zero for continuous scores; for coarse
  * scores the id tie-break makes the reported value reproducible
  * rather than averaged). */
object Eval {

  /** @return one row: (n_pos, n_neg, auc) */
  def rocAuc(
      scored: DataFrame, scoreCol: String, labelCol: String,
      idCol: String): DataFrame = {
    val s = scored.select(col(idCol).cast("long").as("id"),
      col(scoreCol).cast("double").as("sc"),
      col(labelCol).cast("boolean").as("pos"))
    val sorted = s
      .repartitionByRange(col("sc"), col("id"))
      .sortWithinPartitions(col("sc"), col("id"))
    val schema = sorted.schema.add("r", LongType, nullable = false)
    val ranked = sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ (i + 1L))
      }, schema)
    ranked.agg(
        sum(when(col("pos"), col("r")).otherwise(0L)).as("rank_sum"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        round((col("rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2)
          .cast("double") / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }
}
