package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global ranking — the shared shape behind every
  * total-order consumer (exact ROC-AUC ranks, rank-decile binning):
  * range-partition on the order columns, sort within partitions, and
  * number rows with `zipWithIndex` (one pass, no single-partition
  * window sort — the exact smell `tools/PlanAudit` exists to catch).
  *
  * Contract: `order` must be a TOTAL order (include a unique
  * tiebreak column) or ranks are partition-order-dependent; the
  * callers' oracles replay the same (score, id) order in SQL. */
object Ranking {

  /** @return `df` with an appended non-null `rankCol` = 1-based global
    *         rank under `order`. */
  def globalRank(
      df: DataFrame, order: Seq[Column], rankCol: String = "r"): DataFrame = {
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ (i + 1L))
      }, schema)
  }
}
