package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming enrichment the
  * reference can only approximate with a static ATTACH'd table: both
  * sides are live streams (impressions × clicks, orders × payments),
  * matched on a key within a bounded event-time interval.
  *
  * Scale contract: the interval bound + per-side watermarks are what
  * make this runnable forever — Spark keeps only rows younger than
  * (watermark − interval) in the join state store, so state size is
  * O(rate × horizon) per side regardless of stream lifetime, keyed
  * and co-partitioned on the join key (one shuffle per side, same
  * partitioning reused across micro-batches). An unbounded
  * stream-stream join (no time bound) would grow state without limit
  * and is deliberately not offered here.
  *
  * `leftOuter` additionally emits unmatched left rows once the
  * watermark proves no match can arrive — the standard
  * "impressions that never converted" shape. */
object StreamJoin {

  /** Join rows of `left` to rows of `right` with equal `keyCol` where
    * `rightTs ∈ [leftTs, leftTs + within]`. Column names other than
    * `keyCol` must be distinct across the two sides (the output keeps
    * both sides' columns, key deduplicated).
    *
    * @param within    SQL interval literal body, e.g. "10 minutes"
    * @param delay     watermark delay for BOTH sides (how late data
    *                  may arrive), e.g. "5 minutes"
    * @param joinType  "inner" or "left_outer"
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      within: String,
      delay: String,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"unsupported stream-stream join type: $joinType")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key columns must be distinct across sides, clashing: $overlap")
    val l = left.withWatermark(leftTs, delay).as("l")
    val r = right.withWatermark(rightTs, delay).as("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTs") >= col(s"l.$leftTs") &&
          col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"),
        joinType)
      .drop(col(s"r.$keyCol"))
  }
}
