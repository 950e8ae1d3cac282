package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (point-in-interval) join — the big×big companion to
  * the q10 shape. Spark plans a bare `p BETWEEN lo AND hi` join with
  * no equi-key as BroadcastNestedLoopJoin: every (point, interval)
  * pair is compared, O(|P|·|I|), which is only viable when one side is
  * dimension-sized. This operator manufactures the missing equi-key:
  * quantize the value axis into `bucketWidth` buckets, register each
  * interval under every bucket it overlaps (`sequence` explode — at
  * most ⌈width/bucketWidth⌉+1 copies), key each point by its single
  * bucket, and equi-join on the bucket id before the exact
  * containment filter.
  *
  * Correctness: a (point, interval) pair can only meet in the point's
  * unique bucket, so no post-join dedup is needed; the containment
  * filter makes membership exact regardless of where bucket
  * boundaries fall.
  *
  * Scale: one shuffle per side on the bucket id; per-bucket work is
  * |points in bucket| × |intervals overlapping bucket| — local
  * density, not the global cross product. `bucketWidth` is the skew
  * lever: ~the typical interval width is the sweet spot (≤2 copies
  * per interval, tight candidate sets); a hot value range is visible
  * as a hot bucket and salts like any skewed key
  * ([[Skew.saltedJoin]]). This is the standard workaround for Spark
  * lacking a native range-join optimization. */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points/intervals column names must be disjoint, clashing: $overlap")
    require(!points.columns.contains("__bkt") &&
      !intervals.columns.contains("__bkt"),
      "__bkt is reserved by pointInInterval")
    val p = points
      .withColumn("__bkt", floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bkt", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bkt"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bkt")
  }

  /** Interval×interval overlap join ([lLo,lHi] ∩ [rLo,rHi] ≠ ∅),
    * bucketed the same way. Both sides register under every bucket
    * they cover, which would surface an overlapping pair once per
    * SHARED bucket — instead of a post-join `distinct` (a second
    * shuffle over the full pair set), each pair is emitted only in
    * the bucket containing `max(lLo, rLo)`, the overlap's start.
    * Overlap guarantees both intervals cover that bucket, and it is
    * unique per pair, so the output is exactly-once by construction.
    *
    * Scale: identical to [[pointInInterval]] — one bucket-keyed
    * shuffle per side, per-bucket local density instead of the
    * global cross product Spark's BroadcastNestedLoopJoin would
    * evaluate for a bare overlap predicate. `bucketWidth` ≈ typical
    * interval width keeps the explode factor ≤2. */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, clashing: $overlap")
    require(!left.columns.contains("__bkt") &&
      !right.columns.contains("__bkt"),
      "__bkt is reserved by intervalOverlap")
    def spread(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo) <= col(hi))
        .withColumn("__bkt", explode(sequence(
          floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    spread(left, lLo, lHi).join(spread(right, rLo, rHi), Seq("__bkt"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bkt") ===
        floor(greatest(col(lLo), col(rLo)) / bucketWidth).cast("long"))
      .drop("__bkt")
  }
}
