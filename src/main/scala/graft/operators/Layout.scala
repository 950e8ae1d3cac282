package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for scan pruning: rows sorted by the interleaved bits of two
  * quantized dimensions land so that a predicate on EITHER dimension
  * touches a small, contiguous subset of files (min/max file stats
  * prune the rest). The standard lakehouse layout move for tables
  * queried on more than one key — a single-column sort prunes one
  * dimension and scatters the other; the z-curve bounds the damage on
  * both.
  *
  * Quantization is exact integer arithmetic on the column's min/max
  * span (`(v - min) * (2^bits - 1) / span`, BIGINT division — no FP,
  * engine-portable); the interleave is a Scala-side unrolled sum of
  * shift/mask terms, all codegen'd. Shape at scale: one min/max agg
  * (broadcast scalars), one map pass for the z-value, and ONE range
  * repartition on z (the write shuffle any layout rewrite pays).
  * The z-value is plan-visible, so range partitioning gets real
  * quantile bounds from it.
  */
object Layout {

  /** Morton interleave of two already-quantized values in
    * [0, 2^bits): bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Unrolled in Scala — `bits` shift/mask/add terms, fully
    * inside whole-stage codegen. */
  def mortonInterleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Exact-integer range quantization of `v` into [0, 2^bits) given
    * in-plan min/max scalars: `(v - min) * (2^bits - 1) / span`.
    * All-BIGINT, so both the quantile and the downstream z-value are
    * bit-identical across engines and partitionings. */
  def quantize(v: Column, minV: Column, maxV: Column, bits: Int): Column = {
    val levels = (1L << bits) - 1
    val span = greatest(maxV - minV, lit(1L))
    val num = (v.cast("long") - minV) * levels
    // exact integer floor-division: Spark's `/` on longs is DOUBLE
    // division (a near-integer quotient can round up across the
    // floor); subtracting the remainder first makes the quotient an
    // exact integer, so the double division and the cast are lossless
    ((num - pmod(num, span)) / span).cast("long")
  }

  /** Z-value column for two integer dimensions of `df`, quantized on
    * their observed min/max (one agg, broadcast back as scalars).
    * Returns df + (za, zb, zvalue) — callers then
    * `repartitionByRange(n, col("zvalue")).sortWithinPartitions("zvalue")`
    * and write; every output file gets a tight min/max envelope in
    * BOTH source dimensions. */
  def zorder(df: DataFrame, colA: String, colB: String,
      bits: Int = 8): DataFrame = {
    val bounds = df.agg(
      min(col(colA)).cast("long").as("__min_a"),
      max(col(colA)).cast("long").as("__max_a"),
      min(col(colB)).cast("long").as("__min_b"),
      max(col(colB)).cast("long").as("__max_b"))
    val withQ = df.crossJoin(broadcast(bounds))
      .withColumn("za",
        quantize(col(colA), col("__min_a"), col("__max_a"), bits))
      .withColumn("zb",
        quantize(col(colB), col("__min_b"), col("__max_b"), bits))
    withQ
      .withColumn("zvalue", mortonInterleave(col("za"), col("zb"), bits))
      .drop("__min_a", "__max_a", "__min_b", "__max_b")
  }
}
