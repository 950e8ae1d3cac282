package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable corpus profiling — the algebraic-moments discipline that
  * makes 100 TB statistics incremental: each shard/ingest batch
  * reduces to one tiny row of EXACT integer moments (n, Σx, Σx²,
  * min, max) per group, the rows persist, and any union of shards —
  * a day, a source, the whole corpus — aggregates by simple addition
  * without rescanning documents. The same contract as q72's HLL
  * rollup, but for moments the merge is LOSSLESS: integer sums
  * commute exactly, so merged mean/variance is bit-identical to a
  * direct pass (the t83 gate proves it against an unsharded oracle).
  *
  * Floating point enters only in the last mile (two divisions per
  * group), never in the mergeable state — the standard trick for
  * cross-engine and cross-partitioning determinism. */
object Profile {

  /** One row of exact integer moments per (group, shard): the
    * persistable partial state. `value` must be integral (cast first;
    * lengths, token counts, cents). */
  def momentShards(
      df: DataFrame, groupCol: String, shard: Column,
      value: Column): DataFrame =
    df.select(col(groupCol).as("grp"), shard.as("shard"),
        value.cast("long").as("x"))
      .groupBy("grp", "shard")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"),
        sum(col("x") * col("x")).as("s2"),
        min("x").as("mn"), max("x").as("mx"))

  /** Exact weighted median per group: the smallest value v whose
    * cumulative weight reaches half the group's total — e.g. the
    * TOKEN-weighted median document length, which answers "where is
    * the middle of the training data" (an unweighted median
    * over-represents short docs that contribute few tokens). All
    * comparisons are exact integer products (2·cum ≥ total), no FP
    * rounding hazard. One keyed window + one small agg. */
  def weightedMedian(
      df: DataFrame, groupCol: String, value: Column,
      weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("grp"),
      value.cast("long").as("v"), weight.cast("long").as("w"))
    val wCum = Window.partitionBy("grp").orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("grp")
    base
      .groupBy("grp", "v").agg(sum("w").as("w"))
      .withColumn("cum", sum("w").over(wCum))
      .withColumn("total", sum("w").over(wTot))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy("grp")
      .agg(min("v").as("weighted_median"), max("total").as("total_w"))
  }

  /** Final per-group statistics from persisted partials: addition +
    * two divisions. Population variance: (Σx² − (Σx)²/n)/n. */
  def mergeMoments(partials: DataFrame): DataFrame =
    partials.groupBy("grp")
      .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
        min("mn").as("mn"), max("mx").as("mx"))
      .select(col("grp"), col("n"), col("mn"), col("mx"),
        round(col("s1").cast("double") / col("n"), 6).as("mean"),
        round((col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / col("n")) / col("n"), 6)
          .as("variance"))
}
