package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mixture scheduling: deterministic weighted interleaving of
  * sources into one consumption order — the "sample source s with
  * weight w_s" step of a pretraining data pipeline, made reproducible
  * (no RNG: the schedule is a pure function of ranks and weights).
  *
  * Each source's k-th document is served at position k / w_s — the
  * classic deterministic low-discrepancy schedule: a source with
  * weight 3 appears 3× as often as a weight-1 source, uniformly
  * spread rather than in bursts. Ties across sources break on
  * (source, rank) so the total order is exact and oracle-checkable.
  *
  * Shuffle shape: one hash partition per source for the in-source
  * rank (window, partition-local sort — sources are few, so skew is
  * the per-source data itself; at 100 TB the in-source rank comes
  * from the curated layout's shard manifest instead of a window, and
  * the global order is realized by a range-partitioned write on
  * `mix_pos`, never a single-partition sort). Consumers take the
  * stream in `mix_pos` order; a bounded preview (`limit`) compiles to
  * distributed TakeOrdered — no global sort materialization. */
object Mixture {

  def interleave(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ > 0.0) && defaultWeight > 0.0,
      "mixture weights must be positive")
    val w: Column = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (src, wt)) => when(col(sourceCol) === src, lit(wt)).otherwise(acc)
    }
    val rank = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(sourceCol).orderBy(idCol))
    df.select(col(idCol), col(sourceCol))
      .withColumn("src_rank", rank)
      // double division of small ints is IEEE-exact on both engines;
      // round only to pin the textual representation for the gate
      .withColumn("mix_pos", round(col("src_rank").cast("double") / w, 6))
  }
}
