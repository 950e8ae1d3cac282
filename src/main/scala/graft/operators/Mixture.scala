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

  /** Temperature-scaled mixture weights: p_s ∝ n_s^(1/T), the standard
    * multilingual/multi-source rebalancing rule (T=1 → proportional;
    * T→∞ → uniform; T<1 sharpens toward big sources). Output per
    * source: count, raw share, temperature share, and the implied
    * per-source sampling rate (expected_docs / n_s) for a target
    * budget. One map-side-combined count agg over the corpus; the
    * per-source table is then a driver-sized model (sources are few) —
    * the normalization constant rides in-plan via a broadcast scalar,
    * no collect. */
  def temperatureWeights(
      df: DataFrame, sourceCol: String,
      temperature: Double, targetDocs: Long): DataFrame = {
    require(temperature > 0.0, "temperature must be positive")
    val counts = df.groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("scaled", pow(col("n_docs").cast("double"), lit(1.0 / temperature)))
    val totals = counts.agg(
      sum("n_docs").as("__total"), sum("scaled").as("__z"))
    counts.crossJoin(broadcast(totals))
      .select(col(sourceCol), col("n_docs"),
        round(col("n_docs") / col("__total"), 6).as("raw_share"),
        round(col("scaled") / col("__z"), 6).as("temp_share"),
        round(least(lit(1.0),
          col("scaled") / col("__z") * targetDocs / col("n_docs")), 6)
          .as("sample_rate"))
  }
}
