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

  /** Weighted sampling WITHOUT replacement, one pass, no RNG — the
    * Efraimidis–Spirakis A-ES reservoir (Inf. Proc. Letters 2006):
    * each row draws a deterministic uniform u from the md5 of its id
    * and competes on key = ln(u) / w; the k largest keys per stratum
    * ARE a weighted-without-replacement sample (P(i first) = wᵢ/Σw,
    * recursively). Replaces the two-pass "compute Σw, then
    * rate-sample" scheme AND the full per-stratum sort.
    *
    * Scale shape: the per-stratum top-k runs on the bounded-heap
    * `top_k_rows` aggregate, so every map task ships AT MOST k rows
    * per stratum it saw (partial aggregation) — selection over 100 TB
    * moves O(strata × k × mappers) rows through one exchange and
    * sorts nothing. The window/row_number formulation this replaces
    * shuffles the ENTIRE corpus to its stratum partition first; the
    * oracle replays exactly that formulation in DuckDB, which is the
    * point — same answer, quadratically different movement.
    *
    * Determinism: u = (52-bit md5 prefix + 0.5) / 2⁵² ∈ (0,1) — both
    * engines evaluate the identical IEEE-double expression (same
    * libm), and the ordering key is quantized to a LONG (×10¹⁰) so
    * the cross-engine total order is exact. The composite order
    * (quantized key DESC, id ASC) rides as SEPARATE leading Long
    * fields of the top_k_rows struct — never packed into one Long
    * with multiply-subtract arithmetic, which silently flips ranks
    * once ids outgrow the tie-break spacing or tiny weights push the
    * product past Long range. Weights small enough to overflow the
    * ×10¹⁰ quantization itself (|ln(u)/w| ≥ 9·10⁷, i.e. w ≲ 4·10⁻⁷)
    * fail fast instead of wrapping.
    *
    * @param weight strictly-positive sampling weight column (e.g.
    *               document length, a quality score) */
  def weightedReservoir(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, "weightedReservoir: k must be positive")
    import graft.functions.HashFunctions.top_k_rows
    val u = (expr(s"cast(conv(substr(md5(cast($idCol as string)), 1, 13), 16, 10) as bigint)")
      .cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val key = log(u) / weight.cast("double")
    val scaled = key * lit(1e10)
    // fail fast on quantization overflow: beyond ±9·10¹⁷ the
    // double→long cast saturates on Spark but ERRORS on DuckDB — an
    // undetectable cross-engine divergence if allowed through
    // null weights land here too (NULL comparison → otherwise branch):
    // both are contract violations, so fail fast and name each cause
    val qkey = when(abs(scaled) < lit(9.0e17), round(scaled).cast("long"))
      .otherwise(raise_error(concat(
        lit("weightedReservoir: weight must be non-null and > ~4e-7 — "),
        lit("a null weight or |ln(u)/w|*1e10 overflowing the quantized "),
        lit("ordering key would silently corrupt the sample"))))
    df.select(col(stratumCol).as("stratum"),
        struct(qkey.as("ord"), (-col(idCol).cast("long")).as("ord2"),
          col(idCol).cast("long").as("id"),
          round(key, 6).as("key6")).as("s"))
      .groupBy("stratum")
      .agg(top_k_rows(col("s"), k).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("rank"),
        col("r.id").as("id"), col("r.key6").as("key6"))
  }

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
