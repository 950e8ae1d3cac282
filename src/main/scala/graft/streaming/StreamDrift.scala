package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor: Population Stability Index
  * per event-time window against a fixed reference histogram — the
  * live sibling of t66's source-KL report (is today's traffic still
  * distributed like the corpus the model/filters were calibrated
  * on?). PSI = Σ_b (p_b − q_b)·ln(p_b/q_b); the industry reading:
  * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * State discipline: the reference histogram is a DRIVER-SIDE model
  * (tens of bins — same contract as IVF centroids), so each window's
  * bin counts compile to one conditional-count aggregate per bin:
  * ONE streaming aggregation whose state is |bins| longs per open
  * window, regardless of event volume or value cardinality (values
  * outside the reference bins fold into '__other'). No chained
  * stateful operators, no per-key state growth. Emits on watermark
  * close (append mode), so each window's PSI is final — the same
  * plan aggregates a batch DataFrame identically (spec-pinned
  * streaming ≡ batch).
  *
  * Smoothing: shares clamp to ≥ 1e-6 before the log (an empty bin
  * otherwise sends PSI to ±∞ — the standard PSI fix), and the
  * reference shares are normalized + rounded once on the driver so
  * the monitor's arithmetic is reproducible. */
object StreamDrift {

  /** @param reference (bin → expected share); normalized here.
    * @param bin expression mapping an event to a reference bin name */
  def psiMonitor(
      events: DataFrame,
      tsCol: String,
      bin: Column,
      reference: Map[String, Double],
      windowDuration: String,
      watermarkDelay: String): DataFrame = {
    require(reference.nonEmpty && reference.values.forall(_ >= 0.0) &&
      reference.values.sum > 0.0, "reference histogram must be non-empty")
    val z = reference.values.sum
    val ref = reference.view.mapValues(_ / z).toMap
    val eps = 1e-6
    val binned = events
      .withColumn("__bin",
        when(bin.isin(ref.keySet.toSeq: _*), bin).otherwise("__other"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
    val counts = (ref.keySet + "__other").toSeq.sorted.map { b =>
      sum(when(col("__bin") === b, 1L).otherwise(0L)).as(s"__c_$b")
    }
    val agged = binned.agg(counts.head, counts.tail: _*)
      .withColumn("n", (ref.keySet + "__other").toSeq.sorted
        .map(b => col(s"__c_$b")).reduce(_ + _))
    val psi = (ref.keySet + "__other").toSeq.sorted.map { b =>
      val q = math.max(ref.getOrElse(b, 0.0), eps)
      val p = greatest(col(s"__c_$b").cast("double") / col("n"), lit(eps))
      (p - q) * log(p / lit(q))
    }.reduce(_ + _)
    agged.select(
      col("window.start").as("window_start"),
      col("n"),
      round(psi, 6).as("psi"))
  }
}
