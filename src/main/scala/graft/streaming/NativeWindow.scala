package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Spark-NATIVE tumbling-window path (SURVEY §2B "Windows" /
  * §7.4 risk #1): `withWatermark` + `groupBy(window(...))` streaming
  * aggregation in append mode.
  *
  * This is the primary design for windowed aggregation in this
  * engine; the literal port of the reference's state-table +
  * poll-thread mechanism (`engine/StateTable` +
  * `engine/TumblingWindowManager`) is kept for byte-faithful config
  * compatibility. Semantics relative to the reference
  * (`managers/window.py:68-90`):
  *
  *  - window close is EVENT-time (watermark) instead of the
  *    reference's processing-time `now() - INTERVAL` check — a
  *    deliberate, documented upgrade: results become replay-stable
  *    and independent of consumer lag;
  *  - append mode emits each (window, keys) group exactly once when
  *    the watermark passes window end — the reference's
  *    collect-closed → flush → delete-closed cycle has the same
  *    observable contract for on-time data;
  *  - late rows within the watermark delay still accumulate into
  *    their window (the reference would re-emit a fresh row; see
  *    SURVEY §2B "Late data" — use update mode + sink dedup when
  *    that re-emission behavior is required).
  *
  * Scale: state is keyed by (window, keys) — grows with open windows
  * × key cardinality, not message count (the same asymptotics the
  * reference gets from its unique index), and the shuffle is the
  * intrinsic group-by exchange; partial aggregation happens map-side.
  */
object NativeWindow {

  /** @param aggs aggregate columns (aliased); default `count(*)` as
    *             `count` — the additive aggregations the reference's
    *             ADR declares in scope.
    * @param applyWatermark pass false when an upstream stateful stage
    *             (e.g. [[StreamDedup.withinWatermark]]) already set the
    *             watermark on `tsCol` — Spark rejects a redefinition. */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      windowDuration: String,
      watermarkDelay: String,
      aggs: Seq[Column] = Seq(count(lit(1)).as("count")),
      applyWatermark: Boolean = true): DataFrame = {
    // batch invocations (dev-invoke golden tests) share this plan:
    // a watermark is only meaningful — and only accepted — on a
    // streaming Dataset, and batch aggregation emits every window
    val watermarked =
      if (events.isStreaming && applyWatermark)
        events.withWatermark(tsCol, watermarkDelay)
      else events
    val grouped = watermarked
      .groupBy(window(col(tsCol), windowDuration) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    grouped.select(
      col("window.start").as("bucket") +:
        (keyCols.map(col) ++
          grouped.columns.filterNot(c => c == "window" || keyCols.contains(c))
            .map(col)): _*)
  }

  /** Sliding (hopping) windows: fixed `windowDuration` extents that
    * advance by `slide` (< duration ⇒ overlap), Spark's native
    * multi-window `window(ts, duration, slide)` assignment. Each
    * event lands in duration/slide windows — the output fan-out is
    * that factor, but state stays keyed by (window, keys): open
    * windows × keys, never message count. Emits `bucket` (window
    * start) like [[tumbling]] — a sliding bucket is still fully
    * identified by its start given the configured duration. Append
    * mode closes each overlapping window independently as the
    * watermark passes its end. */
  def sliding(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      windowDuration: String,
      slide: String,
      watermarkDelay: String,
      aggs: Seq[Column] = Seq(count(lit(1)).as("count")),
      applyWatermark: Boolean = true): DataFrame = {
    val watermarked =
      if (events.isStreaming && applyWatermark)
        events.withWatermark(tsCol, watermarkDelay)
      else events
    val grouped = watermarked
      .groupBy(window(col(tsCol), windowDuration, slide) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    grouped.select(
      col("window.start").as("bucket") +:
        (keyCols.map(col) ++
          grouped.columns.filterNot(c => c == "window" || keyCols.contains(c))
            .map(col)): _*)
  }

  /** Session windows: per-key activity bursts separated by ≥ `gap` of
    * silence, via Spark's native `session_window` streaming
    * aggregation — dynamic, data-defined extents where [[tumbling]]
    * has fixed buckets. Output carries BOTH bounds (`session_start` /
    * `session_end`) because, unlike a tumbling bucket, a session's
    * extent is information. Append mode emits each session once,
    * when the watermark passes its close (start/end merge as
    * overlapping events arrive — Spark's state store handles session
    * merging natively). State per key = open sessions, bounded by the
    * watermark horizon — the same asymptotics as
    * [[graft.operators.IncrementalSessions]]' flatMapGroupsWithState
    * formulation, with the merge logic delegated to the engine. */
  def session(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      gap: String,
      watermarkDelay: String,
      aggs: Seq[Column] = Seq(count(lit(1)).as("count")),
      applyWatermark: Boolean = true): DataFrame = {
    val watermarked =
      if (events.isStreaming && applyWatermark)
        events.withWatermark(tsCol, watermarkDelay)
      else events
    val grouped = watermarked
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    grouped.select(
      Seq(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end")) ++
        keyCols.map(col) ++
        grouped.columns.filterNot(c => c == "session_window" || keyCols.contains(c))
          .map(col): _*)
  }
}
