package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the Spark-native upgrade of the
  * reference's user-level idempotency pattern (the
  * `(topic,partition)→max(offset)` metadata-table filter of
  * `kafka.motherduck.idempotent.yml:44-80`, mirrored by q14): an
  * at-least-once source replays messages on recovery; dropping
  * duplicates by event id inside the stream turns redelivery into
  * exactly-once EFFECT at the sink without any sink-side transaction.
  *
  * Two state disciplines:
  *
  *  - [[withinWatermark]] (the 100-TB path): state is keyed by the id
  *    columns but EXPIRES once the watermark passes the event's time +
  *    delay. Steady-state state size ≈ distinct ids per watermark
  *    horizon — bounded regardless of stream lifetime. A duplicate
  *    arriving later than the watermark delay is re-admitted: the
  *    documented at-least-once boundary, identical to the reference's
  *    offset-table filter (which also cannot reject a replay that
  *    predates its retained metadata).
  *
  *  - [[global]]: `dropDuplicates` with UNBOUNDED state — exact forever,
  *    state grows with total distinct ids. Correct for bounded id
  *    domains (entity streams); a scale-killer for event streams, which
  *    is why it is not the default.
  */
object StreamDedup {

  /** Bounded-state streaming dedup: one row per id within the
    * watermark horizon. `tsCol` must be the event-time column the
    * watermark is defined on. */
  def withinWatermark(events: DataFrame, idCols: Seq[String], tsCol: String,
      delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Unbounded-state exact dedup (bounded id domains only). */
  def global(events: DataFrame, idCols: Seq[String]): DataFrame =
    events.dropDuplicates(idCols)
}
