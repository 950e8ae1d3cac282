package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF enrichment — each event joined to the LATEST
  * dimension version with `version.ts ≤ event.ts` for its key
  * (q17/q51's batch semantics as a live operator; the shape behind
  * "price at trade time", "user tier at click time", "model version
  * at request time").
  *
  * Spark's stream-stream joins can't express as-of: an interval join
  * matches EVERY version in the window, not the latest ≤ t, and
  * collapsing to the latest needs per-event ordering state. So both
  * streams union into one keyed stream (version rows tagged) and a
  * `flatMapGroupsWithState` machine applies Funnel's buffer-then-fold
  * discipline: rows buffer until the event-time watermark passes
  * them, then replay in (ts, tag) order — versions apply before
  * events at the same instant — so ANY arrival order within the
  * watermark produces the batch as-of answer.
  *
  * State per key: the pending buffer (rate × watermark horizon, the
  * same bound as any stream-stream join) plus ONE retained version —
  * once the watermark passes a version, every later event sees it or
  * something newer, so older versions are discarded immediately
  * (unlike an interval join, which must keep the full window of the
  * dimension stream). The shuffle is the intrinsic groupByKey
  * exchange, reused every micro-batch. */
object StreamAsof {

  /** tag 0 = dimension version (payload = version value),
    * tag 1 = event (payload = event id). */
  final case class AsofRow(key: String, ts: Timestamp, tag: Int,
      event_id: Long, value: String)
  final case class AsofState(
      pending: List[(Long, Int, Long, String)],
      versionTs: Long,
      version: String)
  final case class Enriched(key: String, event_id: Long,
      ts: Timestamp, value: String)

  /** Fold watermark-released rows in (ts, tag) order through the
    * version register; emit one enriched row per event. `null` value
    * = no version existed at the event's time (left-join contract). */
  private[streaming] def replay(
      versionTs: Long, version: String,
      ready: Seq[(Long, Int, Long, String)]):
      (Long, String, List[(Long, Long, String)]) = {
    var vTs = versionTs
    var v = version
    val out = List.newBuilder[(Long, Long, String)]
    ready.sortBy(r => (r._1, r._2, r._3)).foreach {
      case (ts, 0, _, value) =>
        if (ts >= vTs) { vTs = ts; v = value }
      case (ts, _, id, _) =>
        out += ((id, ts, if (vTs == Long.MinValue) null else v))
    }
    (vTs, v, out.result())
  }

  /** @param events  streaming (key, ts, event_id)
    * @param updates streaming (key, ts, value) dimension versions
    * @param watermarkDelay lateness bound on BOTH streams (drives
    *                       buffer release and version retirement) */
  def enrichLatest(
      spark: SparkSession,
      events: DataFrame, eKeyCol: String, eTsCol: String, eIdCol: String,
      updates: DataFrame, uKeyCol: String, uTsCol: String, uValCol: String,
      watermarkDelay: String = "10 minutes"): Dataset[Enriched] = {
    import spark.implicits._
    val tagged = updates.select(col(uKeyCol).cast("string").as("key"),
        col(uTsCol).as("ts"), lit(0).as("tag"), lit(-1L).as("event_id"),
        col(uValCol).cast("string").as("value"))
      .unionByName(events.select(col(eKeyCol).cast("string").as("key"),
        col(eTsCol).as("ts"), lit(1).as("tag"),
        col(eIdCol).cast("long").as("event_id"),
        lit(null).cast("string").as("value")))
      .withWatermark("ts", watermarkDelay)
      .as[AsofRow]

    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[AsofRow],
         state: GroupState[AsofState]) =>
          val watermark = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(
            AsofState(Nil, Long.MinValue, null))
          val pending = st.pending ++
            (if (state.hasTimedOut) Nil
             else rows.map(r =>
               (r.ts.getTime, r.tag, r.event_id, r.value)).toList)
          val (ready, held) = pending.partition(_._1 <= watermark)
          val (vTs, v, emitted) = replay(st.versionTs, st.version, ready)
          if (held.isEmpty && vTs == Long.MinValue) {
            state.remove()
          } else {
            state.update(AsofState(held, vTs, v))
            if (held.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(held.map(_._1).min, watermark + 1))
          }
          emitted.iterator.map { case (id, ts, value) =>
            Enriched(key, id, new Timestamp(ts), value)
          }
      }
  }
}
