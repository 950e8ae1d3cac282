package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session windows (gap-based) via `flatMapGroupsWithState` — the
  * custom-state streaming operator family the native windowed
  * aggregation can't express (a session's extent depends on the data,
  * not a fixed grid).
  *
  * State per key is three numbers (start, end, count) — constant per
  * open session regardless of event volume, so state size scales with
  * concurrent active keys. Sessions close two ways: a later event for
  * the same key beyond the gap (emitted immediately, same batch), or
  * event-time timeout once the watermark passes `end + gap` (emitted
  * by the timeout callback). Both paths produce each session exactly
  * once in append mode.
  *
  * The shuffle is the intrinsic groupByKey exchange; within a batch
  * events are sorted per key in-memory (bounded by per-key batch
  * volume, not total session length). */
object Sessionize {

  final case class SessionEvent(key: String, ts: Timestamp)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)
  final case class Session(
      key: String,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** @param df streaming DataFrame
    * @param watermarkDelay lateness bound; also gates session close */
  def sessions(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMinutes: Int,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    df.select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, events: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(toSession(key, s))
          } else {
            val sorted = events.map(_.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  open = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += toSession(key, s)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  private def toSession(key: String, s: OpenSession): Session =
    Session(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)
}
