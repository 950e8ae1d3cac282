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
  * State per key is the list of OPEN sessions, each three numbers
  * (start, end, count) — bounded by concurrent open sessions per key,
  * not event volume. Incoming events merge bidirectionally: an event
  * within `gap` of a session extends it in either direction, and an
  * event bridging two sessions merges them — so out-of-order arrivals
  * within the watermark produce the same sessions as ordered input.
  * A session is emitted exactly once, when the event-time watermark
  * passes `end + gap` (via timeout or any later invocation for the
  * key): only then can no in-flight event extend it. Events later
  * than the watermark (beyond `watermarkDelay`) may start a fresh
  * session rather than extend an emitted one — the standard
  * watermark contract.
  *
  * The shuffle is the intrinsic groupByKey exchange; within a batch
  * events are sorted per key in-memory (bounded by per-key batch
  * volume). */
object Sessionize {

  final case class SessionEvent(key: String, ts: Timestamp)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)
  final case class Session(
      key: String,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Merge an event into the open-session list: absorbs every session
    * within `gap` of `t` (bridging adjacent sessions), keeps the list
    * sorted by start. */
  private[streaming] def insert(
      sessions: List[OpenSession], t: Long, gapMs: Long): List[OpenSession] = {
    val (mergeable, rest) = sessions.partition(s =>
      t >= s.startMs - gapMs && t <= s.endMs + gapMs)
    val merged = mergeable.foldLeft(OpenSession(t, t, 1L)) { (acc, s) =>
      OpenSession(math.min(acc.startMs, s.startMs),
        math.max(acc.endMs, s.endMs), acc.n + s.n)
    }
    (merged :: rest).sortBy(_.startMs)
  }

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
      .flatMapGroupsWithState[List[OpenSession], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, events: Iterator[SessionEvent],
         state: GroupState[List[OpenSession]]) =>
          val watermark = state.getCurrentWatermarkMs()
          var sessions = state.getOption.getOrElse(Nil)
          if (!state.hasTimedOut) {
            events.map(_.ts.getTime).toArray.sorted
              .foreach(t => sessions = insert(sessions, t, gapMs))
          }
          val (closed, open) = sessions.partition(_.endMs + gapMs <= watermark)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
          }
          closed.sortBy(_.startMs)
            .map(s => Session(key, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.n))
            .iterator
      }
  }
}
