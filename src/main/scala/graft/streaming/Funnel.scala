package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-conversion funnel via `flatMapGroupsWithState` —
  * q48's batch semantics (stage i's time = first event of stage i
  * STRICTLY AFTER stage i−1's time) as a live per-key state machine
  * that emits one conversion row per key, exactly once, when the
  * final stage completes.
  *
  * Correctness under out-of-order arrival: events BUFFER in state
  * until the event-time watermark passes them, then replay in
  * timestamp order through the stage machine — so any arrival order
  * within the watermark produces the batch answer (the buffer-then-
  * fold discipline; an update-in-arrival-order shortcut silently
  * mis-assigns stages when a view arrives after its click). Events
  * later than the watermark are dropped by the upstream watermark —
  * the standard contract. Operating constraint that follows:
  * `watermarkDelay` must exceed the funnel SPAN you intend to
  * tolerate fully reversed — the final stage's arrival advances the
  * watermark, and the earlier stages' timestamps sit up to a span
  * behind it (FunnelSpec pins this).
  *
  * State per key: the pending buffer (bounded by rate × watermark
  * horizon — the same bound as any stream-stream join state) plus one
  * long per stage and a done flag. The shuffle is the intrinsic
  * groupByKey exchange, reused every micro-batch. */
object Funnel {

  final case class FunnelEvent(key: String, ts: Timestamp, stage: Int)
  final case class FunnelState(
      pending: List[(Long, Int)],
      times: List[Long],
      done: Boolean)
  final case class Conversion(key: String, stage_ts: Seq[Timestamp])

  /** Fold watermark-released events (ts order, stage as tie-break)
    * through the stage machine. times(i) = -1 when unset. */
  private[streaming] def advance(
      times: List[Long], ready: Seq[(Long, Int)]): List[Long] = {
    val ts = times.toArray
    ready.sortBy(e => (e._1, e._2)).foreach { case (t, stage) =>
      if (stage >= 0 && stage < ts.length && ts(stage) == -1L &&
          (stage == 0 || (ts(stage - 1) != -1L && t > ts(stage - 1))))
        ts(stage) = t
    }
    ts.toList
  }

  /** @param stages   ordered event-type names, e.g.
    *                 Seq("view", "click", "purchase")
    * @param watermarkDelay lateness bound (drives buffer release) */
  def conversions(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      stageCol: String,
      stages: Seq[String],
      watermarkDelay: String = "10 minutes"): Dataset[Conversion] = {
    import spark.implicits._
    require(stages.nonEmpty, "stages must be non-empty")
    val stageIdx = typedLit(stages.zipWithIndex.toMap)
    val n = stages.length

    df.select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"),
        coalesce(element_at(stageIdx, col(stageCol)), lit(-1)).as("stage"))
      .filter(col("stage") >= 0)
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, events: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          val watermark = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(
            FunnelState(Nil, List.fill(n)(-1L), done = false))
          val pending = st.pending ++
            (if (state.hasTimedOut) Nil
             else events.map(e => (e.ts.getTime, e.stage)).toList)
          val (ready, held) = pending.partition(_._1 <= watermark)
          val times =
            if (st.done) st.times else advance(st.times, ready)
          val converted = !st.done && times.forall(_ != -1L)
          val nowDone = st.done || converted
          if (held.isEmpty && nowDone) {
            // conversion emitted and nothing buffered: the done flag
            // must outlive the state's natural lifetime, so keep a
            // tombstone (3 longs) rather than re-emitting on a
            // post-conversion repeat of the funnel
            state.update(FunnelState(Nil, times, done = true))
          } else {
            state.update(FunnelState(held, times, nowDone))
            if (held.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(held.map(_._1).min, watermark + 1))
          }
          if (converted)
            Iterator.single(
              Conversion(key, times.map(new Timestamp(_))))
          else Iterator.empty
      }
  }
}
