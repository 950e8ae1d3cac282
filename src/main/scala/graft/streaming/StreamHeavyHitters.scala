package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous heavy hitters over tumbling windows with BOUNDED state —
  * the streaming complement of `operators/Sketch.heavyHittersRelative`
  * (t62). The native alternative (`groupBy(window, key).count`) keeps
  * one state row per DISTINCT key per window: on a high-cardinality
  * stream (URLs, user ids, query strings) that state grows with the
  * key domain — the streaming scale-killer. This operator keeps a
  * Misra–Gries summary of at most `k` counters per (window, shard):
  * state is k×(key + long) per shard REGARDLESS of cardinality.
  *
  * Guarantee (Misra–Gries '82): within a shard that processed n
  * events, every key with true count > n/k is retained, and a
  * retained counter c satisfies true − n/k ≤ c ≤ true (c never
  * overestimates — it is a usable LOWER bound). Because each key
  * hashes to exactly ONE shard, a key's full window count lives in a
  * single summary: sharding is not an approximation layer, it tightens
  * the bound (n_shard ≪ n) while parallelizing the shuffle — the
  * union of shard summaries IS the global candidate set, no merge
  * stage. Consumers threshold on `count_lb` (exact-count re-check on
  * the candidate set, t62's pattern, applies if exactness is needed).
  *
  * Emission: a window's summaries are emitted once, when the event-
  * time watermark passes the window end (event-time timeout — same
  * close discipline as [[Sessionize]]); late events beyond the
  * watermark are dropped with the window, the standard contract.
  *
  * Scale shape: ONE shuffle keyed by (window, shard) — `shards`
  * uniform keys per window by construction, sized to the cluster, so
  * a hot key cannot straggle a reducer (its events spread over the
  * shard's whole batch, and the per-event state work is O(1) map
  * lookup amortized; the decrement pass is O(k) and happens at most
  * n/k times — total O(n) per shard). */
object StreamHeavyHitters {

  final case class HHEvent(ts: Timestamp, key: String)
  final case class MGState(counters: Map[String, Long], total: Long)
  final case class Candidate(
      window_start: Timestamp,
      shard: Int,
      key: String,
      count_lb: Long,
      shard_total: Long)

  /** One Misra–Gries step: increment a tracked key, admit below
    * capacity, else decrement-all (dropping zeros) — the classic
    * "cancel k distinct occurrences" move that preserves
    * true − n/k ≤ c ≤ true for every key. */
  private[streaming] def mgAdd(
      counters: Map[String, Long], key: String, k: Int): Map[String, Long] =
    counters.get(key) match {
      case Some(c) => counters.updated(key, c + 1)
      case None if counters.size < k => counters.updated(key, 1L)
      case None =>
        counters.flatMap { case (kk, c) =>
          if (c > 1) Some(kk -> (c - 1)) else None
        }
    }

  /** @param k max counters per (window, shard) — the state bound
    * @param shards parallelism of the per-window state (key-hash
    *               partitioned; each key's count is entirely in one
    *               shard) */
  def topKPerWindow(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      windowMinutes: Int,
      watermarkDelay: String = "10 minutes",
      k: Int = 100,
      shards: Int = 32): Dataset[Candidate] = {
    import spark.implicits._
    require(k >= 1 && shards >= 1, "k and shards must be positive")
    val windowMs = windowMinutes * 60000L

    df.select(col(tsCol).as("ts"), col(keyCol).cast("string").as("key"))
      .withWatermark("ts", watermarkDelay)
      .as[HHEvent]
      .groupByKey { e =>
        val w = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
        (w, math.floorMod(e.key.hashCode, shards))
      }
      .flatMapGroupsWithState[MGState, Candidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (gk: (Long, Int), events: Iterator[HHEvent],
         state: GroupState[MGState]) =>
          val (wstart, shard) = gk
          val endMs = wstart + windowMs
          var st = state.getOption.getOrElse(MGState(Map.empty, 0L))
          if (!state.hasTimedOut) {
            events.foreach { e =>
              st = MGState(mgAdd(st.counters, e.key, k), st.total + 1)
            }
          }
          if (state.getCurrentWatermarkMs() >= endMs) {
            state.remove()
            st.counters.toSeq
              .sortBy { case (kk, c) => (-c, kk) }
              .map { case (kk, c) =>
                Candidate(new Timestamp(wstart), shard, kk, c, st.total)
              }
              .iterator
          } else {
            state.update(st)
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }
}
