package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental batch sessionization: extend a PERSISTED session table
  * with newly-arrived events — without re-reading the historical
  * event log. The property that makes it sound: gap-sessionization is
  * an associative interval closure, so sessions built from ANY
  * partition of the events (not just time-prefixes) merge to the
  * same answer as a direct pass — new events can bridge two existing
  * sessions, extend one, or stand alone, and the islands merge
  * handles every case (the q80 gate proves equality against a direct
  * full-log oracle).
  *
  * Scale shape: the historical input is the SESSION table (one row
  * per session — orders of magnitude smaller than its event log) plus
  * the new-event delta; one key-partitioned window does the merge.
  * This is the batch complement of streaming/Sessionize: the daemon
  * maintains open sessions live, this op folds a backfill/late batch
  * into the stored result. Aggregates carried through merges are
  * exact integers (counts, cents) — no float re-association.
  */
object IncrementalSessions {

  /** Gap-maximal sessions of an event set: (key, start_s, end_s,
    * n_events, cents). Epoch-second LONG bounds; one keyed window. */
  def sessionsOf(
      events: DataFrame, keyCol: String, tsCol: String,
      centsCol: String, gapSec: Long): DataFrame = {
    val ord = Window.partitionBy("key").orderBy(col("__s"))
    events
      .select(col(keyCol).as("key"),
        col(tsCol).cast("long").as("__s"), col(centsCol).as("__c"))
      .withColumn("__prev", lag(col("__s"), 1).over(ord))
      .withColumn("__new",
        when(col("__prev").isNull || col("__s") - col("__prev") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum("__new").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("key", "__sid")
      .agg(min("__s").as("start_s"), max("__s").as("end_s"),
        count(lit(1)).as("n_events"), sum("__c").as("cents"))
      .select("key", "start_s", "end_s", "n_events", "cents")
  }

  /** Islands merge of session/singleton intervals per key: intervals
    * whose start is within `gapSec` of the running maximum end join
    * the island; aggregates add. Emits 1-based per-key session ids in
    * time order (the q58 numbering). */
  def merge(intervals: DataFrame, gapSec: Long): DataFrame = {
    val ord = Window.partitionBy("key").orderBy(col("start_s"), col("end_s"))
    val prevEnd = max(col("end_s")).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val withIsland = intervals
      .withColumn("__new",
        when(prevEnd.isNull || col("start_s") > prevEnd + gapSec, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("__new").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withIsland.groupBy("key", "sess_id")
      .agg(min("start_s").as("start_s"), max("end_s").as("end_s"),
        sum("n_events").as("n_events"), sum("cents").as("cents"))
  }

  /** Fold new events into an existing session table. */
  def incremental(
      existing: DataFrame, newEvents: DataFrame,
      keyCol: String, tsCol: String, centsCol: String,
      gapSec: Long): DataFrame = {
    val singletons = newEvents.select(
      col(keyCol).as("key"),
      col(tsCol).cast("long").as("start_s"),
      col(tsCol).cast("long").as("end_s"),
      lit(1L).as("n_events"),
      col(centsCol).cast("long").as("cents"))
    merge(existing.unionByName(singletons), gapSec)
  }
}
