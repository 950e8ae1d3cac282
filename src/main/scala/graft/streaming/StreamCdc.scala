package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC materialization — the live form of the batch
  * [[graft.operators.Cdc]] apply: an I/U/D change feed streams in and
  * the operator maintains latest-state per key, emitting one upsert
  * or tombstone row per key per micro-batch (the feed a downstream
  * idempotent sink applies; the reference's `ON CONFLICT DO UPDATE`
  * accumulation generalized to deletes, running continuously).
  *
  * Ordering: a SEQUENCE number (not arrival order) decides the
  * winner — state keeps only (maxSeq, op, value), so late/duplicate
  * deliveries of OLDER changes are ignored no matter when they
  * arrive (at-least-once safe with NO watermark dependence, because
  * the monotone seq compare never needs to buffer). State per key:
  * one (long, op, value) triple — O(live keys), not O(feed). */
object StreamCdc {

  final case class Change(key: String, seq: Long, op: String, value: String)
  final case class CdcState(seq: Long, op: String, value: String)
  final case class Emit(key: String, seq: Long, deleted: Boolean,
      value: String)

  def materialize(spark: SparkSession, changes: DataFrame): Dataset[Emit] = {
    import spark.implicits._
    changes.select(col("key").cast("string").as("key"),
        col("seq").cast("long").as("seq"),
        upper(col("op")).as("op"), col("value").cast("string").as("value"))
      .as[Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, Emit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Change], state: GroupState[CdcState]) =>
          val newest = rows.foldLeft(state.getOption.orNull) { (acc, c) =>
            if (acc == null || c.seq > acc.seq ||
              (c.seq == acc.seq && acc.op != "D" && c.op == "D"))
              CdcState(c.seq, c.op, c.value)
            else acc
          }
          val changed = newest != null && !state.getOption.contains(newest)
          if (newest != null) state.update(newest)
          if (changed)
            Iterator.single(Emit(key, newest.seq, newest.op == "D",
              if (newest.op == "D") null else newest.value))
          else Iterator.empty
      }
  }
}
