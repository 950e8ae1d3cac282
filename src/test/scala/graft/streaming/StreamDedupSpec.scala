package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Streaming dedup semantics: duplicates inside the watermark horizon
  * collapse to one emitted row; a replay arriving after state expiry is
  * re-admitted (the documented at-least-once boundary). */
class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("withinWatermark drops redelivered events, re-admits post-horizon replays") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamDedup.withinWatermark(
      mem.toDF().toDF("event_id", "ts", "payload"),
      idCols = Seq("event_id"), tsCol = "ts", delay = "10 minutes")

    val query = out.writeStream
      .format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      // original + two redeliveries inside the horizon, one distinct id
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "a"),
        (1L, ts("2024-01-01 10:00:00"), "a-replay"),
        (2L, ts("2024-01-01 10:01:00"), "b"))
      query.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:02:00"), "a-replay-2"))
      query.processAllAvailable()
      val first = spark.table("sdedup").collect()
      assert(first.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
        first.mkString(","))

      // advance the watermark far past id 1's expiry, then replay it:
      // state is gone → re-admitted (at-least-once boundary)
      mem.addData((99L, ts("2024-01-01 11:00:00"), "advance"))
      query.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 11:00:01"), "late-replay"))
      query.processAllAvailable()
      val ids = spark.table("sdedup").collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 1L) == 2, s"expected re-admission: $ids")
    } finally query.stop()
  }

  test("global dedup never re-admits (unbounded state)") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamDedup.global(mem.toDF().toDF("event_id", "payload"),
      Seq("event_id"))
    val query = out.writeStream
      .format("memory").queryName("sdedup_g")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      query.processAllAvailable()
      mem.addData((1L, "a-replay"), (3L, "c"))
      query.processAllAvailable()
      assert(spark.table("sdedup_g").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 3L))
    } finally query.stop()
  }
}
