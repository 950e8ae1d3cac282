package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Gap-based sessionization semantics: in-batch splits, cross-batch
  * accumulation, and event-time-timeout close. */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split on gap, close on watermark, count events") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = Sessionize.sessions(spark, mem.toDF().toDF("ts", "user"),
      keyCol = "user", tsCol = "ts", gapMinutes = 30,
      watermarkDelay = "5 minutes")

    val query = out.writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: u1 has two clusters separated by > 30m (in-batch split
      // → first emitted immediately); u2 has one event
      mem.addData(
        (ts("2024-01-01 10:00:00"), "u1"),
        (ts("2024-01-01 10:10:00"), "u1"),
        (ts("2024-01-01 11:30:00"), "u1"),
        (ts("2024-01-01 10:05:00"), "u2"))
      query.processAllAvailable()
      // u1's first cluster splits in-batch; u2's lone session times out
      // right away (watermark 11:25 > 10:05 + gap)
      val afterB1 = spark.table("sessions").as[Sessionize.Session].collect()
      assert(afterB1.map(s => (s.key, s.n_events)).toSet ==
        Set(("u1", 2L), ("u2", 1L)))
      val u1First = afterB1.find(_.key == "u1").get
      assert(u1First.session_start == ts("2024-01-01 10:00:00"))
      assert(u1First.session_end == ts("2024-01-01 10:10:00"))

      // batch 2: event extends u1's open session; far-future event
      // advances the watermark past every end+gap → timeouts fire
      mem.addData((ts("2024-01-01 11:40:00"), "u1"))
      query.processAllAvailable()
      mem.addData((ts("2024-01-01 23:00:00"), "u3"))
      query.processAllAvailable()
      // one more batch so timeouts (evaluated against the new watermark) run
      mem.addData((ts("2024-01-01 23:30:00"), "u3"))
      query.processAllAvailable()

      val all = spark.table("sessions").as[Sessionize.Session].collect()
        .map(s => (s.key, s.session_start, s.session_end, s.n_events)).toSet
      assert(all.contains(("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L)))
      assert(all.contains(("u1", ts("2024-01-01 11:30:00"), ts("2024-01-01 11:40:00"), 2L)))
      assert(all.contains(("u2", ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L)))
    } finally query.stop()
  }
}
