package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Streaming funnel state machine: in-order completion converts,
  * stage-order violations don't, and out-of-order ARRIVAL converges
  * to the batch answer once the watermark releases the buffer. */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel converts in-order users, rejects order violations, buffers out-of-order arrivals") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[(String, Timestamp, String)]
    val out = Funnel.conversions(spark,
      events.toDF().toDF("user", "ts", "event_type"),
      keyCol = "user", tsCol = "ts", stageCol = "event_type",
      stages = Seq("view", "click", "purchase"),
      // the delay must exceed the funnel SPAN for fully-reversed
      // arrival to stay on time: the last stage's arrival advances
      // the watermark, and earlier stages' timestamps sit a full
      // span behind it
      watermarkDelay = "30 minutes")

    val query = out.writeStream
      .format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      events.addData(
        // user a: clean in-order funnel
        ("a", ts("2024-01-01 10:00:00"), "view"),
        ("a", ts("2024-01-01 10:05:00"), "click"),
        ("a", ts("2024-01-01 10:10:00"), "purchase"),
        // user b: purchase timestamp PRECEDES the click — no funnel
        ("b", ts("2024-01-01 10:00:00"), "view"),
        ("b", ts("2024-01-01 10:05:00"), "click"),
        ("b", ts("2024-01-01 10:03:00"), "purchase"))
      query.processAllAvailable()
      // user c arrives REVERSED across batches; with the 30-minute
      // delay every arrival stays on time (the purchase advances the
      // watermark only to 11:40) — the buffer must reorder before
      // folding
      events.addData(("c", ts("2024-01-01 12:10:00"), "purchase"))
      query.processAllAvailable()
      events.addData(("c", ts("2024-01-01 12:05:00"), "click"))
      query.processAllAvailable()
      events.addData(("c", ts("2024-01-01 12:00:00"), "view"))
      query.processAllAvailable()
      // advance the watermark far past every buffered event
      events.addData(("zz", ts("2024-01-01 14:00:00"), "view"))
      query.processAllAvailable()
      query.processAllAvailable()

      val rows = spark.table("funnel_out").collect()
        .map(r => r.getString(0) ->
          r.getSeq[Timestamp](1).map(_.toString).toList).toMap
      assert(rows.keySet == Set("a", "c"), rows.toString)
      assert(rows("a") == List("2024-01-01 10:00:00.0",
        "2024-01-01 10:05:00.0", "2024-01-01 10:10:00.0"))
      assert(rows("c") == List("2024-01-01 12:00:00.0",
        "2024-01-01 12:05:00.0", "2024-01-01 12:10:00.0"))
    } finally query.stop()
  }

  test("advance folds in ts order and enforces strict stage succession") {
    assert(Funnel.advance(List(-1L, -1L), Seq((5L, 1), (3L, 0))) ==
      List(3L, 5L), "reordered fold assigns both stages")
    assert(Funnel.advance(List(-1L, -1L), Seq((3L, 1), (3L, 0))) ==
      List(3L, -1L), "equal timestamps are not strictly after")
    assert(Funnel.advance(List(-1L, -1L), Seq((5L, 1))) ==
      List(-1L, -1L), "stage 1 needs stage 0 first")
    assert(Funnel.advance(List(2L, -1L), Seq((1L, 1), (9L, 1), (10L, 1))) ==
      List(2L, 9L), "first event strictly after the prior stage wins")
  }
}
