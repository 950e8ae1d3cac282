package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Streaming as-of enrichment: each event sees the latest version at
  * or before its timestamp, regardless of arrival order; events
  * before any version get the left-join null; versions older than a
  * newer watermark-passed version are discarded from state. */
class StreamAsofSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of enrichment matches batch semantics across arrival orders") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[(String, Timestamp, Long)]
    val updates = MemoryStream[(String, Timestamp, String)]
    val out = StreamAsof.enrichLatest(spark,
      events.toDF().toDF("k", "ts", "event_id"), "k", "ts", "event_id",
      updates.toDF().toDF("k", "ts", "value"), "k", "ts", "value",
      watermarkDelay = "30 minutes")

    val query = out.writeStream
      .format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // key a: two versions; events straddle both and precede the first
      updates.addData(
        ("a", ts("2024-01-01 10:00:00"), "v1"),
        ("a", ts("2024-01-01 11:00:00"), "v2"))
      events.addData(
        ("a", ts("2024-01-01 09:30:00"), 1L), // before any version
        ("a", ts("2024-01-01 10:30:00"), 2L), // sees v1
        ("a", ts("2024-01-01 11:00:00"), 3L), // same instant: sees v2
        ("a", ts("2024-01-01 11:30:00"), 4L)) // sees v2
      query.processAllAvailable()
      // key b: version arrives AFTER its event (cross-batch,
      // out-of-order) — the buffer must reorder before folding
      events.addData(("b", ts("2024-01-01 12:10:00"), 5L))
      query.processAllAvailable()
      updates.addData(("b", ts("2024-01-01 12:00:00"), "bv")) // ts < event
      query.processAllAvailable()
      // advance the watermark far past everything buffered
      events.addData(("zz", ts("2024-01-01 15:00:00"), 99L))
      updates.addData(("zz", ts("2024-01-01 15:00:00"), "zv"))
      query.processAllAvailable()
      query.processAllAvailable()

      val rows = spark.table("asof_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), Option(r.getString(3))))
        .toSet
      assert(rows.contains(("a", 1L, None)), s"pre-version event: $rows")
      assert(rows.contains(("a", 2L, Some("v1"))), rows.toString)
      assert(rows.contains(("a", 3L, Some("v2"))),
        s"same-instant event must see the version: $rows")
      assert(rows.contains(("a", 4L, Some("v2"))), rows.toString)
      assert(rows.contains(("b", 5L, Some("bv"))),
        s"late-arriving earlier version must still enrich: $rows")
    } finally query.stop()
  }

  test("replay: version register folds in (ts, tag) order, discards stale") {
    // event at t=5 between versions at 3 and 7; version tag sorts
    // before the same-instant event
    val (vTs, v, out) = StreamAsof.replay(Long.MinValue, null, Seq(
      (5L, 1, 10L, null), (3L, 0, -1L, "x"), (7L, 0, -1L, "y"),
      (7L, 1, 11L, null)))
    assert((vTs, v) == (7L, "y"))
    assert(out == List((10L, 5L, "x"), (11L, 7L, "y")))
    // carried state: a prior version enriches until replaced
    val (_, _, out2) = StreamAsof.replay(2L, "old", Seq((4L, 1, 12L, null)))
    assert(out2 == List((12L, 4L, "old")))
  }
}
