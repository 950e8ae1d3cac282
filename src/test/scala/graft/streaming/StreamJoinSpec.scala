package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Stream-stream interval join semantics: matches inside the interval,
  * no match outside it, and (left_outer) null-padded emission of
  * never-matched rows once the watermark proves no match can come. */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner interval join matches clicks within the window only") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val out = StreamJoin.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts", "click_src"),
      keyCol = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      within = "10 minutes", delay = "5 minutes")

    val query = out.writeStream
      .format("memory").queryName("sjoin_inner")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:00")),
        (3L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 10:05:00"), "in-window"),      // match
        (2L, ts("2024-01-01 10:20:00"), "too-late"),       // outside interval
        (3L, ts("2024-01-01 09:59:00"), "before-imp"),     // click precedes imp
        (99L, ts("2024-01-01 10:01:00"), "no-imp"))        // unmatched key
      query.processAllAvailable()
      val rows = spark.table("sjoin_inner").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L), rows.mkString(","))
      assert(rows.head.getString(3) == "in-window")
    } finally query.stop()
  }

  test("left_outer emits never-matched impressions after watermark expiry") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val out = StreamJoin.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts", "click_src"),
      keyCol = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      within = "10 minutes", delay = "5 minutes", joinType = "left_outer")

    val query = out.writeStream
      .format("memory").queryName("sjoin_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:00")))
      clicks.addData((1L, ts("2024-01-01 10:03:00"), "converted"))
      query.processAllAvailable()
      // advance BOTH watermarks far past imp_ts + interval + delay so
      // the join state for ad 2 provably cannot match anymore
      imps.addData((50L, ts("2024-01-01 12:00:00")))
      clicks.addData((51L, ts("2024-01-01 12:00:00"), "advance"))
      query.processAllAvailable()
      query.processAllAvailable()
      val rows = spark.table("sjoin_outer").collect()
      val matched = rows.filter(r => r.getLong(0) == 1L)
      val expired = rows.filter(r => r.getLong(0) == 2L)
      assert(matched.length == 1 && matched.head.getString(3) == "converted",
        rows.mkString(","))
      assert(expired.length == 1 && expired.head.isNullAt(2),
        s"expected null-padded row for ad 2: ${rows.mkString(",")}")
    } finally query.stop()
  }
}
