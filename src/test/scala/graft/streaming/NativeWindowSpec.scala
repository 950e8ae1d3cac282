package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Event-time semantics of the native watermarked tumbling window:
  * append mode emits a window exactly once, when the watermark
  * (max event time - delay) passes its end. */
class NativeWindowSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode tumbling window emits on watermark pass, accumulating per key") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = NativeWindow.tumbling(
      mem.toDF().toDF("ts", "city"),
      tsCol = "ts", keyCols = Seq("city"),
      windowDuration = "1 hour", watermarkDelay = "10 minutes")

    val query = out.writeStream
      .format("memory")
      .queryName("native_win")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // two cities in the 19:00 window, one twice
      mem.addData(
        (ts("2015-12-12 19:11:01"), "Austin"),
        (ts("2015-12-12 19:20:02"), "Austin"),
        (ts("2015-12-12 19:40:03"), "Boston"))
      query.processAllAvailable()
      // window still open (watermark = 19:40 - 10m = 19:30 < 20:00)
      assert(spark.table("native_win").count() == 0)

      // an event far enough ahead closes the 19:00 window
      mem.addData((ts("2015-12-12 21:00:00"), "Austin"))
      query.processAllAvailable()
      val rows = spark.table("native_win")
        .select(date_format(col("bucket"), "HH:mm").as("b"), col("city"), col("count"))
        .orderBy("city")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq == Seq(("19:00", "Austin", 2L), ("19:00", "Boston", 1L)))
    } finally query.stop()
  }
}
