package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class StreamDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val ref = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)

  // window 10:00–11:00 matches the reference (10 a, 6 b, 4 c);
  // window 11:00–12:00 is shifted (all "c")
  private def eventsFor(matched: Boolean): Seq[(Timestamp, String)] =
    if (matched)
      Seq.fill(10)(ts("2024-01-01 10:05:00") -> "a") ++
        Seq.fill(6)(ts("2024-01-01 10:10:00") -> "b") ++
        Seq.fill(4)(ts("2024-01-01 10:15:00") -> "c")
    else Seq.fill(20)(ts("2024-01-01 11:05:00") -> "c")

  test("PSI: matched window scores ~0, shifted window scores high; streaming == batch") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamDrift.psiMonitor(
      mem.toDF().toDF("ts", "v"), "ts", col("v"), ref,
      windowDuration = "1 hour", watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(eventsFor(true): _*)
      q.processAllAvailable()
      mem.addData(eventsFor(false): _*)
      q.processAllAvailable()
      // advance the watermark past both windows
      mem.addData(ts("2024-01-01 13:00:00") -> "a")
      q.processAllAvailable()
      val got = spark.table("drift").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(got.length == 2)
      val (w1, w2) = (got(0), got(1))
      assert(w1._2 == 20 && w2._2 == 20)
      assert(w1._3 < 0.01, s"matched window PSI ${w1._3}")
      assert(w2._3 > 0.25, s"shifted window PSI ${w2._3}")

      // the same plan over a batch DataFrame produces identical rows
      val batch = StreamDrift.psiMonitor(
        (eventsFor(true) ++ eventsFor(false)).toDF("ts", "v"),
        "ts", col("v"), ref, "1 hour", "5 minutes")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(batch == got.toSeq)
    } finally q.stop()
  }

  test("values outside the reference fold into __other and count toward drift") {
    val batch = StreamDrift.psiMonitor(
      (Seq.fill(10)(ts("2024-01-01 10:05:00") -> "a") ++
        Seq.fill(10)(ts("2024-01-01 10:06:00") -> "zzz")).toDF("ts", "v"),
      "ts", col("v"), ref, "1 hour", "5 minutes").collect()
    assert(batch.length == 1)
    assert(batch(0).getLong(1) == 20)
    // half the mass in a bin the reference says is empty → large PSI
    assert(batch(0).getDouble(2) > 1.0)
  }

  test("reference is normalized; degenerate histograms rejected") {
    // un-normalized reference (sums to 10) behaves like shares
    val a = StreamDrift.psiMonitor(
      Seq(ts("2024-01-01 10:05:00") -> "a").toDF("ts", "v"),
      "ts", col("v"), Map("a" -> 5.0, "b" -> 3.0, "c" -> 2.0),
      "1 hour", "5 minutes").collect()(0).getDouble(2)
    val b = StreamDrift.psiMonitor(
      Seq(ts("2024-01-01 10:05:00") -> "a").toDF("ts", "v"),
      "ts", col("v"), ref, "1 hour", "5 minutes").collect()(0).getDouble(2)
    assert(a == b)
    intercept[IllegalArgumentException] {
      StreamDrift.psiMonitor(
        Seq(ts("2024-01-01 10:05:00") -> "a").toDF("ts", "v"),
        "ts", col("v"), Map.empty[String, Double], "1 hour", "5 minutes")
    }
  }
}
