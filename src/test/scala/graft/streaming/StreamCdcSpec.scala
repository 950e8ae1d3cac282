package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

class StreamCdcSpec extends SparkTestBase {
  import spark.implicits._

  private def run(batches: Seq[Seq[(String, Long, String, String)]]):
      Seq[(String, Long, Boolean, String)] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, String)]
    val name = s"cdc_${System.nanoTime()}"
    val q = StreamCdc.materialize(spark,
        mem.toDF().toDF("key", "seq", "op", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
          r.getString(3))).toSeq
    } finally q.stop()
  }

  test("latest seq wins within and across batches; emits only on change") {
    val out = run(Seq(
      Seq(("a", 1L, "I", "v1"), ("a", 3L, "U", "v3"), ("a", 2L, "U", "v2")),
      Seq(("a", 2L, "U", "v2")),          // stale replay: no emission
      Seq(("a", 4L, "U", "v4"))))
    assert(out == Seq(("a", 3L, false, "v3"), ("a", 4L, false, "v4")))
  }

  test("delete emits a tombstone; later insert resurrects") {
    val out = run(Seq(
      Seq(("k", 1L, "I", "x")),
      Seq(("k", 2L, "D", "ignored")),
      Seq(("k", 3L, "I", "y"))))
    assert(out == Seq(("k", 1L, false, "x"), ("k", 2L, true, null),
      ("k", 3L, false, "y")))
  }

  test("keys are independent; at-least-once duplicate batches are no-ops") {
    val b = Seq(("a", 1L, "I", "va"), ("b", 1L, "I", "vb"))
    val out = run(Seq(b, b)).sortBy(_._1)
    assert(out == Seq(("a", 1L, false, "va"), ("b", 1L, false, "vb")))
  }
}
