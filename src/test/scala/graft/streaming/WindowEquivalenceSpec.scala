package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.engine.{Config, Invoke}

/** SURVEY §7.4 risk #1 requires the two tumbling-window paths — the
  * Spark-native watermarked streaming aggregation (`NativeWindow`) and
  * the byte-faithful compat port (StateTable upsert + manager
  * collect/delete poll) — to produce the SAME drained rows for on-time
  * data. Round-1 specs asserted each path in isolation; this spec runs
  * ONE fixture through BOTH and compares the outputs row-for-row,
  * including cross-micro-batch accumulation into the same bucket.
  */
class WindowEquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Two hour-buckets, three keys, out-of-order arrivals, and a key that
  // accumulates across micro-batches within one bucket.
  private val batch1 = Seq(
    (ts("2015-12-12 19:11:01"), "Austin"),
    (ts("2015-12-12 19:20:02"), "Austin"),
    (ts("2015-12-12 19:40:03"), "Boston"),
    (ts("2015-12-12 20:05:00"), "Chicago"))
  private val batch2 = Seq(
    (ts("2015-12-12 19:55:00"), "Austin"),   // late-within-bucket, prior batch's hour
    (ts("2015-12-12 20:30:00"), "Chicago"),
    (ts("2015-12-12 20:45:00"), "Boston"))
  private val expected = Seq(
    ("2015-12-12 19:00:00", "Austin", 3L),
    ("2015-12-12 19:00:00", "Boston", 1L),
    ("2015-12-12 20:00:00", "Boston", 1L),
    ("2015-12-12 20:00:00", "Chicago", 2L))

  private def nativePath(): Seq[(String, String, Long)] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = NativeWindow.tumbling(
      mem.toDF().toDF("ts", "city"),
      tsCol = "ts", keyCols = Seq("city"),
      windowDuration = "1 hour", watermarkDelay = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("win_equiv_native")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1: _*)
      query.processAllAvailable()
      mem.addData(batch2: _*)
      query.processAllAvailable()
      // sentinel far ahead closes every fixture bucket; its own window
      // stays open and is never emitted in append mode
      mem.addData((ts("2015-12-13 09:00:00"), "zz-sentinel"))
      query.processAllAvailable()
      spark.table("win_equiv_native")
        .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss"), col("city"), col("count"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    } finally query.stop()
  }

  private def compatPath(): Seq[(String, String, Long)] = {
    val conf = Config.fromString(
      """tables:
        |  sql:
        |    - name: win_equiv_acc
        |      sql: |
        |        CREATE TABLE win_equiv_acc (bucket TIMESTAMPTZ, city VARCHAR, count INT);
        |        CREATE UNIQUE INDEX win_equiv_acc_idx ON win_equiv_acc (bucket, city);
        |      manager:
        |        tumbling_window:
        |          collect_closed_windows_sql: |
        |            SELECT strftime(date_trunc('hour', bucket), '%Y-%m-%d %H:%M:%S') AS bucket, city, count
        |            FROM win_equiv_acc WHERE bucket < (now()::timestamptz - INTERVAL '60' SECOND)
        |          delete_closed_windows_sql: |
        |            DELETE FROM win_equiv_acc WHERE bucket < (now()::timestamptz - INTERVAL '60' SECOND)
        |        sink: {type: noop}
        |pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      INSERT INTO win_equiv_acc BY NAME
        |      SELECT date_trunc('hour', ts) as bucket, city, count(*) as count
        |      FROM batch GROUP BY bucket, city
        |      ON CONFLICT (bucket, city) DO UPDATE SET count = count + EXCLUDED.count
        |  sink: {type: noop}
        |""".stripMargin)
    val session = Invoke.buildSession(spark, conf)
    session.handler.invoke(spark, batch1.toDF("ts", "city"))
    session.handler.invoke(spark, batch2.toDF("ts", "city"))
    // fixture timestamps are months in the past, so every bucket is
    // closed by the processing-time predicate; flush drains them all
    val flushed = session.managers.head.flush()
    flushed.collect().map(r =>
      (r.getString(0), r.getString(1), r.getAs[Number](2).longValue())).toSeq
  }

  test("native watermark path and compat state-table path drain identical rows") {
    val native = nativePath().sorted
    val compat = compatPath().sorted
    assert(native == expected, s"native: $native")
    assert(compat == expected, s"compat: $compat")
    assert(native == compat)
  }
}
