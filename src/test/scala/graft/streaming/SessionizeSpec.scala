package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Gap-based sessionization semantics: in-batch splits, cross-batch
  * accumulation, out-of-order merging, and watermark-gated close. */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("insert merges bidirectionally and bridges adjacent sessions") {
    import Sessionize.{insert, OpenSession}
    val gap = 30L * 60000
    // extend backward: event before the session start
    assert(insert(List(OpenSession(100000, 100000, 1)), 40000, gap)
      == List(OpenSession(40000, 100000, 2)))
    // separate earlier session when beyond the gap
    val two = insert(List(OpenSession(10000000, 10000000, 1)), 1000, gap)
    assert(two.map(_.n) == List(1, 1) && two.head.startMs == 1000)
    // bridging event merges two open sessions
    val bridged = insert(two, 5000000, gap * 100)
    assert(bridged == List(OpenSession(1000, 10000000, 3)))
  }

  test("sessions split on gap, merge out-of-order, close on watermark") {
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
      // batch 1: u1 has two clusters > 30m apart (in-batch split held
      // in state); u2 has one event. processAllAvailable includes the
      // no-data micro-batch that advances the watermark to 11:25, which
      // closes u1's first session (end+gap=10:40) and u2's (10:35) —
      // emission happens as soon as the watermark permits.
      mem.addData(
        (ts("2024-01-01 10:00:00"), "u1"),
        (ts("2024-01-01 10:10:00"), "u1"),
        (ts("2024-01-01 11:30:00"), "u1"),
        (ts("2024-01-01 10:05:00"), "u2"))
      query.processAllAvailable()

      // batch 2: extends u1's open 11:30 session
      mem.addData(
        (ts("2024-01-01 11:40:00"), "u1"))
      query.processAllAvailable()
      val afterB2 = spark.table("sessions").as[Sessionize.Session].collect()
        .map(s => (s.key, s.session_start, s.session_end, s.n_events)).toSet
      assert(afterB2 == Set(
        ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L),
        ("u2", ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L)))

      // push the watermark far ahead → u1's second session times out
      mem.addData((ts("2024-01-01 23:00:00"), "u3"))
      query.processAllAvailable()
      mem.addData((ts("2024-01-01 23:30:00"), "u3"))
      query.processAllAvailable()

      val all = spark.table("sessions").as[Sessionize.Session].collect()
        .map(s => (s.key, s.session_start, s.session_end, s.n_events)).toSet
      assert(all.contains(("u1", ts("2024-01-01 11:30:00"), ts("2024-01-01 11:40:00"), 2L)))
      assert(all.size == 3)
    } finally query.stop()
  }

  test("withStateConf validates args BEFORE mutating the shared conf") {
    // a require/providerClass failure after the provider set would
    // escape with the session conf permanently polluted — every later
    // streaming query silently on the wrong backend
    val before = spark.conf.getOption(StateStores.ProviderKey)
    intercept[IllegalArgumentException] {
      StateStores.withStateConf(spark, Some("rocksdb"), Some(0)) {
        fail("query must not start on invalid state_partitions")
      }
    }
    assert(spark.conf.getOption(StateStores.ProviderKey) == before)
    intercept[IllegalArgumentException] {
      StateStores.withStateConf(spark, Some("bogus-backend"), None) {
        fail("query must not start on unknown state_store")
      }
    }
    assert(spark.conf.getOption(StateStores.ProviderKey) == before)
  }

  test("sessionize on the RocksDB state backend via StateStores") {
    // the flatMapGroupsWithState state (open-session lists per key) on
    // RocksDBStateStoreProvider: same split/close semantics, state
    // crossing micro-batches off-heap. Also pins the StateStores
    // contract: the session conf is restored IMMEDIATELY after start
    // (not on stop), while the running query keeps the pinned backend
    // in its own conf snapshot.
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = Sessionize.sessions(spark, mem.toDF().toDF("ts", "user"),
      keyCol = "user", tsCol = "ts", gapMinutes = 30,
      watermarkDelay = "5 minutes")
    val before = spark.conf.getOption(StateStores.ProviderKey)
    val query = StateStores.withStateConf(
        spark, Some("rocksdb"), Some(4)) {
      out.writeStream
        .format("memory").queryName("sessions_rocksdb")
        .outputMode(OutputMode.Append())
        .start()
    }
    try {
      // restored already — a co-hosted batch caller never sees the
      // daemon's provider, even while the daemon runs
      assert(spark.conf.getOption(StateStores.ProviderKey) == before,
        "provider conf must restore at start, not at stop")
      mem.addData(
        (ts("2024-01-01 10:00:00"), "u1"),
        (ts("2024-01-01 10:10:00"), "u1"),
        (ts("2024-01-01 11:30:00"), "u1"))
      query.processAllAvailable()
      mem.addData((ts("2024-01-01 23:00:00"), "u3"))
      query.processAllAvailable()
      mem.addData((ts("2024-01-01 23:30:00"), "u3"))
      query.processAllAvailable()
      val got = spark.table("sessions_rocksdb").as[Sessionize.Session].collect()
        .map(s => (s.key, s.session_start, s.session_end, s.n_events)).toSet
      assert(got == Set(
        ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L),
        ("u1", ts("2024-01-01 11:30:00"), ts("2024-01-01 11:30:00"), 1L)))
      // the query really ran on RocksDB: the provider surfaces
      // rocksdb* custom state metrics in progress
      import scala.jdk.CollectionConverters._
      val lp = query.lastProgress
      assert(lp != null && lp.stateOperators.nonEmpty &&
        lp.stateOperators.exists(_.customMetrics.keySet.asScala
          .exists(_.startsWith("rocksdb"))),
        s"expected rocksdb state metrics, got: $lp")
    } finally query.stop()
  }
}
