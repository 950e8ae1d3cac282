package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Bounded-state streaming heavy hitters: the Misra–Gries invariants
  * (never overestimates, heavy key always survives, ≤ k counters) and
  * the windowed close/cross-batch accumulation discipline. */
class StreamHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._
  import StreamHeavyHitters.{mgAdd, Candidate}

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mgAdd never overestimates, bounds size by k, keeps the majority key") {
    val rnd = new scala.util.Random(7)
    val k = 5
    // 60 occurrences of "hot" mixed into 100 distinct tail keys
    val stream = rnd.shuffle(
      Seq.fill(60)("hot") ++ (1 to 100).map(i => s"tail$i"))
    var m = Map.empty[String, Long]
    stream.foreach(kk => m = mgAdd(m, kk, k))
    assert(m.size <= k)
    val n = stream.size
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong)
    m.foreach { case (kk, c) =>
      assert(c <= trueCounts(kk), s"$kk overestimated: $c")
      assert(c >= trueCounts(kk) - n / k, s"$kk below the MG bound")
    }
    // hot count 60 > n/k = 32 → guaranteed retained
    assert(m.contains("hot"))
  }

  test("windowed heavy hitters close on watermark, accumulate across batches") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamHeavyHitters.topKPerWindow(
      spark, mem.toDF().toDF("ts", "key"),
      keyCol = "key", tsCol = "ts", windowMinutes = 60,
      watermarkDelay = "5 minutes", k = 4, shards = 2)

    val query = out.writeStream
      .format("memory").queryName("hh")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // window 10:00–11:00: "hot" dominates, split over two batches to
      // prove cross-batch state accumulation
      mem.addData(
        (Seq.fill(10)(ts("2024-01-01 10:05:00") -> "hot") ++
          Seq("a", "b", "c", "d", "e", "f")
            .map(kk => ts("2024-01-01 10:10:00") -> kk)): _*)
      query.processAllAvailable()
      mem.addData(
        (Seq.fill(10)(ts("2024-01-01 10:20:00") -> "hot") ++
          Seq("g", "h", "i")
            .map(kk => ts("2024-01-01 10:25:00") -> kk)): _*)
      query.processAllAvailable()
      assert(spark.table("hh").isEmpty, "window must not emit before close")

      // an 11:30 event pushes the watermark past 11:00 → window closes
      mem.addData((ts("2024-01-01 11:30:00"), "late-window"))
      query.processAllAvailable()

      val rows = spark.table("hh").as[Candidate].collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.window_start == ts("2024-01-01 10:00:00")))
      // per-shard summary size is bounded by k
      rows.groupBy(_.shard).foreach { case (_, rs) => assert(rs.size <= 4) }
      // hot: 20 true occurrences, alone in its shard's majority — its
      // MG lower bound must survive and never overestimate
      val hot = rows.filter(_.key == "hot")
      assert(hot.size == 1)
      assert(hot.head.count_lb <= 20 &&
        hot.head.count_lb >= 20 - hot.head.shard_total / 4)
      // every emitted counter is a lower bound on its true count
      val trueCounts = Map("hot" -> 20L).withDefaultValue(1L)
      rows.foreach(r => assert(r.count_lb <= trueCounts(r.key)))
    } finally query.stop()
  }
}
