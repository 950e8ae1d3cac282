package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.engine._

/** Port of the reference's backbone integration contract
  * (`tests/integration/test_integration.py:25-120`) onto the embedded
  * graftqueue broker — the same assertions the Kafka tests make,
  * minus only the Kafka wire format (docs/adr/0001-kafka-connector.md
  * explains why format("kafka") itself cannot execute in this
  * sandbox):
  *
  *  - publish N synthetic click events → consume loop → EXACTLY N
  *    reach the sink through the handler (test_kafka_mem_iceberg's
  *    count assertion);
  *  - broker → parquet files → read back N (test_local_parquet_sink);
  *  - commit-after-flush at-least-once: kill the daemon mid-stream,
  *    restart from the same checkpoint, and every message is
  *    delivered at least once with batch-level replay only;
  *  - the producer sink round-trips (queue → pipeline → queue);
  *  - all broker partitions feed the stream in parallel.
  */
class GraftQueueSpec extends SparkTestBase {

  private val cities =
    Seq("New York", "Baltimore", "San Francisco", "Austin", "Seattle")

  private def clickEvent(i: Int): String =
    s"""{"id":$i,"event":"search_event_$i","properties":{"city":"${cities(i % 5)}","country":"USA"},""" +
      s""""timestamp":"2015-12-12T19:11:0${i % 10}.249Z","userId":"u${i % 100}"}"""

  private def withBroker(f: GraftQueueBroker => Unit): Unit = {
    val broker = new GraftQueueBroker()
    broker.start()
    try f(broker) finally broker.stop()
  }

  test("broker + client: produce/fetch/endOffsets round-trip over TCP") {
    withBroker { broker =>
      broker.createTopic("t", 3)
      GraftQueueClient.produce(broker.address, "t", 0,
        Seq("a".getBytes, "b".getBytes))
      GraftQueueClient.produce(broker.address, "t", 2, Seq("c".getBytes))
      assert(GraftQueueClient.endOffsets(broker.address, "t") ==
        Map(0 -> 2L, 1 -> 0L, 2 -> 1L))
      assert(GraftQueueClient.fetch(broker.address, "t", 0, 0, 10)
        .map(new String(_)) == Seq("a", "b"))
      assert(GraftQueueClient.fetch(broker.address, "t", 0, 1, 10)
        .map(new String(_)) == Seq("b"))
      assert(GraftQueueClient.readAll(broker.address, "t").sorted ==
        Seq("a", "b", "c"))
    }
  }

  test("reference contract: publish N -> consume loop -> exactly N through handler to sink") {
    withBroker { broker =>
      val n = 5000
      broker.publish("input-events", (0 until n).map(clickEvent), partitions = 4)
      val sink = new MemorySink
      val conf = Config.fromString(
        s"""pipeline:
           |  batch_size: 1000
           |  source:
           |    type: queue
           |    queue: {brokers: '${broker.address}', topic: 'input-events'}
           |  handler:
           |    type: 'handlers.InferredMemBatch'
           |    sql: |
           |      SELECT id, timestamp, properties.city AS city FROM batch
           |  sink: {type: memory}
           |""".stripMargin)
      val running = StreamingPipeline.start(spark, conf, sinkOverride = Some(sink))
      try {
        running.processAllAvailable()
        val rows = sink.allRows
        assert(rows.length == n, s"expected exactly $n rows, got ${rows.length}")
        // every message arrived (ids 0..n-1), each exactly once here
        // (no failure injected, so at-least-once degenerates to once)
        val ids = rows.map(r => """"id":(\d+)""".r.findFirstMatchIn(r).get.group(1).toInt)
        assert(ids.sorted == (0 until n))
        // batch_size admission control: no trigger saw more than
        // batch_size messages -> at least n/batch_size batches ran
        assert(running.batches.get() >= n / 1000, s"batches=${running.batches.get()}")
      } finally running.stop()
    }
  }

  test("reference contract: broker -> parquet sink -> read back exactly N") {
    withBroker { broker =>
      val n = 2000
      broker.publish("topic-parquet", (0 until n).map(clickEvent), partitions = 4)
      val outDir = Files.createTempDirectory("graft_queue_parquet")
      val conf = Config.fromString(
        s"""pipeline:
           |  batch_size: 1000
           |  source:
           |    type: queue
           |    queue: {brokers: '${broker.address}', topic: 'topic-parquet'}
           |  handler:
           |    type: 'handlers.InferredMemBatch'
           |    sql: SELECT id, properties.city AS city FROM batch
           |  sink:
           |    type: sqlcommand
           |    sqlcommand:
           |      sql: COPY sqlflow_sink_batch TO '$outDir/out_$$uuid.parquet' (FORMAT parquet)
           |      substitutions:
           |        - {var: $$uuid, type: uuid4}
           |""".stripMargin)
      val running = StreamingPipeline.start(spark, conf)
      try {
        running.processAllAvailable()
      } finally running.stop()
      val back = spark.read.parquet(s"$outDir/*.parquet")
      assert(back.count() == n)
      assert(back.select("id").distinct().count() == n)
    }
  }

  test("at-least-once across restart: kill mid-stream, resume from checkpoint, no loss") {
    withBroker { broker =>
      val n = 4000
      val ckpt = Files.createTempDirectory("graft_queue_ckpt").toString
      broker.publish("topic-restart", (0 until n / 2).map(clickEvent), partitions = 4)
      val sink = new MemorySink
      def conf = Config.fromString(
        s"""pipeline:
           |  batch_size: 500
           |  source:
           |    type: queue
           |    queue: {brokers: '${broker.address}', topic: 'topic-restart'}
           |  handler:
           |    type: 'handlers.InferredMemBatch'
           |    sql: SELECT id FROM batch
           |  sink: {type: memory}
           |""".stripMargin)
      val run1 = StreamingPipeline.start(spark, conf,
        sinkOverride = Some(sink), checkpointDir = Some(ckpt))
      try run1.processAllAvailable() finally run1.stop()
      val afterFirst = sink.allRows.length
      assert(afterFirst == n / 2, s"first run delivered $afterFirst")

      // second half lands while the daemon is DOWN; restart resumes
      // from the checkpointed offsets — the commit-after-flush
      // contract means nothing from the first run is re-delivered and
      // nothing from the second half is skipped
      broker.publish("topic-restart", (n / 2 until n).map(clickEvent), partitions = 4)
      val run2 = StreamingPipeline.start(spark, conf,
        sinkOverride = Some(sink), checkpointDir = Some(ckpt))
      try run2.processAllAvailable() finally run2.stop()

      val ids = sink.allRows
        .map(r => """"id":(\d+)""".r.findFirstMatchIn(r).get.group(1).toInt)
      assert(ids.distinct.length == n, s"lost ${n - ids.distinct.length} messages")
      assert(ids.length == n, s"redelivered ${ids.length - n} (offsets not committed)")
    }
  }

  test("queue producer sink: pipeline output lands on the broker (kafka-sink contract)") {
    withBroker { broker =>
      val n = 1000
      broker.publish("in-topic", (0 until n).map(clickEvent), partitions = 4)
      val conf = Config.fromString(
        s"""pipeline:
           |  batch_size: 500
           |  source:
           |    type: queue
           |    queue: {brokers: '${broker.address}', topic: 'in-topic'}
           |  handler:
           |    type: 'handlers.InferredMemBatch'
           |    sql: SELECT properties.city AS city, count(*) AS n FROM batch GROUP BY city
           |  sink:
           |    type: queue
           |    queue: {brokers: '${broker.address}', topic: 'out-topic'}
           |""".stripMargin)
      val running = StreamingPipeline.start(spark, conf)
      try running.processAllAvailable() finally running.stop()
      val out = GraftQueueClient.readAll(broker.address, "out-topic")
      assert(out.nonEmpty)
      // per-batch aggregates: summing the emitted counts re-totals N
      val total = out.map(r => """"n":(\d+)""".r.findFirstMatchIn(r).get.group(1).toInt).sum
      assert(total == n, s"producer sink lost rows: $total != $n\n${out.take(5)}")
      out.foreach(r => assert(r.startsWith("{") && r.contains("\"city\"")))
    }
  }

  test("queue source drives the NativeWindow daemon: watermarked aggregation emits on close") {
    // the full Kafka-shaped stack in one test: broker -> DSv2 source
    // (kafka_* metadata columns excluded from the parse) -> declared
    // watermarked streaming aggregation -> emit-on-close sink, with
    // state_partitions sizing the state layout
    withBroker { broker =>
      broker.publish("nw-events", Seq(
        """{"ts":"2015-12-12 19:11:01","city":"Austin"}""",
        """{"ts":"2015-12-12 19:20:02","city":"Austin"}""",
        """{"ts":"2015-12-12 19:40:03","city":"Boston"}"""), partitions = 2)
      val sink = new MemorySink
      val conf = Config.fromString(
        s"""pipeline:
           |  batch_size: 1000
           |  source:
           |    type: queue
           |    queue: {brokers: '${broker.address}', topic: 'nw-events'}
           |  handler:
           |    type: 'handlers.NativeWindow'
           |    window:
           |      time_column: ts
           |      keys: [city]
           |      duration: '1 hour'
           |      watermark: '10 minutes'
           |      state_partitions: 2
           |  sink: {type: memory}
           |""".stripMargin)
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      val running = StreamingPipeline.start(spark, conf, sinkOverride = Some(sink))
      try {
        running.processAllAvailable()
        assert(sink.allRows.isEmpty, sink.allRows.toString)
        // a later event moves the watermark past the 19:00 window
        broker.publish("nw-events",
          Seq("""{"ts":"2015-12-12 21:00:00","city":"Austin"}"""), partitions = 2)
        running.processAllAvailable()
        running.processAllAvailable()
        val rows = sink.allRows.sorted
        assert(rows == Seq(
          """{"bucket":"2015-12-12T19:00:00.000Z","city":"Austin","count":2}""",
          """{"bucket":"2015-12-12T19:00:00.000Z","city":"Boston","count":1}"""),
          rows.toString)
      } finally {
        running.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
    }
  }

  test("all broker partitions feed the stream; kafka_* metadata columns are populated") {
    withBroker { broker =>
      broker.publish("t-parallel", (0 until 400).map(clickEvent), partitions = 4)
      val df = spark.readStream
        .format("graftqueue")
        .option("brokers", broker.address)
        .option("topic", "t-parallel")
        .load()
      assert(df.schema.fieldNames.toSeq ==
        Seq("value", "kafka_offset", "kafka_partition", "kafka_topic"))
      val q = df.writeStream.format("memory").queryName("gq_parallel").start()
      try {
        q.processAllAvailable()
        val got = spark.table("gq_parallel")
        assert(got.count() == 400)
        val parts = got.select("kafka_partition").distinct()
          .collect().map(_.getInt(0)).sorted.toSeq
        assert(parts == Seq(0, 1, 2, 3), s"partitions seen: $parts")
        assert(got.select("kafka_topic").distinct().collect()
          .map(_.getString(0)).toSeq == Seq("t-parallel"))
        // offsets are per-partition and dense from 0
        val maxOff = got.groupBy("kafka_partition")
          .agg(max("kafka_offset").as("m"), count(lit(1)).as("c")).collect()
        maxOff.foreach(r => assert(r.getLong(1) == r.getLong(2) - 1,
          s"offsets not dense: $r"))
      } finally q.stop()
    }
  }
}
