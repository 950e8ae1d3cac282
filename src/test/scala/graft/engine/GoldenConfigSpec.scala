package graft.engine

import java.nio.file.{Files, Path}

import graft.SparkTestBase

/** Golden end-to-end config tests — the Scala analogue of the
  * reference's `tests/test_configs.py:75-300`: each YAML pipeline is
  * executed through the batch `invoke` harness against a small JSONL
  * fixture and asserted against the reference's expected row lists. */
class GoldenConfigSpec extends SparkTestBase {

  private lazy val dir: Path = Files.createTempDirectory("graft_golden")

  private def write(name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.createDirectories(p.getParent match { case null => dir; case par => par })
    Files.writeString(p, content)
    p.toString
  }

  private lazy val basicAggFixture = write("basic.agg.jsonl",
    """{"event":"search","properties":{"city":"New York"},"user":{"id":"123412ds"}}
      |{"event":"search","properties":{"city":"Baltimore"},"user":{"id":"123412ds1"}}
      |""".stripMargin)

  private lazy val windowFixture = write("window.jsonl",
    """{"timestamp":"2015-12-12T19:11:01.249Z","event":"search","properties":{"city":"New York"},"user":{"id":"123412ds"}}
      |{"timestamp":"2015-12-12T19:11:01.249Z","event":"search","properties":{"city":"New York"},"user":{"id":"123412ds1"}}
      |{"timestamp":"2015-12-12T19:11:01.249Z","event":"search","properties":{"city":"Baltimore"},"user":{"id":"123412ds1"}}
      |{"timestamp":"2015-12-12T19:11:01.249Z","event":"search","properties":{"city":"Baltimore"},"user":{"id":"123412ds1"}}
      |""".stripMargin)

  private lazy val locationsCsv = write("locations.csv",
    """city|state_short|state_full|county|city_alias
      |New York|NY|New York|NEW YORK|New York
      |New York|NY|New York|NEW YORK|NYC
      |Baltimore|MD|Maryland|BALTIMORE|Baltimore
      |Columbus|OH|Ohio|FRANKLIN|Columbus
      |""".stripMargin)

  test("basic agg mem: GROUP BY over nested field (reference test_basic_agg_mem)") {
    val cfg = write("basic.agg.mem.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT properties.city as city, count(*) as city_count
        |      FROM batch GROUP BY city ORDER BY city DESC
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, basicAggFixture).toJSON.collect().toSeq
    assert(got == Seq(
      """{"city":"New York","city_count":1}""",
      """{"city":"Baltimore","city_count":1}"""))
  }

  test("QUALIFY handler SQL executes end-to-end (alias and inline-window forms)") {
    val fixture = write("qualify.jsonl",
      """{"event":"search","properties":{"city":"New York"},"user":{"id":"u1"}}
        |{"event":"search","properties":{"city":"New York"},"user":{"id":"u2"}}
        |{"event":"search","properties":{"city":"Baltimore"},"user":{"id":"u3"}}
        |""".stripMargin)
    val cfg = write("qualify.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT properties.city AS city, count(*) AS n,
        |             row_number() OVER (ORDER BY count(*) DESC) AS rk
        |      FROM batch GROUP BY city QUALIFY rk = 1
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, fixture).toJSON.collect().toSeq
    assert(got == Seq("""{"city":"New York","n":2,"rk":1}"""))

    val cfg2 = write("qualify2.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT properties.city AS city, user.id AS uid FROM batch
        |      QUALIFY row_number() OVER (PARTITION BY properties.city ORDER BY user.id) = 1
        |      ORDER BY city
        |  sink: {type: noop}
        |""".stripMargin)
    val got2 = Invoke.invoke(spark, cfg2, fixture).toJSON.collect().toSeq
    assert(got2 == Seq(
      """{"city":"Baltimore","uid":"u3"}""",
      """{"city":"New York","uid":"u1"}"""))
  }

  test("list literals and comprehensions in handler SQL execute end-to-end") {
    val fixture = write("listcomp.jsonl",
      """{"event":"a","tags":["x","yy","zzz"]}
        |{"event":"b","tags":["q","rrrr"]}
        |""".stripMargin)
    val cfg = write("listcomp.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT event,
        |             [upper(t) FOR t IN tags IF length(t) >= 2] AS big_tags,
        |             ['k', event] AS keyed
        |      FROM batch ORDER BY event
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, fixture).toJSON.collect().toSeq
    assert(got == Seq(
      """{"event":"a","big_tags":["YY","ZZZ"],"keyed":["k","a"]}""",
      """{"event":"b","big_tags":["RRRR"],"keyed":["k","b"]}"""))
  }

  test("DISTINCT ON handler SQL executes end-to-end (keep-first-per-key)") {
    val fixture = write("don.jsonl",
      """{"user":"u1","city":"Austin","n":3}
        |{"user":"u1","city":"Boston","n":1}
        |{"user":"u2","city":"Denver","n":2}
        |""".stripMargin)
    val cfg = write("don.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT DISTINCT ON (user) user, city, n FROM batch ORDER BY user, n ASC
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, fixture).toJSON.collect().toSeq
    assert(got == Seq(
      """{"user":"u1","city":"Boston","n":1}""",
      """{"user":"u2","city":"Denver","n":2}"""), got.toString)
  }

  test("NativeWindow batch invoke honors dedup_keys (parity with the streaming daemon)") {
    val fixture = write("nw_dedup.jsonl",
      """{"event_id":"e1","ts":"2015-12-12 19:11:01","city":"Austin"}
        |{"event_id":"e2","ts":"2015-12-12 19:12:01","city":"Austin"}
        |{"event_id":"e2","ts":"2015-12-12 19:12:01","city":"Austin"}
        |""".stripMargin)
    val cfg = write("nw_dedup.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.NativeWindow'
        |    window:
        |      time_column: ts
        |      keys: [city]
        |      duration: '1 hour'
        |      watermark: '10 minutes'
        |      dedup_keys: [event_id]
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, fixture).toJSON.collect().toSeq
    // e2's replay collapses: 2 events, not 3 — same as the daemon path
    assert(got == Seq("""{"bucket":"2015-12-12T19:00:00.000Z","city":"Austin","count":2}"""),
      got.toString)
  }

  test("structured batch: validate + insert + query table (reference test_structured_mem)") {
    val cfg = write("structured.mem.yml",
      """commands:
        |  - name: create source buffer table
        |    sql: |
        |      CREATE TABLE source (
        |            event STRING,
        |            properties STRUCT(city TEXT),
        |            user STRUCT(id TEXT)
        |      );
        |pipeline:
        |  batch_size: 1
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: "handlers.StructuredBatch"
        |    table: source
        |    sql: |
        |      SELECT properties.city as city, 1 as city_count FROM source
        |  sink: {type: console}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, basicAggFixture).toJSON.collect().toSet
    assert(got == Set(
      """{"city":"New York","city_count":1}""",
      """{"city":"Baltimore","city_count":1}"""))
  }

  test("structured batch tolerates engine-attached kafka_* metadata columns") {
    import spark.implicits._
    val conf = Config.fromString(
      """commands:
        |  - name: t
        |    sql: "CREATE TABLE buf (event STRING);"
        |pipeline:
        |  batch_size: 1
        |  source: {type: kafka, kafka: {brokers: [b:9092], group_id: t, topics: [in]}}
        |  handler: {type: "handlers.StructuredBatch", table: buf, sql: "SELECT event FROM buf ORDER BY event"}
        |  sink: {type: memory}
        |""".stripMargin)
    val sink = new MemorySink
    val session = Invoke.buildSession(spark, conf, Some(sink))
    // a kafka-source batch: payload + engine-attached metadata columns
    val raw = Seq(("""{"event":"a"}""", 1L, 0, "clicks"))
      .toDF("value", "kafka_offset", "kafka_partition", "kafka_topic")
    graft.streaming.StreamingPipeline.processBatch(
      spark, session, conf.pipeline.onError, raw)
    assert(sink.allRows == Seq("""{"event":"a"}"""))
  }

  test("structured batch rejects columns missing from the table schema") {
    val cfg = write("structured.bad.yml",
      """commands:
        |  - name: t
        |    sql: "CREATE TABLE narrow (event STRING);"
        |pipeline:
        |  batch_size: 1
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler: {type: "handlers.StructuredBatch", table: narrow, sql: "SELECT * FROM narrow"}
        |  sink: {type: noop}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      Invoke.invoke(spark, cfg, basicAggFixture)
    }
    assert(e.getMessage.contains("not in table"))
  }

  test("csv mem join via correlated LIMIT 1 subquery rewrite (reference test_csv_mem_join)") {
    val cfg = write("csv.mem.join.yml",
      s"""commands:
         |  - name: register locations CSV view
         |    sql: |
         |      CREATE VIEW locations AS
         |        SELECT * FROM read_csv_auto('$locationsCsv', header=True);
         |pipeline:
         |  batch_size: 1000
         |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
         |  handler:
         |    type: 'handlers.InferredMemBatch'
         |    sql: |
         |      SELECT
         |        properties.city,
         |        state_full
         |      FROM batch
         |      LEFT JOIN (
         |        SELECT *
         |          FROM locations
         |          WHERE locations.city = properties.city
         |        LIMIT 1
         |      ) AS single_location ON single_location.city = properties.city
         |      ORDER BY properties.city ASC;
         |  sink: {type: noop}
         |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, windowFixture).toJSON.collect().toSeq
    assert(got == Seq(
      """{"city":"Baltimore","state_full":"Maryland"}""",
      """{"city":"Baltimore","state_full":"Maryland"}""",
      """{"city":"New York","state_full":"New York"}""",
      """{"city":"New York","state_full":"New York"}"""))
  }

  test("csv filesystem join: inline read_csv + group by (reference test_csv_filesystem_join)") {
    val cfg = write("csv.fs.join.yml",
      s"""pipeline:
         |  batch_size: 1000
         |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
         |  handler:
         |    type: 'handlers.InferredMemBatch'
         |    sql: |
         |      SELECT state_full, count(*) as city_count
         |      FROM batch
         |      JOIN read_csv('$locationsCsv', auto_detect=True, header=True) as locations ON
         |      ( locations.city = properties.city )
         |      GROUP BY state_full ORDER BY state_full DESC
         |  sink: {type: noop}
         |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, windowFixture).toJSON.collect().toSeq
    // New York appears twice in the CSV (alias row) → 2 events × 2 rows
    assert(got == Seq(
      """{"state_full":"New York","city_count":4}""",
      """{"state_full":"Maryland","city_count":2}"""))
  }

  test("enrich: SELECT * + struct literal + literal column (reference test_enrich)") {
    val fixture = write("enrich.jsonl",
      """{"event":"search","properties":{"city":"New York"},"user":{"id":"123412ds"}}
        |""".stripMargin)
    val cfg = write("enrich.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT
        |        *,
        |        {'something': properties.city} as nested_city,
        |        'extra' as extra
        |      FROM batch
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, fixture).toJSON.collect().toSeq
    assert(got == Seq(
      """{"event":"search","properties":{"city":"New York"},"user":{"id":"123412ds"},"nested_city":{"something":"New York"},"extra":"extra"}"""))
  }

  test("tumbling window: upsert handler + manager flush (reference test_tumbling_window)") {
    val sink = new MemorySink
    val cfg = write("tumbling.window.yml",
      """tables:
        |  sql:
        |    - name: agg_cities_count
        |      sql: |
        |        CREATE TABLE agg_cities_count (
        |          bucket TIMESTAMPTZ,
        |          city VARCHAR,
        |          count INT
        |        );
        |        CREATE UNIQUE INDEX daily_cities_count_idx ON agg_cities_count (bucket, city);
        |      manager:
        |        tumbling_window:
        |          collect_closed_windows_sql: |
        |            SELECT
        |              strftime(date_trunc('hour', bucket), '%Y-%m-%dT%H:%M:%S') AS bucket,
        |              city,
        |              count
        |            FROM agg_cities_count
        |            WHERE bucket < (now()::timestamptz - INTERVAL '60' SECOND)
        |            ORDER BY city
        |          delete_closed_windows_sql: |
        |            DELETE FROM agg_cities_count
        |            WHERE bucket < (now()::timestamptz - INTERVAL '60' SECOND)
        |        sink: {type: noop}
        |pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      INSERT INTO agg_cities_count
        |      BY NAME
        |      SELECT
        |        date_trunc('hour', CAST(timestamp as TIMESTAMP)) as bucket,
        |        properties.city as city,
        |        count(*) as count
        |      FROM batch
        |      GROUP BY bucket, city
        |      ON CONFLICT (bucket, city)
        |      DO UPDATE SET count = count + EXCLUDED.count
        |  sink: {type: noop}
        |""".stripMargin)
    val flushed = Invoke.invoke(spark, cfg, windowFixture,
      flushWindow = true, managerSinkOverride = Some(sink))
      .toJSON.collect().toSeq
    assert(flushed == Seq(
      """{"bucket":"2015-12-12T19:00:00","city":"Baltimore","count":2}""",
      """{"bucket":"2015-12-12T19:00:00","city":"New York","count":2}"""))
    assert(sink.allRows == flushed)
  }

  test("tumbling window accumulates across batches (ON CONFLICT additive)") {
    val cfgText =
      """tables:
        |  sql:
        |    - name: acc
        |      sql: |
        |        CREATE TABLE acc (bucket TIMESTAMPTZ, city VARCHAR, count INT);
        |        CREATE UNIQUE INDEX acc_idx ON acc (bucket, city);
        |      manager:
        |        tumbling_window:
        |          collect_closed_windows_sql: |
        |            SELECT strftime(date_trunc('hour', bucket), '%Y-%m-%dT%H:%M:%S') AS bucket, city, count
        |            FROM acc WHERE bucket < (now()::timestamptz - INTERVAL '60' SECOND) ORDER BY city
        |          delete_closed_windows_sql: |
        |            DELETE FROM acc WHERE bucket < (now()::timestamptz - INTERVAL '60' SECOND)
        |        sink: {type: noop}
        |pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      INSERT INTO acc BY NAME
        |      SELECT date_trunc('hour', CAST(timestamp as TIMESTAMP)) as bucket,
        |             properties.city as city, count(*) as count
        |      FROM batch GROUP BY bucket, city
        |      ON CONFLICT (bucket, city) DO UPDATE SET count = count + EXCLUDED.count
        |  sink: {type: noop}
        |""".stripMargin
    val conf = Config.fromString(cfgText)
    val session = Invoke.buildSession(spark, conf)
    val batch = spark.read.json(windowFixture)
    session.handler.invoke(spark, batch) // batch 1
    session.handler.invoke(spark, batch) // batch 2: same keys → counts double
    val state = session.tables("acc").df.orderBy("city").toJSON.collect().toSeq
    assert(state.exists(_.contains(""""city":"Baltimore","count":4""")), state.toString)
    assert(state.exists(_.contains(""""city":"New York","count":4""")), state.toString)
  }

  test("NativeWindow handler: additive COUNT+SUM per window (ADR scope)") {
    val fixture = write("nw_sum.jsonl",
      """{"ts":"2015-12-12 19:05:00","city":"Austin","amount":2.5}
        |{"ts":"2015-12-12 19:55:00","city":"Austin","amount":1.5}
        |{"ts":"2015-12-12 19:30:00","city":"Boston","amount":10.0}
        |{"ts":"2015-12-12 20:10:00","city":"Austin","amount":7.0}
        |""".stripMargin)
    val cfg = write("native.sum.yml",
      """pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.NativeWindow'
        |    window:
        |      time_column: ts
        |      keys: [city]
        |      duration: '1 hour'
        |      watermark: '10 minutes'
        |      sums: [amount]
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, fixture)
      .selectExpr("date_format(bucket, 'HH:mm') AS b", "city", "count", "sum_amount")
      .orderBy("b", "city")
      .toJSON.collect().toSeq
    assert(got == Seq(
      """{"b":"19:00","city":"Austin","count":2,"sum_amount":4.0}""",
      """{"b":"19:00","city":"Boston","count":1,"sum_amount":10.0}""",
      """{"b":"20:00","city":"Austin","count":1,"sum_amount":7.0}"""))
  }

  test("sqlcommand sink: COPY to parquet writes one file per flush (reference test_local_parquet_sink)") {
    val outDir = Files.createTempDirectory("graft_parquet_sink")
    val cfg = write("local.parquet.sink.yml",
      s"""pipeline:
         |  batch_size: 5000
         |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
         |  handler:
         |    type: 'handlers.InferredMemBatch'
         |    sql: |
         |      SELECT COUNT(*) as num_records FROM batch
         |  sink:
         |    type: sqlcommand
         |    sqlcommand:
         |      substitutions:
         |        - var: $$sqlflow_uuid
         |          type: uuid4
         |      sql: |
         |        COPY sqlflow_sink_batch
         |          TO '$outDir/$$sqlflow_uuid.parquet'
         |        (FORMAT 'parquet');
         |""".stripMargin)
    val res = Invoke.invoke(spark, cfg, windowFixture, invokeSink = true)
      .toJSON.collect().toSeq
    assert(res == Seq("""{"num_records":4}"""))
    val files = outDir.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    val back = spark.read.parquet(files(0).getAbsolutePath).toJSON.collect().toSeq
    assert(back == Seq("""{"num_records":4}"""))
  }

  test("udf: parse_domain registered from import path (reference test_udf)") {
    val fixture = write("udf.jsonl",
      """{"url": "https://google.com"}
        |{"url": "https://cloudflare.com"}
        |{"url": "https://duckdb.org/docs/api/python/function.html"}
        |""".stripMargin)
    val cfg = write("udf.yml",
      """udfs:
        |  - function_name: parse_domain
        |    import_path: sqlflow.udf.url.parse_domain
        |pipeline:
        |  batch_size: 1000
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT parse_domain(url) as domain FROM batch
        |  sink: {type: noop}
        |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, fixture).toJSON.collect().toSet
    assert(got == Set(
      """{"domain":"google.com"}""",
      """{"domain":"cloudflare.com"}""",
      """{"domain":"duckdb.org"}"""))
  }

  test("error policy: RAISE fails on malformed JSON; IGNORE drops; DLQ routes") {
    val fixture = write("bad.jsonl",
      """{"event":"ok","properties":{"city":"A"}}
        |{not json at all
        |{"event":"ok2","properties":{"city":"B"}}
        |""".stripMargin)
    def cfg(policy: String) = write(s"err.$policy.yml",
      s"""pipeline:
         |  batch_size: 10
         |  on_error:
         |    policy: $policy
         |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
         |  handler:
         |    type: 'handlers.InferredMemBatch'
         |    sql: |
         |      SELECT count(*) as n FROM batch
         |  sink: {type: noop}
         |""".stripMargin)
    intercept[IllegalArgumentException] {
      Invoke.invoke(spark, cfg("RAISE"), fixture)
    }
    val ignored = Invoke.invoke(spark, cfg("IGNORE"), fixture).toJSON.collect().toSeq
    assert(ignored == Seq("""{"n":2}"""))

    val conf = Config.fromString(Files.readString(java.nio.file.Paths.get(cfg("DLQ")))
      .replace("policy: DLQ", "policy: DLQ\n    dlq: {type: memory}"))
    val got = Invoke.invokeConf(spark, conf, fixture)
    assert(got.toJSON.collect().toSeq == Seq("""{"n":2}"""))
  }

  test("kafka.dlq shape: handler errors and malformed rows route to the DLQ (reference kafka.dlq.yml)") {
    val fixture = write("dlq.jsonl",
      """{"event":"ok","properties":{"city":"A"}}
        |{not json at all
        |""".stripMargin)
    // the reference config selects a column the events do not carry
    // ("broken") and routes failures to a kafka DLQ topic; memory
    // stands in for the topic here. Both DLQ phases must fire: the
    // malformed row at decode, the handler error at invoke.
    import spark.implicits._
    val conf = Config.fromString(
      """pipeline:
        |  batch_size: 1000
        |  on_error:
        |    policy: DLQ
        |    dlq: {type: memory}
        |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      SELECT broken FROM batch
        |  sink: {type: console}
        |""".stripMargin)
    val session = Invoke.buildSession(spark, conf)
    val raw = Files.readAllLines(java.nio.file.Paths.get(fixture))
      .toArray(Array.empty[String]).toSeq.toDF("value")
    graft.streaming.StreamingPipeline.processBatch(
      spark, session, conf.pipeline.onError, raw)
    val dlqRows = session.dlq.get.asInstanceOf[MemorySink].allRows
    assert(dlqRows.exists(r =>
      r.contains(""""error":"malformed JSON"""") && r.contains("not json")))
    assert(dlqRows.exists(r => r.contains(""""phase":"handler.invoke"""")))
  }

  test("iceberg sink: writeTo(...).append() verified against the session catalog (reference kafka.mem.iceberg.yml)") {
    spark.sql("DROP TABLE IF EXISTS default.city_events_golden")
    spark.sql("CREATE TABLE default.city_events_golden (timestamp TIMESTAMP, city STRING) USING parquet")
    try {
      val cfg = write("iceberg.yml",
        """pipeline:
          |  batch_size: 5000
          |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
          |  handler:
          |    type: 'handlers.InferredMemBatch'
          |    sql: |
          |      SELECT CAST(timestamp as TIMESTAMP) as timestamp, properties.city as city
          |      FROM batch ORDER BY timestamp, city DESC
          |  sink:
          |    type: iceberg
          |    iceberg:
          |      catalog_name: spark_catalog
          |      table_name: default.city_events_golden
          |""".stripMargin)
      Invoke.invoke(spark, cfg, windowFixture, invokeSink = true)
      val back = spark.table("default.city_events_golden")
      assert(back.count() == 4)
      assert(back.selectExpr("city").distinct().collect().map(_.getString(0)).toSet ==
        Set("New York", "Baltimore"))
    } finally spark.sql("DROP TABLE IF EXISTS default.city_events_golden")
  }

  test("s3 parquet sink shape: SET commands skip, COPY targets the basepath (reference s3.parquet.sink.yml)") {
    val outDir = Files.createTempDirectory("graft_s3_sink")
    val fixture = write("s3.jsonl",
      """{"timestamp":"2020-01-01 00:00:00","user_id":1,"action":"click","browser":"ff"}
        |""".stripMargin)
    val cfg = write("s3.parquet.sink.yml",
      s"""commands:
         |  - name: Install Extensions
         |    sql: |
         |      INSTALL httpfs;
         |      LOAD httpfs;
         |  - name: Configure s3
         |    sql: |
         |      SET s3_region='us-east-1';
         |      SET s3_url_style='path';
         |      SET s3_endpoint='localhost:9000';
         |      SET s3_use_ssl=false;
         |pipeline:
         |  batch_size: 1
         |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
         |  handler:
         |    type: 'handlers.InferredMemBatch'
         |    sql: |
         |      SELECT CAST(timestamp as TIMESTAMP) as timestamp, user_id, action, browser
         |      FROM batch
         |  sink:
         |    type: sqlcommand
         |    sqlcommand:
         |      substitutions:
         |        - var: $$sqlflow_uuid
         |          type: uuid4
         |      sql: |
         |        COPY sqlflow_sink_batch
         |          TO '{{ SQLFLOW_SINK_BASEPATH }}/$$sqlflow_uuid.parquet'
         |        (FORMAT 'parquet');
         |""".stripMargin)
    Invoke.invoke(spark, cfg, fixture, invokeSink = true,
      vars = Map("SQLFLOW_SINK_BASEPATH" -> outDir.toString))
    val files = outDir.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    assert(spark.read.parquet(files(0).getAbsolutePath).count() == 1)
  }

  test("github webhook → attached table (reference github.motherduck.yml)") {
    spark.sql("DROP DATABASE IF EXISTS gh_db CASCADE")
    val fixture = write("github.jsonl",
      """{"action":"opened","issue":{"id":11,"title":"t1","number":7,"user":{"login":"ada"}},"repository":{"name":"r1","id":99}}
        |""".stripMargin)
    val cfg = write("github.motherduck.yml",
      """commands:
        |  - name: attach to motherduck
        |    sql: |
        |      ATTACH 'md:gh_db'
        |  - name: create issues table
        |    sql: |
        |      CREATE TABLE IF NOT EXISTS gh_db.issues (
        |        action VARCHAR, issue_id VARCHAR, issue_title VARCHAR,
        |        issue_number VARCHAR, issue_user_login VARCHAR,
        |        repo_name VARCHAR, repo_id VARCHAR
        |      )
        |pipeline:
        |  batch_size: 1
        |  source:
        |    type: webhook
        |    webhook:
        |      signature_type: 'hmac'
        |      hmac:
        |        header: 'X-Hub-Signature-256'
        |        sig_key: 'sha256'
        |        secret: 's3cret'
        |  handler:
        |    type: 'handlers.InferredMemBatch'
        |    sql: |
        |      INSERT INTO gh_db.issues
        |      SELECT
        |        action,
        |        issue ->> 'id' AS issue_id,
        |        issue ->> 'title' AS issue_title,
        |        issue ->> 'number' AS issue_number,
        |        issue ->> 'user' ->> 'login' AS issue_user_login,
        |        repository ->> 'name' AS repo_name,
        |        repository ->> 'id' AS repo_id
        |      FROM batch;
        |  sink: {type: noop}
        |""".stripMargin)
    try {
      val conf = Config.fromFile(cfg)
      // the nested hmac block parses into the webhook model
      assert(conf.pipeline.source.webhook.get.signingSecret.contains("s3cret"))
      assert(conf.pipeline.source.webhook.get.signatureHeader == "X-Hub-Signature-256")
      Invoke.invoke(spark, cfg, fixture)
      val rows = spark.table("gh_db.issues").toJSON.collect().toSeq
      assert(rows == Seq(
        """{"action":"opened","issue_id":"11","issue_title":"t1","issue_number":"7","issue_user_login":"ada","repo_name":"r1","repo_id":"99"}"""))
    } finally spark.sql("DROP DATABASE IF EXISTS gh_db CASCADE")
  }

  test("handler SQL can use DuckDB ASOF JOIN grammar (dialect interval rewrite)") {
    // price quotes as a CSV view; each event picks the latest quote at
    // or before its timestamp — the stream-enrichment asof shape,
    // written in DuckDB's native grammar and run through the engine
    val quotesCsv = write("quotes.csv",
      """city,quote_ts,price
        |New York,2015-12-12T19:10:00.000Z,10
        |New York,2015-12-12T19:11:00.000Z,20
        |New York,2015-12-12T19:12:00.000Z,30
        |Baltimore,2015-12-12T19:00:00.000Z,5
        |""".stripMargin)
    val cfg = write("asof.enrich.yml",
      s"""commands:
         |  - name: register quotes view
         |    sql: |
         |      CREATE VIEW quotes AS
         |        SELECT city, CAST(quote_ts AS TIMESTAMP) AS quote_ts, price
         |        FROM read_csv_auto('$quotesCsv', header=True);
         |pipeline:
         |  batch_size: 1000
         |  source: {type: kafka, kafka: {brokers: [localhost:9092], group_id: t, topics: [in]}}
         |  handler:
         |    type: 'handlers.InferredMemBatch'
         |    sql: |
         |      SELECT b.properties.city AS city, q.price
         |      FROM (SELECT *, CAST(timestamp AS TIMESTAMP) AS ts FROM batch) b
         |      ASOF LEFT JOIN quotes q
         |        ON b.properties.city = q.city AND b.ts >= q.quote_ts
         |      ORDER BY city, q.price;
         |  sink: {type: noop}
         |""".stripMargin)
    val got = Invoke.invoke(spark, cfg, windowFixture).toJSON.collect().toSeq
    // events at 19:11:01 → New York picks the 19:11 quote (20), never
    // the later 19:12 one; Baltimore picks its only earlier quote (5)
    assert(got == Seq(
      """{"city":"Baltimore","price":5}""",
      """{"city":"Baltimore","price":5}""",
      """{"city":"New York","price":20}""",
      """{"city":"New York","price":20}"""))
  }

  test("config template rendering: overrides beat env beat defaults") {
    val raw = "a: {{ MISSING_VAR|default('fallback') }}\nb: {{ OV|default(7) }}"
    assert(Config.renderTemplate(raw, Map("OV" -> "9")) == "a: fallback\nb: 9")
    intercept[IllegalArgumentException] {
      Config.renderTemplate("x: {{ NO_DEFAULT_HERE }}", Map())
    }
  }
}
