package graft.engine

import org.apache.spark.sql.SparkSession

/** CLI mirroring the reference's `cmd/sql-flow.py:24-126`:
  *
  *   invoke <config.yml> <fixture.jsonl> [--flush-window] [--invoke-sink]
  *     — the dev golden-test runner (`lifecycle.invoke`): one fixture
  *       batch through the pipeline, result rows printed as JSON lines.
  *   validate <config.yml>
  *     — parse + template-render + structural checks, exit non-zero on error.
  *   example
  *     — print a canonical config covering the schema's surface
  *       (reference `config example`, which renders its JSON schema;
  *       ours is curated and kept honest by CliExampleSpec, which
  *       validates it through the same structural checks).
  *   run <config.yml> [--max-batches N]
  *     — the streaming daemon (StreamingPipeline).
  *
  * Config template vars come from `SQLFLOW_*` (or any) environment
  * variables, as in the reference.
  */
object SqlFlowCli {
  /** Outermost layer only: translate [[dispatch]]'s status into the
    * process exit code. Everything below main returns or throws — an
    * in-process caller (tests, embedding) must never have its JVM
    * terminated by a validation failure. */
  def main(args: Array[String]): Unit = {
    val rc = dispatch(args)
    if (rc != 0) sys.exit(rc)
  }

  private[engine] def dispatch(args: Array[String]): Int = {
    if (args.isEmpty) { usage(); return 2 }
    args(0) match {
      case "invoke" =>
        val (flags, pos) = args.drop(1).partition(_.startsWith("--"))
        require(pos.length == 2, "usage: invoke <config.yml> <fixture> [--flush-window] [--invoke-sink]")
        val spark = session()
        val out = Invoke.invoke(spark, pos(0), pos(1),
          flushWindow = flags.contains("--flush-window"),
          invokeSink = flags.contains("--invoke-sink"))
        out.toJSON.collect().foreach(println)
        spark.stop()
      case "validate" =>
        try {
          val raw = new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1))),
            java.nio.charset.StandardCharsets.UTF_8)
          ConfigSchema.validateString(raw)
          val conf = Config.fromString(raw)
          // window/admission handlers declare their block instead of
          // SQL — requiring sql here rejected every shipped non-SQL
          // example config
          val h = conf.pipeline.handler
          require(h.sql.nonEmpty || h.window.nonEmpty ||
            h.nearDup.nonEmpty || h.cosineDup.nonEmpty ||
            h.hammingDup.nonEmpty,
            "handler.sql (or a window/near_dup/cosine_dup/hamming_dup block) is required")
          println(s"OK: source=${conf.pipeline.source.kind} " +
            s"handler=${conf.pipeline.handler.kind} sink=${conf.pipeline.sink.kind} " +
            s"tables=${conf.tables.map(_.name).mkString(",")}")
        } catch {
          case e: Exception =>
            System.err.println(s"INVALID: ${e.getMessage}")
            return 1
        }
      case "example" =>
        println(exampleYaml)
      case "compact-state" =>
        // offline state maintenance for the admission daemons: fold a
        // STOPPED daemon's per-trigger bid partitions into a bucketed
        // compact version (the in-lifecycle path is the
        // compact_every_n_triggers knob; this is the ops escape hatch
        // for daemons run without it). minReplayableBid = the next
        // batch id the restarted stream will process — the fold
        // refuses to cover anything at or above it.
        require(args.length == 5,
          "usage: compact-state <state_dir> <text|cosine|hamming> <upToBid> <minReplayableBid>")
        val (dir, upTo, minReplay) = (args(1), args(3).toLong, args(4).toLong)
        val spark = session()
        val (a, b) = args(2) match {
          case "text" => graft.operators.Dedup
            .compactNearDupState(spark, dir, upTo, minReplay)
          case "cosine" => graft.operators.CosineDedup
            .compactCosineDupState(spark, dir, upTo, minReplay)
          case "hamming" => graft.operators.HammingDedup
            .compactHammingDupState(spark, dir, upTo, minReplay)
          case other => throw new IllegalArgumentException(
            s"unknown state kind '$other' (text|cosine|hamming)")
        }
        println(s"compacted $dir through bid=$upTo: index rows=$a, payload rows=$b")
        spark.stop()
      case "run" =>
        val maxBatches = args.sliding(2).collectFirst {
          case Array("--max-batches", n) => n.toInt
        }
        val metricsPort = args.sliding(2).collectFirst {
          case Array("--metrics-port", p) => p.toInt
        }
        val spark = session()
        graft.streaming.StreamingPipeline.run(spark, args(1), maxBatches, metricsPort)
        spark.stop()
      case other =>
        System.err.println(s"unknown command: $other"); usage(); return 2
    }
    0
  }

  private def usage(): Unit =
    System.err.println(
      "usage: SqlFlowCli (invoke|validate|example|run|compact-state) <config.yml> ...")

  /** Canonical example config: every top-level section, the common
    * source/sink kinds, a managed table, a UDF and an error policy —
    * validated by CliExampleSpec through ConfigSchema. */
  private[engine] val exampleYaml: String =
    """commands:
      |  - name: attach lookups
      |    sql: ATTACH 'jdbc:derby:memory:lookups;create=true' AS lookups (TYPE JDBC)
      |udfs:
      |  - function_name: parse_domain
      |    import_path: graft.udf.parse_domain
      |tables:
      |  sql:
      |    - name: totals
      |      sql: |
      |        CREATE TABLE totals (bucket TIMESTAMPTZ, city STRING, n BIGINT);
      |        CREATE UNIQUE INDEX totals_idx ON totals (bucket, city);
      |      manager:
      |        tumbling_window:
      |          poll_interval_seconds: 10
      |          collect_closed_windows_sql: SELECT * FROM totals
      |          delete_closed_windows_sql: DELETE FROM totals
      |        sink:
      |          type: console
      |pipeline:
      |  batch_size: 1000
      |  flush_interval_seconds: 5
      |  source:
      |    type: kafka
      |    kafka:
      |      brokers: ['{{ KAFKA_BROKERS|default('localhost:9092') }}']
      |      group_id: sqlflow
      |      auto_offset_reset: earliest
      |      topics: [input-topic]
      |  handler:
      |    type: 'handlers.InferredMemBatch'
      |    sql: SELECT city, count(*) AS n FROM batch GROUP BY city
      |  sink:
      |    type: kafka
      |    kafka:
      |      brokers: ['{{ KAFKA_BROKERS|default('localhost:9092') }}']
      |      topic: output-topic
      |  on_error:
      |    policy: DLQ
      |    dlq:
      |      type: console
      |""".stripMargin

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("sqlflow-spark")
      // native expressions callable from handler SQL text
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
