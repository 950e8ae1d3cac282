package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline session assembly + the batch `invoke` harness — the port
  * of the reference's `lifecycle.invoke` (`sqlflow/lifecycle.py:11-60`),
  * which is its correctness oracle for every golden config test
  * (`tests/test_configs.py:75-300`). One fixture file → one micro-batch
  * → handler SQL → result (optionally: sink invocation and a window
  * flush). */
object Invoke {

  final case class Session(
      conf: Conf,
      tables: Map[String, StateTable],
      managers: Seq[TumblingWindowManager],
      handler: Handler,
      sink: GraftSink,
      dlq: Option[GraftSink],
      /** Serializes handler-batch state mutation against manager polls —
        * the port of the reference's shared `threading.Lock` between
        * `lifecycle.invoke` and `Tumbling.poll`. */
      lock: AnyRef = new Object,
      /** Re-registers every file-backed lookup view (read_csv_auto /
        * read_json_auto). DataFrame-API temp views freeze their file
        * listing at creation (a grown dimension file is silently read
        * at its OLD length); the reference's ATTACH-ed lookups are
        * live per batch, so the streaming path calls this before each
        * trigger's handler SQL. SQL-defined views re-resolve by name
        * per query and pick the fresh registration up automatically. */
      refreshFileViews: () => Unit = () => ())

  /** commands + tables DDL + udfs (reference `lifecycle.start` steps,
    * `pipeline.py:296-313`). */
  def buildSession(spark: SparkSession, conf: Conf,
      sinkOverride: Option[GraftSink] = None,
      managerSinkOverride: Option[GraftSink] = None): Session = {
    val tables = scala.collection.mutable.Map[String, StateTable]()
    val lock = new Object
    val refreshers = scala.collection.mutable.Buffer[() => Unit]()

    Udfs.ensureEngineFunctions(spark)
    // native Catalyst expressions (text_stats, lang_id, …) must resolve
    // from handler SQL even when the session was built without
    // spark.sql.extensions=graft.GraftExtensions (embedded sessions)
    graft.GraftExtensions.ensureRegistered(spark)
    conf.commands.foreach(c => runCommand(spark, c.sql, tables, refreshers))

    conf.tables.foreach { t =>
      val st = StateTable.fromDdl(spark, t.sql)
      tables(st.name) = st
    }
    conf.udfs.foreach(u => Udfs.register(spark, u))

    val managers = conf.tables.flatMap { t =>
      t.manager.flatMap { m =>
        m.tumblingWindow.map { w =>
          val sink = managerSinkOverride.getOrElse(
            Sinks.build(spark, m.sink.getOrElse(SinkConf("noop"))))
          new TumblingWindowManager(spark,
            tables(t.name), w, sink, lock)
        }
      }
    }

    // handler SQL may use inline table functions too (csv.filesystem.join.yml)
    val handlerConf = conf.pipeline.handler.copy(
      sql = registerTableFunctions(spark, conf.pipeline.handler.sql, refreshers))
    val handler = Handlers.build(handlerConf, tables.toMap)
    val sink = sinkOverride.getOrElse(Sinks.build(spark, conf.pipeline.sink))
    val dlq = conf.pipeline.onError.dlq.map(Sinks.build(spark, _))
    val refresh = refreshers.toSeq
    Session(conf, tables.toMap, managers, handler, sink, dlq, lock,
      refreshFileViews = () => refresh.foreach(_.apply()))
  }

  /** Run one setup command (`pipeline.py:296-299`). The closed set used
    * by shipped configs: ATTACH → external database as a Spark catalog
    * namespace (Attachments); USE → current-database switch; CREATE
    * VIEW over read_csv / read_json_auto → Spark reader + temp view;
    * CREATE TABLE → state table (unqualified) or attached catalog
    * table (qualified); INSTALL / LOAD / SET → DuckDB-process
    * concerns with no Spark equivalent, logged and skipped. */
  private[engine] def runCommand(spark: SparkSession, sql: String,
      tables: scala.collection.mutable.Map[String, StateTable],
      refreshers: scala.collection.mutable.Buffer[() => Unit] =
        scala.collection.mutable.Buffer()): Unit = {
    StateTable.splitStatements(sql).foreach { stmt =>
      val up = stmt.trim.toUpperCase
      if (up.startsWith("ATTACH")) {
        val spec = Attachments.parseAttach(stmt).getOrElse(
          throw new IllegalArgumentException(s"cannot parse ATTACH: $stmt"))
        Attachments.attach(spark, spec)
      } else if (up.startsWith("SET")) {
        // DuckDB's httpfs object-store settings (s3.parquet.sink.yml)
        // map onto Hadoop S3A configuration — the SURVEY §2A mapping —
        // so the same config drives Spark's s3a:// writers. Unknown
        // SETs are logged and skipped (engine-specific tuning knobs).
        val setPat = """(?is)^\s*SET\s+(\w+)\s*=\s*'?([^';]*?)'?\s*$""".r
        stmt.trim match {
          case setPat(key, value) if key.toLowerCase.startsWith("s3_") =>
            val hc = spark.sparkContext.hadoopConfiguration
            key.toLowerCase match {
              case "s3_region" => hc.set("fs.s3a.endpoint.region", value)
              case "s3_endpoint" => hc.set("fs.s3a.endpoint", value)
              case "s3_access_key_id" => hc.set("fs.s3a.access.key", value)
              case "s3_secret_access_key" => hc.set("fs.s3a.secret.key", value)
              case "s3_session_token" => hc.set("fs.s3a.session.token", value)
              case "s3_use_ssl" =>
                hc.set("fs.s3a.connection.ssl.enabled", value.trim.toLowerCase)
              case "s3_url_style" =>
                hc.set("fs.s3a.path.style.access",
                  (value.trim.equalsIgnoreCase("path")).toString)
              case other => System.err.println(
                s"[commands] skipping unmapped s3 setting: $other")
            }
          case _ => System.err.println(
            s"[commands] skipping environment command: " +
              stmt.linesIterator.next())
        }
      } else if (up.startsWith("INSTALL") || up.startsWith("LOAD")) {
        System.err.println(s"[commands] skipping environment command: " +
          stmt.linesIterator.next())
      } else if (up.startsWith("CREATE TABLE")) {
        if (!Attachments.createQualifiedTable(spark, stmt)) {
          val st = StateTable.fromDdl(spark, stmt)
          tables(st.name) = st
        }
      } else {
        // session-scoped engine: CREATE VIEW means a temp view (a
        // persistent view can't reference the temp views the inline
        // table functions register)
        val viewFixed = stmt.replaceAll("(?i)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW",
          "CREATE OR REPLACE TEMPORARY VIEW")
        spark.sql(SqlDialect.translate(
          registerTableFunctions(spark, viewFixed, refreshers)))
      }
    }
  }

  /** Replace inline read_csv / read_json_auto calls with temp views
    * backed by the matching Spark reader (delimiter sniffed for CSV,
    * the reference's `auto_detect=True`). Each registration is
    * recorded as a refresher closure: a DataFrame-API temp view
    * freezes its file listing (and file LENGTHS) at creation, so a
    * dimension file that grows between micro-batches would be read
    * truncated at its old size — re-registering re-lists and
    * re-infers, which is what makes file-backed lookups live per
    * trigger like the reference's attached databases. */
  private[engine] def registerTableFunctions(spark: SparkSession, sql: String,
      refreshers: scala.collection.mutable.Buffer[() => Unit] =
        scala.collection.mutable.Buffer()): String = {
    var out = sql
    SqlDialect.findTableFunctions(sql).foreach { fn =>
      val view = "tf_" + math.abs(fn.path.hashCode).toString
      val register: () => Unit = fn.kind match {
        case "read_csv" | "read_csv_auto" =>
          () => {
            val sep = sniffDelimiter(fn.path)
            // inferSchema ≡ DuckDB's auto_detect: numeric columns come
            // back typed (geoip asn ranges), not as strings
            spark.read.option("header", "true").option("sep", sep.toString)
              .option("inferSchema", "true")
              .csv(fn.path).createOrReplaceTempView(view)
          }
        case "read_json_auto" =>
          () => spark.read.json(fn.path).createOrReplaceTempView(view)
      }
      register()
      refreshers += register
      out = out.replace(fn.fullText, view)
    }
    out
  }

  private def sniffDelimiter(path: String): Char = {
    val src = scala.io.Source.fromFile(path)
    try {
      val first = src.getLines().nextOption().getOrElse("")
      Seq('|', '\t', ';', ',').maxBy(c => first.count(_ == c))
    } finally src.close()
  }

  /** Read a JSONL fixture as one micro-batch, applying the decode
    * error policy (`pipeline.py:205-238`): RAISE fails the batch,
    * IGNORE drops bad rows, DLQ routes them as
    * {error, message, phase, timestamp} records (`pipeline.py:228-237`). */
  private[engine] def readBatch(spark: SparkSession, fixturePath: String,
      policy: ErrorPolicyConf, dlq: Option[GraftSink]): DataFrame = {
    val raw0 = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(fixturePath)
    if (!raw0.schema.fieldNames.contains("_corrupt_record")) return raw0
    // Spark disallows filtering on only the corrupt-record column of a
    // lazy json scan; materialize first. The cache is batch-scoped:
    // released in the finally (repeated invoke() must not accumulate
    // cache-manager entries), so the kept rows are checkpointed before
    // the unpersist.
    val raw = raw0.cache()
    try {
      val bad = raw.filter(col("_corrupt_record").isNotNull)
      policy.policy match {
        case "RAISE" =>
          val sample = bad.select("_corrupt_record").head(1)
          throw new IllegalArgumentException(
            s"malformed JSON message: ${sample.headOption.map(_.getString(0)).getOrElse("")}")
        case "IGNORE" =>
          raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
            .localCheckpoint(true)
        case "DLQ" =>
          dlq.foreach { d =>
            d.write(bad.select(
              lit("malformed JSON").as("error"),
              col("_corrupt_record").as("message"),
              lit("handler.write").as("phase"),
              date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp")))
            d.flush()
          }
          raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
            .localCheckpoint(true)
        case other => throw new IllegalArgumentException(s"unknown error policy: $other")
      }
    } finally raw.unpersist()
  }

  /** The golden-test entry point (mirrors `lifecycle.invoke` args:
    * fixture, flush_window, invoke_sink). Returns the handler result,
    * or the flushed window rows when flushWindow is set. */
  def invoke(
      spark: SparkSession,
      configPath: String,
      fixturePath: String,
      vars: Map[String, String] = Map(),
      flushWindow: Boolean = false,
      invokeSink: Boolean = false,
      sinkOverride: Option[GraftSink] = None,
      managerSinkOverride: Option[GraftSink] = None): DataFrame = {
    val conf = Config.fromFile(configPath, vars)
    invokeConf(spark, conf, fixturePath, flushWindow, invokeSink,
      sinkOverride, managerSinkOverride)
  }

  def invokeConf(
      spark: SparkSession,
      conf: Conf,
      fixturePath: String,
      flushWindow: Boolean = false,
      invokeSink: Boolean = false,
      sinkOverride: Option[GraftSink] = None,
      managerSinkOverride: Option[GraftSink] = None): DataFrame = {
    val session = buildSession(spark, conf, sinkOverride, managerSinkOverride)
    val batch = readBatch(spark, fixturePath, conf.pipeline.onError, session.dlq)
    val result = try {
      session.lock.synchronized {
        session.handler.invoke(spark,
          registeredBatch(spark, batch, conf.pipeline.handler, session))
      }
    } catch {
      case e: Throwable if conf.pipeline.onError.policy == "IGNORE" =>
        spark.emptyDataFrame
      case e: Throwable if conf.pipeline.onError.policy == "DLQ" =>
        session.dlq.foreach { d =>
          d.write(errorRecord(spark, e, "handler.invoke"))
          d.flush()
        }
        spark.emptyDataFrame
    }
    if (invokeSink) {
      session.sink.write(result)
      session.sink.flush()
    }
    if (flushWindow && session.managers.nonEmpty)
      session.managers.head.flush()
    else result
  }

  private def registeredBatch(spark: SparkSession, batch: DataFrame,
      h: HandlerConf, s: Session): DataFrame = batch

  private def errorRecord(spark: SparkSession, e: Throwable, phase: String): DataFrame = {
    import spark.implicits._
    Seq((e.toString, "", phase,
      java.time.format.DateTimeFormatter.ISO_INSTANT.format(java.time.Instant.now())))
      .toDF("error", "message", "phase", "timestamp")
  }
}
