package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine._

/** Streaming sources (reference `sqlflow/sources/`): each yields a
  * streaming DataFrame with a single `value: STRING` column (one raw
  * message per row) plus Kafka metadata columns when applicable —
  * matching the reference's Message model (`sources/base.py:8-25`).
  */
object Sources {

  final case class Built(df: DataFrame, onStop: () => Unit = () => ())

  def build(spark: SparkSession, conf: SourceConf,
      batchSize: Option[Int] = None): Built = conf.kind match {
    case "queue" =>
      val q = conf.queue.getOrElse(
        throw new IllegalArgumentException("queue source needs `queue` block"))
      // the embedded Kafka-shaped broker (GraftQueue.scala): identical
      // source contract — value + kafka_* metadata columns, offset
      // ranges checkpointed, batch_size as admission control
      val reader = spark.readStream
        .format("graftqueue")
        .option("brokers", q.brokers)
        .option("topic", q.topic)
        // same unknown-value fallback as the kafka path (drop-in swap
        // parity); the schema rejects non-enum values at load anyway
        .option("startingOffsets",
          if (q.autoOffsetReset == "earliest") "earliest" else "latest")
      Built(batchSize.filter(_ > 0)
        .fold(reader)(n => reader.option("maxMsgsPerTrigger", n))
        .load())

    case "kafka" =>
      val k = conf.kafka.getOrElse(
        throw new IllegalArgumentException("kafka source needs `kafka` block"))
      // Requires the spark-sql-kafka connector jar. Checkpointing
      // replaces the reference's manual commit-after-flush
      // (`pipeline.py:281-291`) with the same at-least-once contract.
      val df = spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", k.brokers.mkString(","))
        .option("subscribe", k.topics.mkString(","))
        .option("startingOffsets",
          if (k.autoOffsetReset == "earliest") "earliest" else "latest")
        .options(
          (if (k.groupId.nonEmpty) Map("kafka.group.id" -> k.groupId) else Map.empty[String, String]) ++
          KafkaOptions.securityOptions(k.securityProtocol, k.ssl, k.sasl))
        .load()
        .selectExpr(
          "CAST(value AS STRING) AS value",
          "offset AS kafka_offset", "partition AS kafka_partition",
          "topic AS kafka_topic")
      Built(df)

    case "file" =>
      val f = conf.file.getOrElse(
        throw new IllegalArgumentException("file source needs `file` block"))
      // count-based batching analogue for files: one file per trigger
      // (the closest unit to the reference's batch_size messages —
      // StreamingPipeline scaladoc "maxFilesPerTrigger (file)")
      Built(spark.readStream
        .option("maxFilesPerTrigger", 1)
        .text(f.path)
        .withColumnRenamed("value", "value"))

    case "webhook" =>
      val w = conf.webhook.getOrElse(
        throw new IllegalArgumentException("webhook source needs `webhook` block"))
      val server = new WebhookServer(spark, w)
      server.start()
      Built(server.stream, () => server.stop())

    case "websocket" =>
      val ws = conf.websocket.getOrElse(
        throw new IllegalArgumentException("websocket source needs `websocket` block"))
      val client = new WebsocketClient(spark, ws.uri)
      client.start()
      Built(client.stream, () => client.stop())

    case other => throw new IllegalArgumentException(s"unknown source type: $other")
  }
}

/** HTTP-push source (reference `sources/webhook.py:57-122`): an
  * embedded HTTP server accepts `POST /events`, optionally verifies an
  * HMAC-SHA256 signature header (`sha256=<hexdigest>` — 400 when
  * missing, 403 on mismatch), and feeds the body into a MemoryStream
  * that Structured Streaming drains per micro-batch. */
final class WebhookServer(spark: SparkSession, conf: WebhookSourceConf) {
  implicit private val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val mem = MemoryStream[String]
  private var server: com.sun.net.httpserver.HttpServer = _

  def stream: DataFrame = mem.toDF().withColumnRenamed("value", "value")

  def port: Int = server.getAddress.getPort

  def start(): Unit = {
    server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(conf.port), 0)
    server.createContext("/events", (exchange: com.sun.net.httpserver.HttpExchange) => {
      try {
        if (exchange.getRequestMethod != "POST") {
          respond(exchange, 405, """{"error": "POST only"}""")
        } else {
          val body = exchange.getRequestBody.readAllBytes()
          conf.signingSecret match {
            case Some(secret) =>
              val provided = Option(
                exchange.getRequestHeaders.getFirst(conf.signatureHeader))
              provided match {
                case None => respond(exchange, 400, """{"error": "Missing HMAC signature"}""")
                case Some(sig) if !constantTimeEquals(sig, expectedSignature(secret, body)) =>
                  respond(exchange, 403, """{"error": "Invalid HMAC signature"}""")
                case _ => accept(exchange, body)
              }
            case None => accept(exchange, body)
          }
        }
      } finally exchange.close()
    })
    server.setExecutor(null)
    server.start()
  }

  private def accept(exchange: com.sun.net.httpserver.HttpExchange,
      body: Array[Byte]): Unit = {
    mem.addData(new String(body, StandardCharsets.UTF_8))
    respond(exchange, 200, """{"status": "received"}""")
  }

  private def respond(exchange: com.sun.net.httpserver.HttpExchange,
      code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(code, bytes.length)
    exchange.getResponseBody.write(bytes)
  }

  def expectedSignature(secret: String, body: Array[Byte]): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    "sha256=" + mac.doFinal(body).map("%02x".format(_)).mkString
  }

  private def constantTimeEquals(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  def stop(): Unit = if (server != null) server.stop(0)
}

/** WebSocket pull source (reference `sources/websocket.py:10-28`):
  * connect to a URI, feed raw text frames into a MemoryStream.
  * Built on the JDK 11+ java.net.http.WebSocket client — no extra
  * dependencies. */
final class WebsocketClient(spark: SparkSession, uri: String) {
  implicit private val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val mem = MemoryStream[String]
  @volatile private var ws: java.net.http.WebSocket = _

  def stream: DataFrame = mem.toDF()

  def start(): Unit = {
    val listener = new java.net.http.WebSocket.Listener {
      private val buf = new StringBuilder
      override def onText(webSocket: java.net.http.WebSocket,
          data: CharSequence, last: Boolean): java.util.concurrent.CompletionStage[_] = {
        buf.append(data)
        if (last) { mem.addData(buf.toString); buf.clear() }
        webSocket.request(1)
        null
      }
    }
    ws = java.net.http.HttpClient.newHttpClient()
      .newWebSocketBuilder()
      .buildAsync(java.net.URI.create(uri), listener)
      .join()
  }

  def stop(): Unit =
    if (ws != null) ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "bye")
}
