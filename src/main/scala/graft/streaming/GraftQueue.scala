package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** Embedded partitioned message broker with Kafka-shaped semantics —
  * topics split into offset-addressed partitions, producers append,
  * consumers fetch by (partition, offset) over REAL TCP.
  *
  * Why this exists: the reference's backbone integration test
  * (`tests/integration/test_integration.py:25-120`) publishes N
  * messages to a broker and asserts the consume loop delivers exactly
  * N through handler and sink. This sandbox has neither a Kafka
  * broker nor the spark-sql-kafka connector jars (zero egress — see
  * docs/adr/0001-kafka-connector.md), so that contract is ported onto
  * this broker + the [[GraftQueueProvider]] DataSource V2 connector:
  * the same offset/partition/commit semantics, the same at-least-once
  * ordering, every byte moving through a socket. Swapping
  * `format("graftqueue")` for `format("kafka")` is a config change;
  * everything the pipeline layers on top is proven here.
  *
  * Storage is in-heap (Array[Byte] per record) — this is a test/dev
  * transport, not a durable log; the 100-TB path is the real Kafka
  * connector this stands in for. */
final class GraftQueueBroker(port0: Int = 0) {

  private final class Partition {
    val log = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
  }

  private val topics = new ConcurrentHashMap[String, Array[Partition]]()
  private var server: ServerSocket = _
  @volatile private var running = false
  private var acceptThread: Thread = _

  def port: Int = server.getLocalPort
  def address: String = s"localhost:$port"

  def createTopic(topic: String, partitions: Int): Unit =
    topics.computeIfAbsent(topic, _ => Array.fill(partitions)(new Partition))

  /** Driver-side convenience: publish round-robin across partitions. */
  def publish(topic: String, messages: Seq[String], partitions: Int = 4): Unit = {
    createTopic(topic, partitions)
    val parts = topics.get(topic)
    messages.zipWithIndex.foreach { case (m, i) =>
      val p = parts(i % parts.length)
      p.synchronized { p.log += m.getBytes(StandardCharsets.UTF_8) }
    }
  }

  def endOffsets(topic: String): Map[Int, Long] = {
    val parts = topics.get(topic)
    if (parts == null) Map.empty
    else parts.zipWithIndex.map { case (p, i) =>
      i -> p.synchronized(p.log.length.toLong)
    }.toMap
  }

  def start(): Unit = {
    server = new ServerSocket()
    server.bind(new InetSocketAddress("localhost", port0))
    running = true
    acceptThread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          // one short-lived handler thread per request connection —
          // fetches are chunked, so connections are brief
          new Thread(() => handle(sock), "graftqueue-handler").start()
        } catch { case _: Exception => /* closed */ }
      }
    }, "graftqueue-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
  }

  def stop(): Unit = {
    running = false
    if (server != null) server.close()
  }

  private def handle(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      in.readUTF() match {
        case "create" =>
          val topic = in.readUTF(); val n = in.readInt()
          createTopic(topic, n)
          out.writeInt(0)
        case "produce" =>
          val topic = in.readUTF(); val part = in.readInt()
          val n = in.readInt()
          val msgs = (0 until n).map { _ =>
            val len = in.readInt(); val b = new Array[Byte](len)
            in.readFully(b); b
          }
          // auto-create on produce (like a dev broker) with as many
          // partitions as the highest one addressed
          createTopic(topic, part + 1)
          val parts = topics.get(topic)
          if (part >= parts.length) { out.writeInt(-1) }
          else {
            val p = parts(part)
            val base = p.synchronized { val b = p.log.length; p.log ++= msgs; b }
            out.writeInt(0); out.writeLong(base.toLong)
          }
        case "fetch" =>
          val topic = in.readUTF(); val part = in.readInt()
          val from = in.readLong(); val maxN = in.readInt()
          val parts = topics.get(topic)
          if (parts == null || part >= parts.length) out.writeInt(-1)
          else {
            val p = parts(part)
            val slice = p.synchronized {
              p.log.slice(from.toInt, math.min(p.log.length, from.toInt + maxN)).toArray
            }
            out.writeInt(0)
            out.writeInt(slice.length)
            slice.foreach { b => out.writeInt(b.length); out.write(b) }
          }
        case "endOffsets" =>
          val topic = in.readUTF()
          val ends = endOffsets(topic)
          out.writeInt(0)
          out.writeInt(ends.size)
          ends.toSeq.sortBy(_._1).foreach { case (p, e) =>
            out.writeInt(p); out.writeLong(e)
          }
        case other =>
          out.writeInt(-1)
      }
      out.flush()
    } catch { case _: Exception => }
    finally sock.close()
  }
}

/** Thin per-call TCP client — usable from driver AND executor tasks
  * (serializable-free: constructed from host/port strings inside the
  * task). */
object GraftQueueClient {

  private def connect[A](brokers: String)(f: (DataInputStream, DataOutputStream) => A): A = {
    val Array(host, port) = brokers.split(":")
    val sock = new Socket(host, port.toInt)
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      f(in, out)
    } finally sock.close()
  }

  def createTopic(brokers: String, topic: String, partitions: Int): Unit =
    connect(brokers) { (in, out) =>
      out.writeUTF("create"); out.writeUTF(topic); out.writeInt(partitions)
      out.flush()
      require(in.readInt() == 0, s"create($topic) failed")
    }

  def produce(brokers: String, topic: String, partition: Int,
      messages: Seq[Array[Byte]]): Unit =
    connect(brokers) { (in, out) =>
      out.writeUTF("produce"); out.writeUTF(topic); out.writeInt(partition)
      out.writeInt(messages.length)
      messages.foreach { b => out.writeInt(b.length); out.write(b) }
      out.flush()
      require(in.readInt() == 0, s"produce($topic/$partition) failed")
      in.readLong()
      ()
    }

  def fetch(brokers: String, topic: String, partition: Int,
      from: Long, maxN: Int): Seq[Array[Byte]] =
    connect(brokers) { (in, out) =>
      out.writeUTF("fetch"); out.writeUTF(topic); out.writeInt(partition)
      out.writeLong(from); out.writeInt(maxN)
      out.flush()
      require(in.readInt() == 0, s"fetch($topic/$partition) failed")
      val n = in.readInt()
      (0 until n).map { _ =>
        val len = in.readInt(); val b = new Array[Byte](len)
        in.readFully(b); b
      }
    }

  def endOffsets(brokers: String, topic: String): Map[Int, Long] =
    connect(brokers) { (in, out) =>
      out.writeUTF("endOffsets"); out.writeUTF(topic)
      out.flush()
      require(in.readInt() == 0, s"endOffsets($topic) failed")
      val n = in.readInt()
      (0 until n).map(_ => in.readInt() -> in.readLong()).toMap
    }

  /** Consume an entire topic (driver-side test helper). */
  def readAll(brokers: String, topic: String): Seq[String] =
    endOffsets(brokers, topic).toSeq.sortBy(_._1).flatMap { case (p, end) =>
      var from = 0L
      val acc = scala.collection.mutable.ArrayBuffer[String]()
      while (from < end) {
        val chunk = fetch(brokers, topic, p, from, 4096)
        if (chunk.isEmpty) from = end
        else {
          acc ++= chunk.map(new String(_, StandardCharsets.UTF_8))
          from += chunk.length
        }
      }
      acc
    }
}
