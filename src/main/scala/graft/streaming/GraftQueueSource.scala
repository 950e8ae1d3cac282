package graft.streaming

import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 streaming connector for [[GraftQueueBroker]] —
  * `spark.readStream.format("graftqueue")` / `writeStream` — built on
  * the same public connector API as spark-sql-kafka and exposing the
  * same shape:
  *
  *  - micro-batch source with per-partition offset ranges; offsets are
  *    checkpointed by the engine (at-least-once across restarts — the
  *    reference's commit-after-flush contract, `pipeline.py:281-291`,
  *    lands on the offset log instead of a consumer-group commit);
  *  - `maxMsgsPerTrigger` admission control = the reference's
  *    count-based `batch_size` (kafka's `maxOffsetsPerTrigger`);
  *  - metadata columns named `kafka_offset`/`kafka_partition`/
  *    `kafka_topic` ON PURPOSE: the pipeline's Message-model plumbing
  *    (StreamingPipeline.processBatch keeps `kafka_*` columns out of
  *    the inferred JSON batch) is exercised verbatim, so the tested
  *    path IS the kafka path minus the wire format;
  *  - streaming sink appending `value` bytes round-robin... no —
  *    partitioned by Spark task (each task produces to the partition
  *    matching its task index modulo the topic's width), at-least-once
  *    on retry like the Kafka producer sink.
  *
  * Every record crosses a real TCP socket in both directions — no
  * in-process shortcut — so reader/writer parallelism, offset
  * tracking, and restart recovery are all genuinely end-to-end
  * (GraftQueueSpec ports the reference integration assertions). */
final class GraftQueueProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftqueue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftQueueTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftQueueTable(properties.get("brokers"), properties.get("topic"))
}

object GraftQueueTable {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("kafka_offset", LongType),
    StructField("kafka_partition", IntegerType),
    StructField("kafka_topic", StringType)))
}

final class GraftQueueTable(brokers: String, topic: String)
    extends Table with SupportsRead with SupportsWrite {
  require(brokers != null && topic != null,
    "graftqueue requires options brokers and topic")
  override def name(): String = s"graftqueue:$topic"
  override def schema(): StructType = GraftQueueTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftQueueTable.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftQueueMicroBatchStream(brokers, topic,
            Option(options.get("maxMsgsPerTrigger")).map(_.toInt),
            Option(options.get("startingOffsets")).forall(_ == "earliest"))
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val valueIdx = info.schema().fieldIndex("value")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(
              pinfo: PhysicalWriteInfo): StreamingDataWriterFactory =
            new GraftQueueWriterFactory(brokers, topic, valueIdx)
          // broker appends are immediate; engine-level at-least-once
          override def commit(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

/** Per-partition offsets, JSON-serialized into the checkpoint offset
  * log (the connector analogue of Kafka's `{"topic":{"0":42}}`). */
final case class GraftQueueOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object GraftQueueOffset {
  def fromJson(s: String): GraftQueueOffset = GraftQueueOffset(
    "\"(\\d+)\":(\\d+)".r.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

final class GraftQueueMicroBatchStream(
    brokers: String, topic: String,
    maxMsgsPerTrigger: Option[Int], startEarliest: Boolean)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def getDefaultReadLimit: ReadLimit =
    maxMsgsPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = {
    val ends = GraftQueueClient.endOffsets(brokers, topic)
    if (startEarliest) GraftQueueOffset(ends.map { case (p, _) => p -> 0L })
    else GraftQueueOffset(ends)
  }

  override def latestOffset(): Offset =
    GraftQueueOffset(GraftQueueClient.endOffsets(brokers, topic))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftQueueOffset].parts
    val ends = GraftQueueClient.endOffsets(brokers, topic)
    limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        // distribute the row budget evenly over partitions (ceil), the
        // same admission shape as kafka's maxOffsetsPerTrigger
        val per = math.max(1L, (r.maxRows() + ends.size - 1) / math.max(1, ends.size))
        GraftQueueOffset(ends.map { case (p, end) =>
          p -> math.min(end, from.getOrElse(p, 0L) + per)
        })
      case _ => GraftQueueOffset(ends)
    }
  }

  override def deserializeOffset(json: String): Offset =
    GraftQueueOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftQueueOffset].parts
    val e = end.asInstanceOf[GraftQueueOffset].parts
    e.toSeq.sortBy(_._1).flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until > from)
        Some(GraftQueuePartition(brokers, topic, p, from, until): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new GraftQueuePartitionReader(partition.asInstanceOf[GraftQueuePartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GraftQueuePartition(
    brokers: String, topic: String, partition: Int,
    from: Long, until: Long) extends InputPartition

/** Executor-side reader: chunked fetches over TCP, one row per
  * message, with Kafka-shaped metadata columns. */
final class GraftQueuePartitionReader(p: GraftQueuePartition)
    extends PartitionReader[InternalRow] {
  private val chunk = 4096
  private var offset = p.from
  private var buf: Iterator[Array[Byte]] = Iterator.empty
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!buf.hasNext && offset < p.until) {
      val n = math.min(chunk.toLong, p.until - offset).toInt
      buf = GraftQueueClient.fetch(p.brokers, p.topic, p.partition, offset, n).iterator
    }
    if (buf.hasNext) {
      val bytes = buf.next()
      current = new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(bytes), offset, p.partition,
        UTF8String.fromString(p.topic)))
      offset += 1
      true
    } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

final class GraftQueueWriterFactory(brokers: String, topic: String, valueIdx: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val pending = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      private val ends = GraftQueueClient.endOffsets(brokers, topic)
      private val target =
        if (ends.isEmpty) 0 else partitionId % ends.size

      override def write(row: InternalRow): Unit = {
        pending += row.getUTF8String(valueIdx).toString
          .getBytes(StandardCharsets.UTF_8)
        if (pending.length >= 2048) flushPending()
      }
      private def flushPending(): Unit = if (pending.nonEmpty) {
        GraftQueueClient.produce(brokers, topic, target, pending.toSeq)
        pending.clear()
      }
      override def commit(): WriterCommitMessage = {
        flushPending()
        new WriterCommitMessage {}
      }
      override def abort(): Unit = pending.clear()
      override def close(): Unit = ()
    }
}
