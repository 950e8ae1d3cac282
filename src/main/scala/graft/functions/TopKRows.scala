package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap entry: the struct row serialized to UnsafeRow bytes,
  * with its ordering keys denormalized for comparison. The total
  * order is (ords lexicographic, bytes): rows compare on every
  * leading LONG field in sequence, and only fully-tied rows fall back
  * to their serialized bytes, so heap contents — and therefore the
  * aggregate's result — are independent of arrival and merge order. */
private[functions] final case class TopKEntry(
    ords: Array[Long], bytes: Array[Byte], numFields: Int) {
  def row: UnsafeRow = {
    val r = new UnsafeRow(numFields)
    r.pointTo(bytes, bytes.length)
    r
  }
}

private[functions] object TopKEntry {
  /** Ascending (ords…, bytes) — a min-heap under this order keeps the
    * k LARGEST entries by popping the smallest. */
  val ordering: Ordering[TopKEntry] = new Ordering[TopKEntry] {
    override def compare(a: TopKEntry, b: TopKEntry): Int = {
      var i = 0
      val n = math.min(a.ords.length, b.ords.length)
      while (i < n) {
        val c = java.lang.Long.compare(a.ords(i), b.ords(i))
        if (c != 0) return c
        i += 1
      }
      java.util.Arrays.compareUnsigned(a.bytes, b.bytes)
    }
  }
}

/** Bounded min-heap buffer: at most k entries, the k largest seen. */
private[functions] final class TopKBuffer(val k: Int) {
  val heap = new java.util.PriorityQueue[TopKEntry](
    math.max(1, k), TopKEntry.ordering.asInstanceOf[
      java.util.Comparator[TopKEntry]])

  def add(e: TopKEntry): Unit = {
    if (heap.size < k) heap.add(e)
    else if (TopKEntry.ordering.compare(e, heap.peek) > 0) {
      heap.poll(); heap.add(e)
    }
  }
}

/** Per-group top-k as a native `TypedImperativeAggregate` — the
  * bounded-memory, map-side-combining replacement for the
  * `row_number() OVER (PARTITION BY key ORDER BY …) <= k` pattern.
  *
  * Why this exists (the 100-TB argument): the window formulation
  * SHUFFLES EVERY ROW to its key's partition and sorts it there —
  * shuffle volume is the whole input. This aggregate keeps a k-entry
  * heap per key and participates in partial aggregation, so each map
  * task ships AT MOST k rows per key it saw: shuffle volume drops
  * from O(rows) to O(keys × k × mappers), and no sort ever happens —
  * heap maintenance is O(log k) per row. Same trick as Spark's global
  * `TakeOrderedAndProject`, generalized per key. The build brief's
  * custom-operator ladder: this is tier (b), a custom Catalyst
  * aggregate, chosen over a whole `SparkStrategy` because the
  * aggregation FRAMEWORK (ObjectHashAggregate, partial/final modes,
  * spilling) already does the orchestration — only the state machine
  * is custom.
  *
  * Input: a STRUCT whose LEADING LONG fields are the ordering keys,
  * compared lexicographically (all ascending; encode a descending
  * component by negating it). Callers express composite total orders
  * as separate fields — `struct(cents, -id, …payload)` — rather than
  * packing them into one Long with multiply-subtract arithmetic: the
  * packed form silently corrupts the order once the low component
  * outgrows its allotted spacing or the product overflows Long
  * (exactly the weighted-reservoir bug this replaced). Remaining
  * fields are the carried payload. Result: `array<struct>` of the k
  * largest, descending — every rank deterministic because the
  * (ords…, serialized-bytes) order is total.
  *
  * Null ordering keys sort FIRST (treated as Long.MinValue — they
  * lose to every real key under the keep-largest semantics; a genuine
  * Long.MinValue key ties with null and falls to the bytes
  * tie-break, still deterministic).
  *
  * Determinism: full ties across all ordering fields break on the
  * serialized row bytes, so results are independent of row arrival
  * order, partitioning, and partial/final merge interleaving (the
  * fixture-shuffle probe's invariance contract). */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, "top_k_rows: k must be positive")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  /** Number of leading LONG fields = the ordering-key prefix. */
  private lazy val numOrds =
    structType.fields.takeWhile(_.dataType == LongType).length
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.nonEmpty && s.head.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "top_k_rows expects struct<ord1: bigint[, ord2: bigint, …], " +
            "payload…> — EVERY leading bigint field is an ordering key " +
            s"(compared lexicographically, descending); got $other. " +
            "A bigint payload field placed directly after the ordering " +
            "keys becomes a tie-break key: cast it (e.g. to string or " +
            "struct) or reorder fields to exclude it from the order.")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  private def ordsOf(row: InternalRow): Array[Long] = {
    val a = new Array[Long](numOrds)
    var i = 0
    while (i < numOrds) {
      a(i) = if (row.isNullAt(i)) Long.MinValue else row.getLong(i)
      i += 1
    }
    a
  }

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val ord0 = if (row.isNullAt(0)) Long.MinValue else row.getLong(0)
      // fast reject on the primary ord alone: once the heap is full,
      // most rows lose to the current minimum without ever being
      // serialized — the UnsafeProjection + copy runs only for
      // potential admits (ties on ord0 still project; add() breaks
      // them on the remaining ords, then bytes). Measured: 40M rows /
      // 8 keys went 9.2s → comparable to the window path once
      // rejects stopped paying the projection.
      if (b.heap.size < k || ord0 >= b.heap.peek.ords(0)) {
        // the projection reuses ONE buffer across rows — copy()
        // allocates a fresh exact-size backing array
        val bytes = toUnsafe(row).copy().getBytes
        b.add(TopKEntry(ordsOf(row), bytes, structType.length))
      }
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val entries = new Array[TopKEntry](b.heap.size)
    b.heap.toArray(entries)
    // descending: rank 1 = largest
    java.util.Arrays.sort(entries,
      TopKEntry.ordering.reverse.asInstanceOf[java.util.Comparator[TopKEntry]])
    new GenericArrayData(entries.map(_.row: Any))
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.heap.size)
    val it = b.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.ords.length)
      var i = 0
      while (i < e.ords.length) { out.writeLong(e.ords(i)); i += 1 }
      out.writeInt(e.bytes.length)
      out.write(e.bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(k)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val m = in.getInt
      val ords = new Array[Long](m)
      var j = 0
      while (j < m) { ords(j) = in.getLong; j += 1 }
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      b.add(TopKEntry(ords, arr, structType.length))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, false)
  override def prettyName: String = "top_k_rows"
}
