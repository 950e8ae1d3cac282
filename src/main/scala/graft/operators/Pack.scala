package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training-data preparation: assign documents
  * to fixed-capacity context bins by contiguous fill in a deterministic
  * global order (bin = exclusive-prefix-sum(weight) div capacity).
  * Downstream, one bin = one training sequence; contiguous fill keeps
  * the packing reproducible across runs and engines, which is what the
  * SQL oracle checks.
  *
  * Scale shape: the textbook formulation is `sum(w) OVER (ORDER BY id)`
  * — a GLOBAL ordered window, which Spark executes on a single
  * partition: the classic scale-killer at 100 TB. This implements the
  * distributed two-phase prefix sum instead:
  *
  *   1. range-partition by the order key (the only shuffle), pin the
  *      partitioning (localCheckpoint) so both passes see identical
  *      splits;
  *   2. pass 1: per-partition weight subtotals — P longs to the driver
  *      (P = #partitions, a tiny driver model like IVF centroids, NOT
  *      O(rows));
  *   3. exclusive-scan the subtotals, broadcast the P offsets;
  *   4. pass 2: each partition streams its rows once, running sum =
  *      broadcast offset + local prefix.
  *
  * Wall-clock = one shuffle + two partition-local scans; no partition
  * ever holds more than its range slice. The per-partition imperative
  * running sum is genuine per-row sequential state — the documented
  * RDD/mapPartitions carve-out. */
object Pack {

  /** @return (idCol: long, weightCol: long, bin: long) — one row per
    *         input row; `bin` is the 0-based fixed-capacity bin in
    *         ascending id order. */
  def packBins(df: DataFrame, idCol: String, weightCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = df.sparkSession
    val nPart = math.max(1, spark.sparkContext.defaultParallelism)
    val ordered = df
      .select(col(idCol).cast("long"), col(weightCol).cast("long"))
      .repartitionByRange(nPart, col(idCol))
      .sortWithinPartitions(idCol)
      .localCheckpoint(true)

    val partSums = ordered.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive per-partition offsets
    val bOff = spark.sparkContext.broadcast(offsets)

    val out = ordered.rdd.mapPartitionsWithIndex { (i, it) =>
      var running = bOff.value(i)
      it.map { r =>
        val w = r.getLong(1)
        val bin = running / capacity
        running += w
        Row(r.getLong(0), w, bin)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(weightCol, LongType, nullable = false),
      StructField("bin", LongType, nullable = false))))
  }
}
