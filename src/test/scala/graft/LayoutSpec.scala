package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("mortonInterleave matches hand-computed Morton codes") {
    // morton(a=3,b=5): a=011 → positions 0,2 = 5; b=101 → positions
    // 1,5 = 34; z = 39. Plus the canonical 2-bit grid walk.
    val out = Seq((3L, 5L), (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
        (2L, 3L), (3L, 3L))
      .toDF("a", "b")
      .select(Layout.mortonInterleave(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(39L, 0L, 1L, 2L, 3L, 14L, 15L))
  }

  test("quantize is an exact integer floor over the span") {
    val df = Seq(0L, 1L, 49L, 50L, 99L, 100L).toDF("v")
      .withColumn("q", Layout.quantize(col("v"), lit(0L), lit(100L), 2))
    // levels=3, span=100: q = floor(v*3/100) → 0,0,1,1,2,3
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L, 1L, 2L, 3L))
  }

  test("z-order range partitions bound BOTH dimensions per partition") {
    // 32×32 grid, z-ordered and range-partitioned into 16 parts: each
    // partition's (a, b) envelope must stay a small fraction of the
    // full span — the file-stats-pruning property. A single-column
    // sort would give one tight and one full-span dimension.
    val grid = (for { a <- 0 until 32; b <- 0 until 32 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val z = Layout.zorder(grid, "a", "b", bits = 5)
    val parts = z.repartitionByRange(16, col("zvalue"))
      .select(col("a"), col("b"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg((max("a") - min("a")).as("spanA"), (max("b") - min("b")).as("spanB"))
      .collect()
    assert(parts.length == 16)
    // partitions straddling a top-level quadrant boundary (z = 256,
    // 512, 768) legitimately jump across the grid — the locality
    // claim is about the BULK: most partitions stay within a 16×16
    // envelope, and the mean envelope is far below the 31 a
    // single-column sort leaves on its unsorted dimension.
    val tight = parts.count(r => r.getLong(1) <= 15 && r.getLong(2) <= 15)
    assert(tight >= 12, s"only $tight/16 partitions have a ≤16×16 envelope")
    val meanA = parts.map(_.getLong(1)).sum.toDouble / parts.length
    val meanB = parts.map(_.getLong(2)).sum.toDouble / parts.length
    assert(meanA < 16 && meanB < 16,
      s"mean envelope ($meanA, $meanB) not tight; sort-by-one-dim gives 31")
  }
}
