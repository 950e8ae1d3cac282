package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Pack

/** Sequence packing: the distributed two-phase prefix sum must
  * reproduce the naive global-window formulation exactly, regardless
  * of input partitioning. */
class PackSpec extends SparkTestBase {
  import spark.implicits._

  test("packBins equals the global-window prefix-sum oracle across partitions") {
    // adversarial layout: ids arrive unsorted across many partitions
    val rows = (0L until 1000L).map(i => (i, 1L + (i * 37) % 200))
    val df = spark.createDataset(scala.util.Random.shuffle(rows))
      .repartition(13).toDF("id", "w")

    val got = Pack.packBins(df, "id", "w", capacity = 512L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val oracle = df
      .withColumn("prefix", coalesce(sum("w").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", (col("prefix") / 512L).cast("long"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("bin")))

    assert(got.toSeq == oracle.toSeq)
  }

  test("bins fill contiguously and never skip") {
    val df = (0L until 200L).map(i => (i, 100L)).toDF("id", "w")
    val out = Pack.packBins(df, "id", "w", capacity = 250L)
      .orderBy("id").collect().map(_.getLong(2))
    // bins are non-decreasing and dense (no gaps)
    assert(out.zip(out.tail).forall { case (a, b) => b == a || b == a + 1 })
    assert(out.distinct.toSeq == (out.min to out.max).toSeq)
    // 100-weight items into 250-capacity bins: floor semantics give
    // bins of 3,2,3,2,... items — every bin holds at least 2
    val sizes = out.groupBy(identity).view.mapValues(_.length).values
    assert(sizes.forall(n => n == 2 || n == 3))
  }

  test("single oversized item occupies its bin span without breaking successors") {
    val df = Seq((0L, 10L), (1L, 5000L), (2L, 10L)).toDF("id", "w")
    val out = Pack.packBins(df, "id", "w", capacity = 100L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out(0) == (0L, 0L))
    assert(out(1) == (1L, 0L))      // starts in bin 0 (prefix 10)
    assert(out(2) == (2L, 50L))     // prefix 5010 → bin 50
  }
}
