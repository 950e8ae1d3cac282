package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketed range join ≡ the naive nested-loop answer, including
  * bucket-boundary and multi-bucket-interval cases. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("pointInInterval matches the cross-join reference on boundary-heavy data") {
    val pts = Seq(0.0, 4.999, 5.0, 5.001, 9.99, 10.0, 17.5, 25.0, -3.2)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    // widths from 0 (degenerate) to 22 (spans 5 buckets at width 5)
    val ivs = Seq((100L, 5.0, 5.0), (101L, 0.0, 10.0), (102L, 4.0, 26.0),
      (103L, -5.0, -1.0), (104L, 9.0, 9.5), (105L, 24.9, 40.0))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 5.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got=$got want=$want")
    assert(want.nonEmpty && want.exists(_._2 == 102L), "multi-bucket interval exercised")
  }

  test("inverted intervals (lo > hi) match nothing") {
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val ivs = Seq((1L, 10.0, 0.0)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 5.0).count() == 0)
  }
}
