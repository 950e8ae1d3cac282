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

  test("intervalOverlap matches cross-join reference, exactly once per pair") {
    // spans crossing 0..5 bucket boundaries at width 5, touching
    // endpoints (overlap at a single shared point), negatives, and
    // disjoint pairs
    val a = Seq((1L, 0.0, 10.0), (2L, 4.999, 5.0), (3L, -8.0, -1.0),
      (4L, 12.0, 30.0), (5L, 30.0, 30.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 10.0, 12.0), (11L, -20.0, 100.0), (12L, 5.0, 5.0),
      (13L, 31.0, 40.0), (14L, -3.0, 2.5))
      .toDF("bid", "blo", "bhi")
    val got = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 5.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = a.crossJoin(b)
      .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got.toSet == want, s"got=${got.toSet} want=$want")
    // the multi-shared-bucket pairs ((1,11) shares buckets -4..2, etc.)
    // must appear ONCE — the max(lo,lo')-bucket rule, not a distinct
    assert(got.length == got.toSet.size, s"duplicated pairs in ${got.toList}")
    assert(want.contains((2L, 12L)), "single-point endpoint overlap exercised")
  }

  test("intervalOverlap: inverted intervals on either side match nothing") {
    val a = Seq((1L, 10.0, 0.0)).toDF("aid", "alo", "ahi")
    val b = Seq((2L, 0.0, 100.0)).toDF("bid", "blo", "bhi")
    assert(RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 5.0)
      .count() == 0)
    assert(RangeJoin.intervalOverlap(b, a, "blo", "bhi", "alo", "ahi", 5.0)
      .count() == 0)
  }
}
