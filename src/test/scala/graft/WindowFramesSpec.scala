package graft

import org.apache.spark.sql.Row
import graft.operators.WindowFrames

/** GROUPS-frame and EXCLUDE-clause emulations vs hand-computed ANSI
  * semantics on a fixture with ties (the whole point of GROUPS/peer
  * semantics) and single-row partitions (empty excluded frames). */
class WindowFramesSpec extends SparkTestBase {
  import spark.implicits._

  // part a: ord 1 → {10, 20}; ord 2 → {5}; ord 4 → {1, 2}
  // part b: single row (ord 1, 100)
  private lazy val df = Seq(
    ("a", 1L, 10L), ("a", 1L, 20L), ("a", 2L, 5L),
    ("a", 4L, 1L), ("a", 4L, 2L), ("b", 1L, 100L)
  ).toDF("part", "ord", "v")

  test("groupsSum: GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW with ties") {
    val out = WindowFrames.groupsSum(df, Seq("part"), "ord", "v", 1, "gs")
      .select("part", "ord", "v", "gs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // group sums: a/1=30, a/2=5, a/4=3 → frames: 30, 30+5=35, 5+3=8
    assert(out(("a", 1L, 10L)) == 30L)
    assert(out(("a", 1L, 20L)) == 30L) // every peer gets the GROUP frame
    assert(out(("a", 2L, 5L)) == 35L)
    assert(out(("a", 4L, 1L)) == 8L)
    assert(out(("a", 4L, 2L)) == 8L)
    assert(out(("b", 1L, 100L)) == 100L)
  }

  test("sumExcludeCurrentRow: partition total minus self, NULL when alone") {
    val out = WindowFrames.sumExcludeCurrentRow(df, Seq("part"), "v", "x")
      .select("part", "ord", "v", "x").collect()
      .map { r: Row =>
        (r.getString(0), r.getLong(1), r.getLong(2)) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toMap
    assert(out(("a", 1L, 10L)) == Some(28L)) // 38 total - 10
    assert(out(("a", 4L, 2L)) == Some(36L))
    assert(out(("b", 1L, 100L)) == None) // single-row partition
  }

  test("runningSumExcludeGroup: strictly-earlier groups, NULL for first group") {
    val out = WindowFrames.runningSumExcludeGroup(
        df, Seq("part"), "ord", "v", "x")
      .select("part", "ord", "v", "x").collect()
      .map { r: Row =>
        (r.getString(0), r.getLong(1), r.getLong(2)) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toMap
    assert(out(("a", 1L, 10L)) == None) // no earlier group; peers excluded
    assert(out(("a", 1L, 20L)) == None)
    assert(out(("a", 2L, 5L)) == Some(30L))
    assert(out(("a", 4L, 1L)) == Some(35L))
    assert(out(("b", 1L, 100L)) == None)
  }

  test("runningSumExcludeGroup: emptiness guard is sign-agnostic") {
    // earlier groups sum to 0 — a value-based guard would wrongly NULL it
    val d2 = Seq(("a", 1L, -5L), ("a", 1L, 5L), ("a", 2L, 7L))
      .toDF("part", "ord", "v")
    val out = WindowFrames.runningSumExcludeGroup(
        d2, Seq("part"), "ord", "v", "x")
      .filter($"ord" === 2L).select("x").collect()
    assert(out.length == 1 && !out(0).isNullAt(0) && out(0).getLong(0) == 0L)
  }
}
