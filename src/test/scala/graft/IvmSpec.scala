package graft

import org.apache.spark.sql.functions._
import graft.operators.Ivm

class IvmSpec extends SparkTestBase {
  import spark.implicits._

  private def l = (1 to 200).map(i => (i.toLong, i.toLong % 40)).toDF("id", "k")
  private def r = (0 to 39).map(k => (k.toLong, s"v$k")).toDF("k", "v")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "k", "v").collect().map(_.toSeq).toSet

  test("delta identity: base join + joinDelta == direct join of updated tables, any split") {
    val direct = rows(l.join(r, Seq("k")))
    for (seed <- Seq(1, 7)) {
      val lSplit = l.withColumn("d", pmod(hash(col("id") + seed), lit(3)) === 0)
      val rSplit = r.withColumn("d", pmod(hash(col("k") * 31 + seed), lit(4)) === 0)
      val (lb, ld) = (lSplit.filter(!col("d")).drop("d"),
        lSplit.filter(col("d")).drop("d"))
      val (rb, rd) = (rSplit.filter(!col("d")).drop("d"),
        rSplit.filter(col("d")).drop("d"))
      val got = rows(Ivm.applyDelta(lb.join(rb, Seq("k")),
        Ivm.joinDelta(lb, ld, rb, rd, Seq("k"))))
      assert(got == direct, s"seed=$seed")
    }
  }

  test("empty deltas produce an empty view delta") {
    val empty = l.limit(0)
    val emptyR = r.limit(0)
    assert(Ivm.joinDelta(l, empty, r, emptyR, Seq("k")).count() == 0)
  }

  test("aggregate retraction: deletes subtract, zeroed groups vanish, new groups appear") {
    val view = Seq(("a", 3L, 30L), ("b", 1L, 10L)).toDF("k", "n", "total")
    val feed = Seq(
      ("a", -1L, 10L),  // delete one a-row worth 10
      ("b", -1L, 10L),  // fully retract b
      ("c", 1L, 7L), ("c", 1L, 8L) // brand-new group
    ).toDF("k", "mult", "v")
    val got = Ivm.applyCountSumDelta(view,
        Ivm.countSumDelta(feed, Seq("k"), "mult", "v"), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2L, 20L), ("c", 2L, 15L)))
  }

  test("snapshot diff reports added/removed/changed only") {
    import graft.operators.SnapshotDiff
    val before = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val after = Seq((1L, "x"), (2L, "Y!"), (4L, "w")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(before, after, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("snapshot diff keys presence on id, not digest nullness (null content)") {
    import graft.operators.SnapshotDiff
    val before = Seq((1L, "x"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val after = Seq((1L, null.asInstanceOf[String]), (2L, "y"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(before, after, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // 1: x→null and 2: null→y are CHANGES (not added/removed);
    // 3: null→null is unchanged — absent from the report
    assert(got == Set((1L, "changed"), (2L, "changed")))
  }

  test("delta terms broadcast (bases are never shuffled)") {
    val ld = l.filter(col("id") < 5)
    val rd = r.filter(col("k") < 2)
    val p = Ivm.joinDelta(l, ld, r, rd, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"base side must not shuffle for a delta join:\n$p")
  }
}
