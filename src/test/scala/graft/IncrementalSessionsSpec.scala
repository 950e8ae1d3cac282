package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalSessions

class IncrementalSessionsSpec extends SparkTestBase {
  import spark.implicits._

  // (key, epoch-second, cents, id) — gap 100s
  private def ev(rows: (String, Long, Long)*) =
    rows.zipWithIndex.map { case ((k, s, c), i) => (k, s, c, i.toLong) }
      .toDF("key", "s", "cents", "id")

  private def direct(df: org.apache.spark.sql.DataFrame) =
    IncrementalSessions.merge(
      IncrementalSessions.sessionsOf(df, "key", "s", "cents", 100L), 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  private def incr(df: org.apache.spark.sql.DataFrame,
      split: org.apache.spark.sql.Column) = {
    val existing = IncrementalSessions.sessionsOf(
      df.filter(!split), "key", "s", "cents", 100L)
    IncrementalSessions.incremental(existing, df.filter(split),
        "key", "s", "cents", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
  }

  test("a late event BRIDGES two persisted sessions into one") {
    val df = ev(("u", 0L, 1L), ("u", 180L, 1L), ("u", 90L, 1L))
    // without the 90s event: sessions [0,0] and [180,180] (gap 180 > 100)
    val got = incr(df, col("s") === 90L)
    assert(got == direct(df))
    assert(got.map(t => (t._3, t._4, t._5)) == Set((0L, 180L, 3L)))
  }

  test("extension, standalone, and cross-key independence") {
    val df = ev(
      ("u", 0L, 1L), ("u", 80L, 2L),       // old session [0,80]
      ("u", 170L, 4L),                     // new: extends to [0,170]
      ("u", 1000L, 8L),                    // new: standalone session
      ("v", 0L, 1L))                       // other key untouched
    val got = incr(df, col("s") === 170L || col("s") === 1000L)
    assert(got == direct(df))
    assert(got.contains(("u", 1L, 0L, 170L, 3L, 7L)))
    assert(got.contains(("u", 2L, 1000L, 1000L, 1L, 8L)))
    assert(got.contains(("v", 1L, 0L, 0L, 1L, 1L)))
  }

  test("any event split merges to the direct answer (associativity property)") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      (s"k${i % 5}", rnd.nextInt(5000).toLong, (i % 7).toLong)
    }
    val df = ev(rows: _*)
    val want = direct(df)
    assert(incr(df, col("id") % 3 === 0) == want)
    assert(incr(df, col("id") % 2 === 0) == want)
    // degenerate splits: everything old / everything new
    assert(incr(df, lit(false)) == want)
    assert(incr(df, lit(true)) == want)
  }
}
