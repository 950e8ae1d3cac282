package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** Crafted-case semantics of the union+window as-of join. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLeft matches the latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // before any right row
      (2L, 100L, ts("2024-01-01 12:00:00")), // exactly at a right ts
      (3L, 100L, ts("2024-01-01 13:30:00")), // between right rows
      (4L, 200L, ts("2024-01-01 09:00:00")), // other key
      (5L, 300L, ts("2024-01-01 09:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 12:00:00"), 1.0),
      (100L, ts("2024-01-01 13:00:00"), 2.0),
      (100L, ts("2024-01-01 14:00:00"), 3.0),
      (200L, ts("2024-01-01 08:00:00"), 9.0)
    ).toDF("user_id", "p_ts", "p_value")

    val out = AsofJoin.asofLeft(left, right,
        keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "p_ts",
        payload = Seq("p_ts", "p_value"))
      .orderBy("event_id")
      .select("event_id", "p_value")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap

    assert(out(1L) == null)   // no purchase yet
    assert(out(2L) == 1.0)    // ts == right ts → matched (>= semantics)
    assert(out(3L) == 2.0)    // latest at-or-before 13:30
    assert(out(4L) == 9.0)
    assert(out(5L) == null)   // key absent on the right
  }

  test("asofLeft forward direction matches the earliest right row at-or-after") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // next reading at 12:00
      (2L, 100L, ts("2024-01-01 12:00:00")), // exactly at a right ts
      (3L, 100L, ts("2024-01-01 14:30:00")), // nothing after
      (4L, 300L, ts("2024-01-01 09:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 12:00:00"), 1.0),
      (100L, ts("2024-01-01 13:00:00"), 2.0),
      (100L, ts("2024-01-01 14:00:00"), 3.0)
    ).toDF("user_id", "p_ts", "p_value")
    val out = AsofJoin.asofLeft(left, right,
        keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "p_ts",
        payload = Seq("p_value"), direction = "forward")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    assert(out(1L) == 1.0)  // earliest at-or-after 10:00
    assert(out(2L) == 1.0)  // equality inclusive
    assert(out(3L) == null) // nothing follows 14:30
    assert(out(4L) == null)
  }

  test("asofLeft tolerance nulls matches older than the bound, keeps fresh ones") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 12:30:00")), // purchase 30 min ago → fresh
      (2L, 100L, ts("2024-01-01 15:30:00"))  // purchase 3.5h ago → stale
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts("2024-01-01 12:00:00"), 1.0))
      .toDF("user_id", "p_ts", "p_value")
    val out = AsofJoin.asofLeft(left, right,
        keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "p_ts",
        payload = Seq("p_value"), toleranceSeconds = Some(3600L))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == null)
  }

  test("asofLeft tolerance on NUMERIC epoch ts columns uses raw subtraction") {
    // epoch-millis longs: unix_timestamp would string-parse these to
    // null and silently null EVERY match — the tolerance bound must be
    // applied in the column's own units via plain subtraction
    val left = Seq(
      (1L, 100L, 12_600_000L), // match 600k units back → within 1M
      (2L, 100L, 15_000_000L)  // match 3M units back → stale
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 12_000_000L, 1.0))
      .toDF("user_id", "p_ts", "p_value")
    val out = AsofJoin.asofLeft(left, right,
        keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "p_ts",
        payload = Seq("p_value"), toleranceSeconds = Some(1_000_000L))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == null)
    // unsupported ts type for tolerance fails loudly, not with nulls
    val strLeft = Seq((1L, 100L, "2024-01-01")).toDF("event_id", "user_id", "ts")
    val strRight = Seq((100L, "2023-12-31", 1.0)).toDF("user_id", "p_ts", "p_value")
    intercept[IllegalArgumentException] {
      AsofJoin.asofLeft(strLeft, strRight, Seq("user_id"), "ts", "p_ts",
        Seq("p_value"), toleranceSeconds = Some(10L))
    }
  }

  test("asofLeftSalted is row-for-row identical to asofLeft on a hot key") {
    // one dominant key (the straggler shape) + a minor key + a no-match key
    val rnd = new scala.util.Random(7)
    val left = (1 to 500).map { i =>
      val key = if (i % 10 == 0) 2L else 1L // 90% of rows on key 1
      (i.toLong, key, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }.toDF("event_id", "user_id", "ts")
    val right = (0 until 24).flatMap { h =>
      Seq((1L, ts(f"2024-01-01 $h%02d:30:00"), h.toDouble),
        (2L, ts(f"2024-01-01 $h%02d:15:00"), h + 100.0))
    }.toDF("user_id", "p_ts", "p_value")

    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("event_id").selectExpr("event_id", "p_ts", "p_value")
        .collect().map(_.toString).toSeq

    val exact = run(AsofJoin.asofLeft(left, right,
      Seq("user_id"), "ts", "p_ts", Seq("p_ts", "p_value")))
    val salted = run(AsofJoin.asofLeftSalted(left, right,
      Seq("user_id"), "ts", "p_ts", Seq("p_ts", "p_value"), numSalts = 8))
    assert(salted == exact)
    // and the hot key genuinely fans out: its left rows land in many
    // distinct (key, salt) window partitions (AQE may re-coalesce the
    // tiny test shuffle, so assert the salt assignment itself)
    val salts = left.filter(col("user_id") === 1L)
      .select(pmod(hash(col("ts")), lit(8))).distinct().count()
    assert(salts > 4)
  }

  test("asofLeft preserves all left rows and columns") {
    val left = Seq((1L, 7L, ts("2024-01-01 00:00:00"), "x"))
      .toDF("id", "k", "ts", "tag")
    val right = Seq((7L, ts("2023-12-31 00:00:00"), 5.0))
      .toDF("k", "rts", "v")
    val out = AsofJoin.asofLeft(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "ts", "tag", "v"))
    assert(out.count() == 1)
    assert(out.head().getDouble(4) == 5.0)
  }
}
