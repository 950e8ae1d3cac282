package graft

import graft.operators.{Cdc, Profile}
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  private def apply0(changes: org.apache.spark.sql.DataFrame) =
    Cdc.applyChanges(snap, changes, "k", "op", Seq("seq"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("latest change wins; deletes drop; untouched keys pass through") {
    val ch = Seq(
      (1L, "U", 1L, "a1", 11.0),
      (1L, "U", 2L, "a2", 12.0),   // later seq wins
      (2L, "D", 1L, "x", 0.0),     // delete
      (4L, "I", 1L, "d", 40.0)     // insert of a new key
    ).toDF("k", "op", "seq", "name", "v")
    assert(apply0(ch) == Seq((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("replay is order-independent and idempotent (at-least-once feeds)") {
    val ch = Seq(
      (1L, "D", 3L, "x", 0.0),
      (1L, "U", 1L, "a1", 11.0),
      (1L, "I", 2L, "a2", 12.0)
    ).toDF("k", "op", "seq", "name", "v")
    val once = apply0(ch)
    assert(once == Seq((2L, "b", 20.0), (3L, "c", 30.0))) // final op is D
    // duplicated feed (at-least-once delivery) converges to the same state
    assert(apply0(ch.unionByName(ch)) == once)
    // shuffled arrival order too
    assert(apply0(ch.orderBy(rand(42))) == once)
  }

  test("delete of a key the snapshot never had is a no-op; D then later I resurrects") {
    val ch = Seq(
      (99L, "D", 1L, "x", 0.0),
      (2L, "D", 1L, "x", 0.0),
      (2L, "I", 2L, "b2", 21.0)
    ).toDF("k", "op", "seq", "name", "v")
    assert(apply0(ch) ==
      Seq((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0)))
  }

  test("malformed or null ops raise instead of silently acting as deletes") {
    val badOp = Seq((1L, "X", 1L, "a1", 11.0)).toDF("k", "op", "seq", "name", "v")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e1 = intercept[Exception] { apply0(badOp) }
    assert(messages(e1).exists(_.contains("must be I/U/D")), e1.toString)
    val nullOp = Seq((1L, null.asInstanceOf[String], 1L, "a1", 11.0))
      .toDF("k", "op", "seq", "name", "v")
    val e2 = intercept[Exception] { apply0(nullOp) }
    assert(messages(e2).exists(_.contains("must be I/U/D")), e2.toString)
    // lower-case ops are accepted (normalized before validation)
    val lower = Seq((2L, "d", 1L, "x", 0.0)).toDF("k", "op", "seq", "name", "v")
    assert(apply0(lower) == Seq((1L, "a", 10.0), (3L, "c", 30.0)))
    // a malformed op on a NON-LATEST row (rn > 1 — it would never
    // survive the window) must still raise: validation is a scan-side
    // filter, not a projection Catalyst can defer past the rn=1 cut
    val badNonLatest = Seq(
      (1L, "X", 1L, "old", 1.0),
      (1L, "U", 2L, "new", 2.0)).toDF("k", "op", "seq", "name", "v")
    val e3 = intercept[Exception] { apply0(badNonLatest) }
    assert(messages(e3).exists(_.contains("must be I/U/D")), e3.toString)
  }

  test("mergeMoments over shards equals a direct pass, any sharding") {
    val docs = (1 to 500).map(i => (i.toLong, s"g${i % 3}", i * 7 % 101))
      .toDF("id", "grp", "len")
    def stats(shard: org.apache.spark.sql.Column) =
      Profile.mergeMoments(Profile.momentShards(docs, "grp", shard, col("len")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    val direct = stats(lit(0))
    assert(stats(pmod(col("id"), lit(7))) == direct)
    assert(stats(pmod(col("id"), lit(64))) == direct)
    // partials survive persistence (the q72 contract, lossless here)
    val dir = java.nio.file.Files.createTempDirectory("graft_moments").toString
    Profile.momentShards(docs, "grp", pmod(col("id"), lit(7)), col("len"))
      .write.mode("overwrite").parquet(dir)
    val fromDisk = Profile.mergeMoments(spark.read.parquet(dir))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    assert(fromDisk == direct)
  }
}
