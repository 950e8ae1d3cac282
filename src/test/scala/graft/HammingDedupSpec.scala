package graft

import org.apache.spark.sql.functions._

import graft.operators.HammingDedup

/** The streaming fingerprint-admission daemon: within/cross-batch
  * drops at a Hamming threshold, replay idempotence, compaction
  * identity — the DedupSpec/CosineDedupSpec contract in Hamming
  * space, where recall is EXACT by pigeonhole (16 chunks; any pair
  * within distance 15 shares a chunk). */
class HammingDedupSpec extends SparkTestBase {
  import spark.implicits._

  // base fingerprints far apart (random-ish constants); flips of ≤ 3
  // bits are dups at maxHamming = 3, a 28-bit flip never matches
  private val f1 = (0x123456789AL, 0x0FEDCBA987L)
  private val f2 = (0x7A5A5A5A5AL, 0x1234321234L)
  private val f3 = (0x0F0F0F0F0FL, 0x7777777777L)
  private def flip(f: (Long, Long), mask: Long) = (f._1 ^ mask, f._2)

  test("streamingHammingDupFilter admits novel fingerprints, drops within- and cross-batch near-flips") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_stream_hamdedup").toString
    val emitted = scala.collection.mutable.Map[Long, Set[Long]]()
    val mem = MemoryStream[(Long, Long, Long)]
    val q = HammingDedup.streamingHammingDupFilter(
        mem.toDF().toDF("media_id", "w0", "w1"), "media_id", "w0", "w1",
        stateDir, maxHamming = 3, compactEveryNTriggers = Some(1)) {
      (survivors, bid) =>
        emitted(bid) = survivors.collect().map(_.getLong(0)).toSet
    }
    try {
      // batch 0: two distinct fingerprints; 3 is a 2-bit flip of 1
      // (WITHIN-batch) → min-id canonical 1 survives
      mem.addData((1L, f1._1, f1._2), (2L, f2._1, f2._2),
        (3L, f1._1 ^ 5L, f1._2))
      q.processAllAvailable()
      assert(emitted(0L) == Set(1L, 2L), emitted.toString)
      // batch 1: 4 is a 1-bit flip of admitted 2 (CROSS-batch, via the
      // persisted band index); 5 is fresh
      mem.addData((4L, f2._1 ^ 1L, f2._2), (5L, f3._1, f3._2))
      q.processAllAvailable()
      assert(emitted(1L) == Set(5L), emitted.toString)
      // batch 2 probes FOLDED state (compact_every_n_triggers = 1):
      // 6 is a 3-bit flip of a 2-batch-old admit (dropped, exactly at
      // maxHamming); 7 is a 28-bit flip (cosine of the never-match
      // cohort — admitted)
      mem.addData((6L, f1._1 ^ 7L, f1._2), (7L, f1._1 ^ 0xFFFFFFFL, f1._2))
      q.processAllAvailable()
      assert(emitted(2L) == Set(7L), emitted.toString)
    } finally q.stop()
    // retry idempotence across the fold: re-running batch 2 reproduces
    // its own survivor set (fold floor is 1 < 2)
    val replay = HammingDedup.hammingDupFilterBatch(
        Seq((6L, f1._1 ^ 7L, f1._2), (7L, f1._1 ^ 0xFFFFFFFL, f1._2))
          .toDF("media_id", "w0", "w1"),
        "media_id", "w0", "w1", stateDir, batchId = 2L, maxHamming = 3)
      .collect().map(_.getLong(0)).toSet
    assert(replay == Set(7L), replay.toString)
    // replaying a batch at-or-below the fold floor fails loudly
    val atFloor = intercept[IllegalArgumentException] {
      HammingDedup.hammingDupFilterBatch(
        Seq((9L, f3._1, f3._2)).toDF("media_id", "w0", "w1"),
        "media_id", "w0", "w1", stateDir, batchId = 1L, maxHamming = 3)
    }
    assert(atFloor.getMessage.contains("compacted through"), atFloor.getMessage)
  }

  test("non-long id column: probe still hits the compacted payload's buckets (round-9 advisor regression)") {
    // Spark's xxhash64 is type-sensitive, so before the long-cast fix a
    // payload committed under an INT id folded into buckets the probe
    // (which prunes by the LongType hist_id of the index join) never
    // read — the near-dup below was silently ADMITTED after the fold.
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_hamdedup_intid").toString
    val b0 = Seq((1, f1._1, f1._2), (2, f2._1, f2._2), (3, f3._1, f3._2))
      .toDF("media_id", "w0", "w1") // media_id is IntegerType
    val s0 = HammingDedup.hammingDupFilterBatch(b0, "media_id", "w0", "w1",
      stateDir, batchId = 0L, maxHamming = 3)
    assert(s0.count() == 3)
    HammingDedup.hammingDupCommitBatch(s0, "media_id", "w0", "w1",
      stateDir, batchId = 0L)
    HammingDedup.compactHammingDupState(spark, stateDir,
      upToBid = 0L, minReplayableBid = 1L)
    val b1 = Seq((4, f1._1 ^ 1L, f1._2), (5, f2._1 ^ 0xFFFFFFFL, f2._2))
      .toDF("media_id", "w0", "w1")
    val s1 = HammingDedup.hammingDupFilterBatch(b1, "media_id", "w0", "w1",
        stateDir, batchId = 1L, maxHamming = 3)
      .collect().map(_.getInt(0)).toSet
    assert(s1 == Set(5), s"near-dup of an admitted fingerprint must be " +
      s"dropped after the fold even with a non-long id column; got $s1")
  }

  test("fingerprint stamp: a state built under one recipe refuses probes under another (round-10 advisor)") {
    // words derived under a different simhash dim share NO bits with
    // the admitted ones — before the stamp, changing `dim` on an
    // existing state_dir silently admitted every duplicate
    val stamp8 = Some("simhash:dim=8:seed=42:bands=4x32")
    val stamp16 = Some("simhash:dim=16:seed=42:bands=4x32")
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_hamdedup_fpstamp").toString
    val b0 = Seq((1L, f1._1, f1._2), (2L, f2._1, f2._2))
      .toDF("media_id", "w0", "w1")
    HammingDedup.hammingDupCommitBatch(b0, "media_id", "w0", "w1",
      stateDir, batchId = 0L, maxHamming = 3, fpStamp = stamp8)
    // the stamp must survive the compact fold (it lives in the band
    // index's column metadata, like the chunk count)
    HammingDedup.compactHammingDupState(spark, stateDir,
      upToBid = 0L, minReplayableBid = 1L)
    val b1 = Seq((3L, f1._1 ^ 1L, f1._2), (4L, f3._1, f3._2))
      .toDF("media_id", "w0", "w1")
    def probe(stamp: Option[String]) =
      HammingDedup.hammingDupFilterBatch(b1, "media_id", "w0", "w1",
        stateDir, batchId = 1L, maxHamming = 3, fpStamp = stamp)
        .collect().map(_.getLong(0)).toSet
    // same recipe: normal admission (3 is a 1-bit flip of admitted 1)
    assert(probe(stamp8) == Set(4L))
    // different dim: loud failure, not silent zero recall
    val dimErr = intercept[IllegalArgumentException] { probe(stamp16) }
    assert(dimErr.getMessage.contains("fingerprint"), dimErr.getMessage)
    // raw precomputed words against a fingerprint-built state: loud too
    val rawErr = intercept[IllegalArgumentException] { probe(None) }
    assert(rawErr.getMessage.contains("<none>"), rawErr.getMessage)
    // legacy direction: an UNSTAMPED state stays probeable under any
    // recipe (check-only-when-present, the hyperplane discipline)
    val legacyDir = java.nio.file.Files
      .createTempDirectory("graft_hamdedup_legacy").toString
    HammingDedup.hammingDupCommitBatch(b0, "media_id", "w0", "w1",
      legacyDir, batchId = 0L, maxHamming = 3)
    val s = HammingDedup.hammingDupFilterBatch(b1, "media_id", "w0", "w1",
        legacyDir, batchId = 1L, maxHamming = 3, fpStamp = stamp8)
      .collect().map(_.getLong(0)).toSet
    assert(s == Set(4L))
  }

  test("hammingDupPairs: exact recall at the pigeonhole bound, maxHamming guardrail") {
    val docs = Seq(
      (1L, f1._1, f1._2),
      (2L, f1._1 ^ 0x8421L, f1._2 ^ 0x100L), // 5 bits across both words
      (3L, f2._1, f2._2))
      .toDF("media_id", "w0", "w1")
    val pairs = HammingDedup.hammingDupPairs(docs, "media_id", "w0", "w1",
      maxHamming = 5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
      Set((1L, 2L, 5)))
    assert(HammingDedup.hammingDupPairs(docs, "media_id", "w0", "w1",
      maxHamming = 4).count() == 0)
    val err = intercept[IllegalArgumentException] {
      HammingDedup.hammingDupPairs(docs, "media_id", "w0", "w1",
        maxHamming = 16)
    }
    assert(err.getMessage.contains("pigeonhole"), err.getMessage)
  }
}
