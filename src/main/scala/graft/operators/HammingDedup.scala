package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** STREAMING Hamming-space admission — the third instantiation of the
  * shared [[IndexState]] admission discipline, for PERCEPTUAL
  * FINGERPRINT streams: images/audio/video arrive as two 64-bit hash
  * words (`Multimodal.imageAHash64`/`imagePHash64`/audio and keyframe
  * signatures all emit this layout), and a re-upload or re-encode of
  * admitted media differs in ≤ k bits. Text gets Jaccard
  * (`Dedup.streamingNearDupFilter`), embeddings get cosine
  * (`CosineDedup`), fingerprints get Hamming — together the full
  * multimodal ingest front door.
  *
  * Banding is ADAPTIVE multi-index chunking (Norvig-style pigeonhole;
  * cf. the multi-index hashing literature): the 128 bits split into
  * the smallest word-aligned power-of-two chunk count m ≥
  * `maxHamming + 1` — a pair within distance ≤ maxHamming differs in
  * at most maxHamming chunks < m, so it MATCHES in at least one:
  * recall is EXACTLY 1.0 (not probabilistic, unlike MinHash/
  * hyperplane banding), and the `bit_count` verify makes precision
  * exactly 1.0. Chunk count is a CANDIDATE-VOLUME dial, which is why
  * it adapts instead of being fixed: random fingerprints collide on a
  * w-bit chunk with probability 2^-w, so the original fixed 16×8-bit
  * layout cost ~m·N/256 candidates per probe doc (measured round 10:
  * probe bytes GREW 4.75 → 31 MB across a 10× corpus) while the
  * default `maxHamming = 3` needs only 4×32-bit chunks — collision
  * probability 2^-32, candidates ≈ true near-dups only, probe IO
  * batch-proportional. The chunk count is stamped into the persisted
  * index (column metadata, like the MinHash sketch params) and a
  * probe under a different `maxHamming` bucket fails loudly instead
  * of silently losing recall. The whole operator is integer
  * arithmetic end-to-end, so its oracle replays bit-for-bit in any
  * SQL engine (the oracle verifies with exact bit_count — admission
  * results are chunk-layout-independent).
  *
  * State/replay/crash semantics are [[IndexState]]'s: bid-versioned
  * probe-then-commit, bucketed compact folds with replay-safe floors,
  * probe IO pruned to the batch's own chunk buckets. */
object HammingDedup {

  private val maxChunks = 16 // 8-bit chunks; bounds maxHamming at 15

  /** Smallest word-aligned (power-of-two, ≥ 2) chunk count whose
    * pigeonhole covers `maxHamming`. */
  private[graft] def chunksFor(maxHamming: Int): Int = {
    require(maxHamming >= 0 && maxHamming <= maxChunks - 1,
      s"maxHamming > ${maxChunks - 1} breaks the pigeonhole recall " +
        s"guarantee of $maxChunks-chunk banding")
    var m = 2
    while (m < maxHamming + 1) m *= 2
    m
  }

  /** The m (band, value) rows of one fingerprint; bands 0..m/2-1
    * chunk w0, the rest w1. Chunk values are 128/m-bit ints. */
  private def bandValues(w0: Column, w1: Column, chunks: Int): Column = {
    val perWord = chunks / 2
    val width = 64 / perWord
    array((0 until chunks).map { i =>
      val word = if (i < perWord) w0 else w1
      val shifted = shiftright(word, width * (i % perWord))
      if (width == 64) shifted
      else shifted.bitwiseAND(lit((1L << width) - 1))
    }: _*)
  }

  private def chunkMeta(chunks: Int, fpStamp: Option[String]) = {
    val b = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.hamming.chunks", chunks.toLong)
    fpStamp.foreach(b.putString("graft.hamming.fingerprint", _))
    b.build()
  }

  /** Loud mismatch check: an index banded under a different chunk
    * count would never collide with this probe's band values —
    * silent zero recall (the MinHash param-stamp discipline). The
    * FINGERPRINT stamp extends the same discipline to in-daemon
    * word derivation: hash words derived under a different
    * fingerprint recipe (kind, or simhash dim/seed/band layout)
    * share no bits with the admitted ones, so a changed `dim` on an
    * existing state_dir would otherwise admit every duplicate
    * silently (round-10 advisor finding). Checked only when the
    * index carries the stamp (states persisted before the stamp
    * existed, or raw precomputed-word states, stay probeable). */
  private def checkChunkMeta(index: DataFrame, chunks: Int,
      fpStamp: Option[String]): Unit =
    index.schema.fields.find(_.name == "v").map(_.metadata)
      .filter(_.contains("graft.hamming.chunks")).foreach { m =>
        val built = m.getLong("graft.hamming.chunks")
        require(built == chunks.toLong,
          s"hamming band index built with $built chunks but probed " +
            s"with $chunks (different maxHamming bucket) — band values " +
            "would never collide; rebuild or probe with a maxHamming " +
            "in the same chunk bucket")
        if (m.contains("graft.hamming.fingerprint")) {
          val builtFp = m.getString("graft.hamming.fingerprint")
          require(fpStamp.contains(builtFp),
            s"hamming state built from fingerprint '$builtFp' but probed " +
              s"with '${fpStamp.getOrElse("<none>")}' — words derived " +
              "under different fingerprint params share no bits (silent " +
              "zero recall); keep kind/dim constant for the lifetime of " +
              "a state_dir or start a fresh one")
        }
      }

  // ONE band bucket law for fold + probe (cannot drift)
  private def bandBucket(b: Int): Column =
    pmod(xxhash64(col("band"), col("v")), lit(b))

  private def hammingExpr(a0: Column, a1: Column, b0: Column, b1: Column): Column =
    bit_count(a0.bitwiseXOR(b0)) + bit_count(a1.bitwiseXOR(b1))

  /** Within-corpus near-dup pairs at Hamming distance ≤ `maxHamming`:
    * banded candidates (never all-pairs) + exact bit_count verify.
    * Output (doc_a, doc_b, hamming), doc_a < doc_b. Exact recall for
    * maxHamming ≤ 15 (pigeonhole over `chunksFor(maxHamming)` chunks). */
  def hammingDupPairs(
      docs: DataFrame, idCol: String, w0Col: String, w1Col: String,
      maxHamming: Int): DataFrame = {
    val chunks = chunksFor(maxHamming)
    val d = graft.queries.Tables.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        col(w0Col).cast("long").as("w0"), col(w1Col).cast("long").as("w1"))
    val buckets = d.select(col("doc_id"), col("w0"), col("w1"),
      posexplode(bandValues(col("w0"), col("w1"), chunks)).as(Seq("band", "v")))
      .select("doc_id", "band", "v")
    // hint("merge"): self-join exchange reuse (see
    // Dedup.jaccardPairsWithCounts for the full rationale)
    val cand = buckets.as("x").hint("merge")
      .join(buckets.as("y"), Seq("band", "v"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sides = d
    cand
      .join(sides.select(col("doc_id").as("doc_a"), col("w0").as("a0"),
        col("w1").as("a1")), "doc_a")
      .join(sides.select(col("doc_id").as("doc_b"), col("w0").as("b0"),
        col("w1").as("b1")), "doc_b")
      .withColumn("hamming",
        hammingExpr(col("a0"), col("a1"), col("b0"), col("b1")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Persistable band index over admitted fingerprints — (hist_id,
    * band, v) rows, the Hamming analog of `Dedup.minhashBandBuckets`.
    * Chunk count derives from `maxHamming` and is stamped as column
    * metadata so a mismatched probe fails loudly. */
  def hammingBandBuckets(
      docs: DataFrame, idCol: String, w0Col: String, w1Col: String,
      maxHamming: Int = 3, fpStamp: Option[String] = None): DataFrame = {
    val chunks = chunksFor(maxHamming)
    graft.queries.Tables.spread(docs)
      .select(col(idCol).cast("long").as("hist_id"),
        posexplode(bandValues(col(w0Col).cast("long"),
          col(w1Col).cast("long"), chunks)).as(Seq("band", "v")))
      .withColumn("v", col("v").as("v", chunkMeta(chunks, fpStamp)))
  }

  // the batch side is materialized ONCE (localCheckpoint — 24-byte
  // rows): three consumers follow (bucket-prune collect, candidate
  // join, verify), and in the streaming daemon each otherwise re-ran
  // the within-batch dedup's anti-join chain (Dedup.sketchBatchForProbe)
  private def sketchForProbe(
      batch: DataFrame, idCol: String, w0Col: String, w1Col: String,
      chunks: Int): (DataFrame, DataFrame) = {
    val b = batch.select(col(idCol).cast("long").as("batch_id"),
      col(w0Col).cast("long").as("w0"), col(w1Col).cast("long").as("w1"))
      .localCheckpoint(true)
    (b, b.select(col("batch_id"),
      posexplode(bandValues(col("w0"), col("w1"), chunks)).as(Seq("band", "v"))))
  }

  private def verifyHamming(
      cand: DataFrame, history: DataFrame, b: DataFrame,
      idCol: String, w0Col: String, w1Col: String,
      maxHamming: Int): DataFrame = {
    // broadcast the batch-bounded candidate-id side; left_semi dedups
    // its build keys, so no pre-distinct (see Dedup.verifyCandidates —
    // same 2-jobs/2-exchanges-per-probe rationale)
    val h = history
      .join(broadcast(cand.select(col("hist_id").cast("long").as(idCol))),
        Seq(idCol), "left_semi")
      .select(col(idCol).cast("long").as("hist_id"),
        col(w0Col).cast("long").as("h0"), col(w1Col).cast("long").as("h1"))
    cand
      .join(b, "batch_id")
      .join(h, "hist_id")
      .withColumn("hamming",
        hammingExpr(col("w0"), col("w1"), col("h0"), col("h1")))
      .filter(col("hamming") <= maxHamming)
      .select("batch_id", "hist_id", "hamming")
  }

  /** Filter one micro-batch of fingerprints against the persisted
    * state: within-batch Hamming dups collapse to the min-id
    * canonical, then the cross-batch probe drops everything within
    * `maxHamming` of an admitted fingerprint. Deterministic per
    * (state, batchId). */
  def hammingDupFilterBatch(
      batch: DataFrame,
      idCol: String,
      w0Col: String,
      w1Col: String,
      stateDir: String,
      batchId: Long,
      maxHamming: Int,
      fpStamp: Option[String] = None): DataFrame = {
    val chunks = chunksFor(maxHamming)
    // 1. within-batch: banded pairs + min-id canonical survives
    val pairs = hammingDupPairs(batch, idCol, w0Col, w1Col, maxHamming)
    val dropped = Dedup.dropNonCanonical(batch, pairs, idCol, lit(0))
      .select(col("doc_id").as("__drop_id"))
      .localCheckpoint(true)
    val within = batch.join(dropped,
      col(idCol).cast("long") === col("__drop_id"), "left_anti")
    // 2. cross-batch: the shared probe skeleton (replay/crash/torn
    // discipline in IndexState.probeAdmitted); the payload is the
    // fingerprint words themselves — tiny, but pruned the same way
    IndexState.probeAdmitted(stateDir, batchId, within,
      payloadName = "hashes", label = "hamming-dup",
      sketch = w => sketchForProbe(w, idCol, w0Col, w1Col, chunks),
      indexPb = bandBucket,
      joinKeys = Seq("band", "v"),
      checkIndex = checkChunkMeta(_, chunks, fpStamp),
      verify = (cand, hist, b) =>
        verifyHamming(cand, hist, b, idCol, w0Col, w1Col, maxHamming)) match {
      case None => within // first batch
      case Some(hitPairs) =>
        val hits = hitPairs.select(col("batch_id").as("__dup_id")).distinct()
        within.join(hits, col(idCol).cast("long") === col("__dup_id"),
          "left_anti")
    }
  }

  /** Commit survivors: band rows + fingerprint words, each
    * overwriting its own `bid=batchId` partition. All three columns
    * are cast to long — [[hammingBandBuckets]] already casts its
    * `hist_id`, and a payload persisted under the id's ORIGINAL type
    * would fold into buckets the probe (which prunes by the LongType
    * `hist_id` from the index join) never reads: silent admission of
    * near-dups for any non-long id column (round-9 advisor finding;
    * HammingDedupSpec holds the int-id regression). */
  def hammingDupCommitBatch(
      survivors: DataFrame,
      idCol: String,
      w0Col: String,
      w1Col: String,
      stateDir: String,
      batchId: Long,
      maxHamming: Int = 3,
      fpStamp: Option[String] = None): Unit = {
    hammingBandBuckets(survivors, idCol, w0Col, w1Col, maxHamming, fpStamp)
      .write.mode("overwrite").parquet(s"$stateDir/bands/bid=$batchId")
    survivors.select(col(idCol).cast("long").as(idCol),
        col(w0Col).cast("long").as(w0Col), col(w1Col).cast("long").as(w1Col))
      .write.mode("overwrite").parquet(s"$stateDir/hashes/bid=$batchId")
  }

  /** Fold live bids into a bucketed compact version — shared
    * IndexState.compact semantics. Fingerprint rows are 24 bytes, so
    * both artifacts default to dense buckets. */
  def compactHammingDupState(
      spark: org.apache.spark.sql.SparkSession,
      stateDir: String,
      upToBid: Long,
      minReplayableBid: Long,
      bandRowsPerBucket: Long = 1L << 16,
      hashRowsPerBucket: Long = 1L << 14,
      maxBuckets: Int = IndexState.DefaultMaxBuckets): (Long, Long) = {
    val counts = IndexState.compact(spark, stateDir, Seq(
      IndexState.Artifact("bands", (_, b) => bandBucket(b),
        bandRowsPerBucket, maxBuckets,
        sortCols = _ => Seq(col("band"), col("v"), col("hist_id"))),
      IndexState.payloadArtifact("hashes", hashRowsPerBucket, maxBuckets)),
      upToBid, minReplayableBid)
    (counts.getOrElse("bands", 0L), counts.getOrElse("hashes", 0L))
  }

  /** Wire filter + commit into a Structured Streaming query — shared
    * emit-before-commit wrapper with replay-safe periodic folds. */
  def streamingHammingDupFilter(
      stream: DataFrame,
      idCol: String,
      w0Col: String,
      w1Col: String,
      stateDir: String,
      maxHamming: Int,
      checkpointDir: Option[String] = None,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      compactEveryNTriggers: Option[Int] = None,
      fpStamp: Option[String] = None,
      onFoldCandidates: Option[(Double, Long) => Unit] = None)(
      emit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    IndexState.streamingAdmission(stream, stateDir, checkpointDir,
      trigger, compactEveryNTriggers,
      filterBatch = (b, bid) => hammingDupFilterBatch(b, idCol, w0Col,
        w1Col, stateDir, bid, maxHamming, fpStamp),
      commitBatch = (survivors, bid) => hammingDupCommitBatch(survivors,
        idCol, w0Col, w1Col, stateDir, bid, maxHamming, fpStamp),
      compactTo = (spark, upToBid, minReplayable) => {
        val (_, hashCount) =
          compactHammingDupState(spark, stateDir, upToBid, minReplayable)
        // candidates-per-doc in pigeonhole-band space (round-13
        // parity with the text/cosine fold gauges): an admitted
        // index of distinct fingerprints reads ~0; drift above O(1)
        // means band-value collapse (near-identical media flooding
        // one chunk value), which host-load noise cannot produce
        onFoldCandidates.foreach(
          _(IndexState.foldedCandidatesPerDoc(
            spark, stateDir, Seq("band", "v"), hashCount), hashCount))
      })(emit)
}
