package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING embedding near-dup admission — the cosine-space twin of
  * `Dedup.streamingNearDupFilter`, giving embedding streams the same
  * admission discipline text streams have (reference behavior: the
  * continuously-running dedup front door of a training-data ingest;
  * cf. turbolytics/sql-flow pipelines that filter a stream against
  * accumulated state, `sqlflow/handlers.py`). State is the PERSISTED
  * hyperplane band index plus admitted vectors under `stateDir`
  * ([[IndexState]] layout: bid-versioned live commits + bucketed
  * compact folds), never executor memory. Per trigger: O(|batch|·
  * bands) sketching, a compact-region read pruned to the buckets the
  * batch's own band values hit, exact-cosine verify bounded by the
  * CANDIDATE set, then probe-then-commit with the same replay
  * discipline as the text daemon (probes see `bid < batchId`; a
  * replayed commit overwrites its own partition; folds stay strictly
  * below every replayable bid).
  *
  * Recall contract = [[Similarity.lshCosinePairs]]' banding recall:
  * ~1 for the near-identical pairs admission filtering hunts (a
  * positively-scaled copy collides in EVERY band — hyperplane signs
  * are scale-invariant), fading below cosine ~0.8. Precision is 1.0
  * (every candidate is exact-verified at the rounded threshold). */
object CosineDedup {

  // ONE band bucket law, used by the fold-side artifact AND the
  // probe-side prune (round-9 advisor: nothing else enforces the two
  // agree; defining it once makes drift impossible)
  private def bandBucket(b: Int) =
    pmod(xxhash64(col("band"), col("v")), lit(b))
  private val bandArtifact =
    IndexState.Artifact("bands", (_, b) => bandBucket(b), 1L << 16,
      sortCols = _ => Seq(col("band"), col("v"), col("hist_id")))
  // vector buckets default SMALL (256 rows, vs 8k for text payloads):
  // the verify read is candidates × vecBucketBytes and an embedding
  // row is ~100× a band-index row, so bucket size IS the verify
  // read-amplification dial (SCALE.md round 10, cosine probe table).
  // At dim=768 float64, 256 rows ≈ 1.5 MB/bucket — object-store sized.
  private val vecArtifact = IndexState.payloadArtifact("vecs", 256L)

  /** Filter one micro-batch against the persisted state: within-batch
    * near-dups collapse to the min-id canonical first, then the
    * cross-batch probe drops everything colliding with an admitted
    * vector at `threshold`. Deterministic per (state, batchId) — a
    * replayed batch reproduces its own survivor set. `idCol` must be
    * numeric (canonicalization compares ids). */
  def cosineDupFilterBatch(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      stateDir: String,
      batchId: Long,
      threshold: Double,
      dim: Int,
      bands: Int = 16,
      rowsPerBand: Int = 12,
      seed: Long = 42L): DataFrame = {
    // 1. within-batch: LSH cosine pairs + min-id canonical survives
    // (dropped ids localCheckpoint inside dropNonCanonical's CC pass;
    // the anti-join keeps lineage off the pair generation)
    val pairs = Similarity.lshCosinePairs(batch, idCol, vecCol,
        threshold, dim, bands, rowsPerBand, seed)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val dropped = Dedup.dropNonCanonical(batch, pairs, idCol, lit(0))
      .select(col("doc_id").as("__drop_id"))
      .localCheckpoint(true)
    val within = batch.join(dropped,
      col(idCol).cast("long") === col("__drop_id"), "left_anti")
    // 2. cross-batch: probe the persisted band index (compact region
    // pruned to the batch's band-value buckets), exact-cosine verify
    // against the admitted vectors (pruned to the candidates' buckets)
    // — the replay/crash/torn-state discipline is the shared
    // IndexState.probeAdmitted skeleton
    IndexState.probeAdmitted(stateDir, batchId, within,
      payloadName = "vecs", label = "cosine-dup",
      sketch = w => Similarity.sketchVecBatchForProbe(
        w, idCol, vecCol, dim, bands, rowsPerBand, seed),
      indexPb = bandBucket,
      joinKeys = Seq("band", "v"),
      checkIndex = Similarity.checkHyperplaneIndexParams(
        _, dim, bands, rowsPerBand, seed),
      verify = (cand, hist, b) =>
        Similarity.verifyCosineCandidates(cand,
          hist.select(col(idCol), col(vecCol)),
          b.select(col("batch_id"), col(vecCol).as("v_b"),
            col("nrm").as("n_b")),
          idCol, vecCol, threshold)) match {
      case None => within // first batch
      case Some(hitPairs) =>
        val hits = hitPairs.select(col("batch_id").as("__dup_id")).distinct()
        within.join(hits, col(idCol) === col("__dup_id"), "left_anti")
    }
  }

  /** Commit one micro-batch's survivors: hyperplane band rows (what
    * future probes collide against) and admitted vectors (what they
    * exact-verify against), each overwriting its own `bid=batchId`
    * partition — a retried batch replaces, never duplicates. */
  def cosineDupCommitBatch(
      survivors: DataFrame,
      idCol: String,
      vecCol: String,
      stateDir: String,
      batchId: Long,
      dim: Int,
      bands: Int = 16,
      rowsPerBand: Int = 12,
      seed: Long = 42L): Unit = {
    Similarity.hyperplaneBandBuckets(survivors, idCol, vecCol,
        dim, bands, rowsPerBand, seed)
      .write.mode("overwrite").parquet(s"$stateDir/bands/bid=$batchId")
    survivors.select(col(idCol), col(vecCol))
      .write.mode("overwrite").parquet(s"$stateDir/vecs/bid=$batchId")
  }

  /** Fold live bid partitions (plus any previous fold) into a new
    * bucketed compact version — `Dedup.compactNearDupState` semantics
    * (all-or-nothing meta-last commit, replay-safe floor, probe
    * identity) over the cosine artifacts. */
  def compactCosineDupState(
      spark: org.apache.spark.sql.SparkSession,
      stateDir: String,
      upToBid: Long,
      minReplayableBid: Long,
      bandRowsPerBucket: Long = 1L << 16,
      vecRowsPerBucket: Long = 256L,
      maxBuckets: Int = IndexState.DefaultMaxBuckets): (Long, Long) = {
    val counts = IndexState.compact(spark, stateDir, Seq(
      bandArtifact.copy(targetRowsPerBucket = bandRowsPerBucket,
        maxBuckets = maxBuckets),
      vecArtifact.copy(targetRowsPerBucket = vecRowsPerBucket,
        maxBuckets = maxBuckets)),
      upToBid, minReplayableBid)
    (counts.getOrElse("bands", 0L), counts.getOrElse("vecs", 0L))
  }

  /** Wire filter + commit into a Structured Streaming query —
    * emit-before-commit (at-least-once; survivors deterministic per
    * bid, so an idempotent sink upgrades it), checkpoint under
    * `stateDir`, optional periodic compaction with the replay-safe
    * floor `bid - 1`. */
  def streamingCosineDupFilter(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      stateDir: String,
      threshold: Double,
      dim: Int,
      bands: Int = 16,
      rowsPerBand: Int = 12,
      seed: Long = 42L,
      checkpointDir: Option[String] = None,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      compactEveryNTriggers: Option[Int] = None)(
      emit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    IndexState.streamingAdmission(stream, stateDir, checkpointDir,
      trigger, compactEveryNTriggers,
      filterBatch = (b, bid) => cosineDupFilterBatch(b, idCol, vecCol,
        stateDir, bid, threshold, dim, bands, rowsPerBand, seed),
      commitBatch = (survivors, bid) => cosineDupCommitBatch(survivors,
        idCol, vecCol, stateDir, bid, dim, bands, rowsPerBand, seed),
      compactTo = (spark, upToBid, minReplayable) => {
        val (_, vecCount) =
          compactCosineDupState(spark, stateDir, upToBid, minReplayable)
        signatureSaturationWarning(vecCount, bands, rowsPerBand)
          .foreach(m => org.slf4j.LoggerFactory
            .getLogger(getClass).warn(m))
      })(emit)

  /** The signature-space saturation law, checked at fold time (the one
    * moment the daemon knows its admitted-corpus size for free): with
    * r-bit band values, every (band, value) cell is occupied once the
    * corpus ≫ 2^r, so probe candidates grow ∝ corpus/2^r PER BAND and
    * the exact-cosine verify — candidate-bounded by design — silently
    * degrades to reading a constant fraction of the vector store
    * (measured: 10× corpus → 7.6× probe bytes at 16×12-bit vs 1.05×
    * at 32×20-bit, SCALE.md round 10). Warns above an average 16
    * occupants per cell; the suggested `rows_per_band` restores ≤16.
    * Results are never affected — only probe cost. */
  def signatureSaturationWarning(
      admittedDocs: Long, bands: Int, rowsPerBand: Int): Option[String] = {
    val cells = 1L << math.min(rowsPerBand, 62)
    if (admittedDocs <= 16L * cells) None
    else {
      val suggested = 64 - java.lang.Long
        .numberOfLeadingZeros(admittedDocs / 16L)
      Some(s"cosine-dup signature space saturated: $admittedDocs admitted " +
        s"vectors over $bands bands of $rowsPerBand-bit values is " +
        f"${admittedDocs.toDouble / cells}%.0f occupants per (band, value) " +
        s"cell — probe candidates now grow with the corpus, not the batch. " +
        s"Raise rows_per_band to ~$suggested (and re-tune bands to hold " +
        s"recall: band-match p^r drops as r grows) on the NEXT state dir; " +
        s"banding params are stamped into the index, so changing them " +
        s"requires a fresh state (or a backfill re-commit).")
    }
  }
}
