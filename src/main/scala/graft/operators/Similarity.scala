package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._

/** Embedding similarity search and near-duplicate detection.
  *
  * Dot products use the native `VecDot` expression (codegen'd, no
  * per-row array allocation) directly over the stored array<float>.
  */
object Similarity {

  /** vec_id, embedding (array<float>), norm (double). Norms are
    * computed once map-side; zero vectors get a null norm so cosine
    * against them is null (filtered by any threshold). */
  def withNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol), col(vecCol),
      when(vec_dot(col(vecCol), col(vecCol)) > 0.0,
        sqrt(vec_dot(col(vecCol), col(vecCol)))).as("nrm"))

  /** All pairs with cosine ≥ threshold — embedding-space near-dup
    * detection. O(n²) pair enumeration: correct baseline at moderate n;
    * the 100-TB path is [[lshCosinePairs]] (identical output contract,
    * probabilistic recall).
    *
    * Shape notes (round 14, both measured):
    *  - the normed frame is cut EAGERLY (localCheckpoint — building
    *    this DataFrame runs the scan+norm job at construction time):
    *    the nested-loop cross join otherwise executes the
    *    scan→norm subtree on BOTH sides (broadcast build + stream),
    *    doubling the operator's map work;
    *  - the build side is an EXPLICIT broadcast: a checkpointed
    *    LogicalRDD has no size estimate, and the planner would fall
    *    back to CartesianProduct (partitions² tiny tasks). Broadcasting
    *    the whole corpus is exactly this operator's documented
    *    moderate-n contract — at scale use [[lshCosinePairs]];
    *  - the stream side spreads `computeBound` (floor at core count):
    *    per-row work is O(n) dot products, so byte-derived sizing
    *    starves the stage (the round-13 v02 2× regression). */
  def cosineDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = withNorm(
        graft.queries.Tables.spread(emb, computeBound = true), idCol, vecCol)
      .localCheckpoint(true)
    val a = e.select(col(idCol).as("id_a"), col(vecCol).as("v_a"), col("nrm").as("n_a"))
    val b = e.select(col(idCol).as("id_b"), col(vecCol).as("v_b"), col("nrm").as("n_b"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(vec_dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** All pairs with cosine ≥ threshold via random-hyperplane LSH
    * banding — the 100-TB replacement for [[cosineDupPairs]]'s O(n²)
    * enumeration. Same output contract (id_a < id_b, rounded cosine);
    * exact cosine verify makes precision 1.0, so only recall (pairs
    * colliding in no band) is probabilistic.
    *
    * Scale anatomy (each choice is a fix for a measured failure):
    *  - band values come from the native [[graft.functions.HyperplaneBands]]
    *    expression with WIDE bands (`rowsPerBand` bits, default 12) —
    *    a random pair collides per band with prob ~2^-rows, so
    *    candidate volume is bands·n²/2^rows (n²/256 at defaults); the
    *    old 2-bit bands made the self-join effectively O(n²) and OOM'd
    *    at 20k vectors;
    *  - the bucket self-join carries ONLY (id, band, value); embeddings
    *    re-join per candidate pair at the verify step, so a hot bucket
    *    costs narrow rows, not pairs-of-vectors.
    *
    * Recall at defaults (16 bands × 12 bits): ~0.94 at cosine 0.9,
    * fading fast below ~0.8 — hyperplane banding prunes only
    * high-similarity thresholds; for low thresholds use
    * [[cosineDupPairs]] (exact) or IVF-blocked pairing. */
  def lshCosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int,
      bands: Int = 16, rowsPerBand: Int = 12, seed: Long = 42L): DataFrame = {
    val e = withNorm(graft.queries.Tables.spread(emb), idCol, vecCol)
    val buckets = e.select(col(idCol),
        posexplode(graft.functions.HashFunctions.hyperplane_bands(
          col(vecCol), dim, bands, rowsPerBand, seed)).as(Seq("band", "v")))
    // hint("merge"): self-join exchange reuse — the hyperplane-band
    // pipeline runs ONCE, not once per join side (see
    // Dedup.jaccardPairsWithCounts for the full rationale)
    val cand = buckets.as("x").hint("merge")
      .join(buckets.as("y"), Seq("band", "v"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    val sides = e.select(col(idCol), col(vecCol), col("nrm"))
    cand
      .join(sides.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
        col("nrm").as("n_a")), "id_a")
      .join(sides.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
        col("nrm").as("n_b")), "id_b")
      .withColumn("cosine",
        round(vec_dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Persistable hyperplane band index over a corpus — the vector
    * analog of `Dedup.minhashBandBuckets`: (hist_id, band, v) rows a
    * later [[cosineProbeIndex]] collides new batches against. Build
    * params (dim/bands/rowsPerBand/seed) ride as column metadata
    * through parquet footers so a mismatched probe fails loudly
    * instead of silently returning zero collisions (the same
    * silent-recall-loss hole the MinHash index closed in round 7). */
  def hyperplaneBandBuckets(
      emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int = 16, rowsPerBand: Int = 12, seed: Long = 42L): DataFrame = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.hyperplane.dim", dim.toLong)
      .putLong("graft.hyperplane.bands", bands.toLong)
      .putLong("graft.hyperplane.rowsPerBand", rowsPerBand.toLong)
      .putLong("graft.hyperplane.seed", seed)
      .build()
    graft.queries.Tables.spread(emb)
      .select(col(idCol).as("hist_id"),
        posexplode(graft.functions.HashFunctions.hyperplane_bands(
          col(vecCol), dim, bands, rowsPerBand, seed)).as(Seq("band", "v")))
      .withColumn("v", col("v").as("v", md))
  }

  /** Probe a (possibly persisted) hyperplane band index with a new
    * batch: candidates from the CROSS-SET (band, value) join, exact
    * cosine verify against the history vectors (the index carries
    * only band values; vectors join back per surviving candidate,
    * history semi-joined to colliding ids first so per-probe vector
    * work is candidate-bounded). Precision 1.0; recall is
    * [[lshCosinePairs]]' banding recall — near 1 for the
    * near-identical pairs incremental dedup hunts, fading below
    * cosine ~0.8 (use exact pairing there).
    * @return (batch_id, hist_id, cosine) with cosine ≥ threshold */
  def cosineProbeIndex(
      index: DataFrame, history: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double, dim: Int,
      bands: Int = 16, rowsPerBand: Int = 12, seed: Long = 42L): DataFrame = {
    checkHyperplaneIndexParams(index, dim, bands, rowsPerBand, seed)
    val (b, bBuckets) =
      sketchVecBatchForProbe(batch, idCol, vecCol, dim, bands, rowsPerBand, seed)
    // batch band rows broadcast into the index join — trigger-sized vs
    // corpus-sized; kills both SMJ exchanges (see Dedup.minhashProbeIndex)
    val cand = broadcast(bBuckets).join(index, Seq("band", "v"))
      .select("batch_id", "hist_id").distinct()
      .localCheckpoint(true)
    verifyCosineCandidates(cand, history,
      b.select(col("batch_id"), col(vecCol).as("v_b"), col("nrm").as("n_b")),
      idCol, vecCol, threshold)
  }

  /** Fail loudly on a probe whose hyperplane params differ from the
    * index's build params (band values would never collide — silent
    * zero recall otherwise). */
  private[operators] def checkHyperplaneIndexParams(
      index: DataFrame, dim: Int, bands: Int, rowsPerBand: Int,
      seed: Long): Unit =
    index.schema.fields.find(_.name == "v").map(_.metadata)
      .filter(_.contains("graft.hyperplane.dim")).foreach { m =>
        val built = (m.getLong("graft.hyperplane.dim"),
          m.getLong("graft.hyperplane.bands"),
          m.getLong("graft.hyperplane.rowsPerBand"),
          m.getLong("graft.hyperplane.seed"))
        val probed = (dim.toLong, bands.toLong, rowsPerBand.toLong, seed)
        require(built == probed,
          s"hyperplane index built with (dim,bands,rows,seed)=$built but " +
            s"probed with $probed — band values would never collide")
      }

  /** Sketch a probe batch ONCE and materialize it (localCheckpoint):
    * normed vectors as `batch_id` plus the exploded (batch_id, band,
    * v) hyperplane band rows DERIVED from the materialized frame —
    * the probe-side mirror of [[hyperplaneBandBuckets]]. Three
    * consumers follow (bucket-prune collect, candidate join, verify's
    * vector side); before the cut each re-ran the batch pipeline —
    * norms + bands·rowsPerBand projections, plus the within-batch
    * dedup anti-join in the streaming daemon (see
    * Dedup.sketchBatchForProbe). */
  private[operators] def sketchVecBatchForProbe(
      batch: DataFrame, idCol: String, vecCol: String,
      dim: Int, bands: Int, rowsPerBand: Int, seed: Long)
      : (DataFrame, DataFrame) = {
    val b = withNorm(graft.queries.Tables.spread(batch), idCol, vecCol)
      .withColumnRenamed(idCol, "batch_id")
      .localCheckpoint(true)
    val bBuckets = b.select(col("batch_id"),
      posexplode(graft.functions.HashFunctions.hyperplane_bands(
        col(vecCol), dim, bands, rowsPerBand, seed)).as(Seq("band", "v")))
    (b, bBuckets)
  }

  /** Exact-cosine verify of (batch_id, hist_id) candidates; history
    * vectors are semi-joined to the candidate ids first, so per-probe
    * vector work is candidate-bounded. */
  private[operators] def verifyCosineCandidates(
      cand: DataFrame, history: DataFrame, bVec: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // broadcast the batch-bounded candidate-id side; left_semi dedups
    // its build keys, so no pre-distinct (see Dedup.verifyCandidates —
    // same 2-jobs/2-exchanges-per-probe rationale)
    val hVecs = withNorm(
      history.join(broadcast(cand.select(col("hist_id").as(idCol))),
        Seq(idCol), "left_semi"), idCol, vecCol)
      .select(col(idCol).as("hist_id"), col(vecCol).as("v_h"),
        col("nrm").as("n_h"))
    cand
      .join(bVec, "batch_id")
      .join(hVecs, "hist_id")
      .withColumn("cosine",
        round(vec_dot(col("v_b"), col("v_h")) / (col("n_b") * col("n_h")), 4))
      .filter(col("cosine") >= threshold)
      .select("batch_id", "hist_id", "cosine")
  }

  /** Incremental embedding near-dup: which new-batch vectors
    * near-duplicate a historical corpus — `Dedup
    * .minhashIncrementalPairs`' exact analog for cosine space, and
    * the missing leg of the t109 crawl chain when documents arrive
    * as embeddings. History is banded ONCE (persistable via
    * [[hyperplaneBandBuckets]]); each batch probes cross-set only,
    * so daily cost is O(|batch|·bands) + candidate verifies, never
    * O(corpus²). */
  def lshCosineIncrementalPairs(
      history: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double, dim: Int,
      bands: Int = 16, rowsPerBand: Int = 12, seed: Long = 42L): DataFrame =
    cosineProbeIndex(
      hyperplaneBandBuckets(history, idCol, vecCol, dim, bands, rowsPerBand, seed),
      history, batch, idCol, vecCol, threshold, dim, bands, rowsPerBand, seed)

  /** Brute-force top-k cosine neighbors for a (small, broadcast) query
    * set: one linear scan of the corpus per partition — the exact
    * baseline every ANN variant is measured against. Ranking is by
    * (rounded cosine desc, id asc) so ties are deterministic. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(graft.queries.Tables.spread(corpus), idCol, vecCol)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("v_c"), col("nrm").as("n_c"))
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"), col("nrm").as("n_q"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        round(vec_dot(col("v_q"), col("v_c")) / (col("n_q") * col("n_c")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), round(col("cosine"), 4).as("cosine"),
        col("rank"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * (anchor), the top-k most-similar corpus vectors whose `labelCol`
    * DIFFERS from the anchor's — the near-miss negatives that make
    * triplet/InfoNCE batches informative (high cosine, wrong class).
    *
    * Shape is [[bruteForceTopK]] with a label-mismatch predicate
    * pushed into the candidate filter: broadcast anchors × one linear
    * corpus scan, per-anchor window top-k. Exact by contract — the
    * auditing baseline. At 100 TB compose the same predicate into
    * [[ivfTopK]]'s probed-cell scan instead (the label filter is a
    * cheap row predicate either way; it prunes BEFORE the dot
    * product, so mining cost ≤ plain ANN cost). */
  def hardNegativesTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    // withNorm projects to (id, vec, nrm) — join the label back in via
    // an inline norm instead so the scan stays single-pass
    def normed(df: DataFrame) = df.select(
      col(idCol), col(labelCol), col(vecCol),
      when(vec_dot(col(vecCol), col(vecCol)) > 0.0,
        sqrt(vec_dot(col(vecCol), col(vecCol)))).as("nrm"))
    val c = normed(graft.queries.Tables.spread(corpus))
      .select(col(idCol).as("nbr_id"), col(labelCol).as("nbr_label"),
        col(vecCol).as("v_c"), col("nrm").as("n_c"))
    val q = normed(queries)
      .select(col(idCol).as("query_id"), col(labelCol).as("anchor_label"),
        col(vecCol).as("v_q"), col("nrm").as("n_q"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_label") =!= col("anchor_label"))
      .withColumn("cosine",
        round(vec_dot(col("v_q"), col("v_c")) / (col("n_q") * col("n_c")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("anchor_label"), col("nbr_id"),
        col("nbr_label"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein
    * 1998): per query, greedily pick `k` vectors from its `poolSize`
    * nearest candidates, each step maximizing
    * λ·cos(q,d) − (1−λ)·max_{s∈selected} cos(d,s) — relevance minus
    * redundancy, the diversified-retrieval shape (diverse few-shot /
    * RAG example selection over a training corpus).
    *
    * The greedy loop is inherently sequential in k but k is small and
    * the per-step work is a window argmax over each query's candidate
    * pool — pool×pool pairwise cosines are computed ONCE up front
    * (poolSize² per query, queries broadcast-sized by contract). All
    * scores round to 6 digits before comparison with id tie-breaks,
    * so the pick sequence is deterministic and engine-portable. At
    * 100 TB the candidate pool comes from [[ivfTopK]] instead of the
    * brute-force scan; the MMR refinement cost is unchanged (it never
    * touches the corpus again). */
  def mmrSelect(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int, poolSize: Int, lambda: Double): DataFrame = {
    val c = withNorm(graft.queries.Tables.spread(corpus), idCol, vecCol)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("v_c"), col("nrm").as("n_c"))
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"), col("nrm").as("n_q"))
    val wPool = Window.partitionBy("query_id")
      .orderBy(col("qc").desc, col("nbr_id"))
    val cand = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("qc",
        round(vec_dot(col("v_q"), col("v_c")) / (col("n_q") * col("n_c")), 6))
      .withColumn("prank", row_number().over(wPool))
      .filter(col("prank") <= poolSize)
      .select("query_id", "nbr_id", "qc", "v_c", "n_c")
    // pool×pool pairwise cosines, computed once — the redundancy term
    val pairCos = cand.select(col("query_id"), col("nbr_id").as("a_id"),
        col("v_c").as("v_a"), col("n_c").as("n_a"))
      .join(cand.select(col("query_id"), col("nbr_id").as("b_id"),
        col("v_c").as("v_b"), col("n_c").as("n_b")), Seq("query_id"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("pc",
        round(vec_dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6))
      .select("query_id", "a_id", "b_id", "pc")
    val slim = cand.select("query_id", "nbr_id", "qc")
    val wPick = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("nbr_id"))
    def argmax(scored: DataFrame, pick: Int) = scored
      .withColumn("r", row_number().over(wPick))
      .filter(col("r") === 1)
      .select(col("query_id"), lit(pick).as("pick"),
        col("nbr_id"), col("score"))
    var selected = argmax(slim.withColumn("score", col("qc")), 1)
    var remaining = slim.join(
      selected.select(col("query_id"), col("nbr_id")),
      Seq("query_id", "nbr_id"), "left_anti")
    for (step <- 2 to k) {
      val redundancy = pairCos
        .join(selected.select(col("query_id"), col("nbr_id").as("b_id")),
          Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id").as("nbr_id"))
        .agg(max("pc").as("msim"))
      val scored = remaining.join(redundancy, Seq("query_id", "nbr_id"))
        .withColumn("score",
          round(lit(lambda) * col("qc") - lit(1 - lambda) * col("msim"), 6))
        .select("query_id", "nbr_id", "qc", "score")
      val pick = argmax(scored, step)
      selected = selected.unionByName(pick)
      remaining = remaining.join(
        pick.select(col("query_id"), col("nbr_id")),
        Seq("query_id", "nbr_id"), "left_anti")
    }
    selected
      .select(col("query_id"), col("pick"), col("nbr_id"),
        round(col("score"), 4).as("mmr_score"))
  }

  /** LSH-bucketed ANN top-k: candidates = corpus vectors sharing at
    * least one signature band with the query, exact cosine + top-k
    * within candidates.
    *
    * The scale path vs [[bruteForceTopK]]: the bucket join is keyed by
    * (band, value) with the small query side broadcast — O(corpus)
    * work, no cross product. Band values come from the native
    * [[graft.functions.HyperplaneBands]] expression (wide bands — see
    * [[lshCosinePairs]] for why); recall is tuned by bands ×
    * rowsPerBand. Buckets carry ids only; vectors join back per
    * candidate. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, bands: Int = 8, rowsPerBand: Int = 12,
      seed: Long = 42L): DataFrame = {
    def sigBands(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        posexplode(graft.functions.HashFunctions.hyperplane_bands(
          col(vecCol), dim, bands, rowsPerBand, seed)).as(Seq("band", "v")))
    bandedTopK(corpus, queries, idCol, vecCol, k, sigBands)
  }

  /** Engine-portable variant of [[lshTopK]] for oracle-checked gates:
    * band signatures come from the seed-free md5-parity ±1 sign matrix
    * ([[signMatrix]], the v15 derivation — any SQL engine reproduces it
    * from md5 alone) instead of the native xxhash hyperplanes, so the
    * FULL pipeline (banding → bucket join → candidate dedup → exact
    * cosine verify → rank) replays in SQL. Identical join machinery and
    * scale shape ((band, value)-keyed bucket join, broadcast query
    * side); [[lshTopK]]'s codegen'd signatures remain the speed path. */
  def lshTopKPortable(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, bands: Int = 8, rowsPerBand: Int = 8): DataFrame = {
    val nHyp = bands * rowsPerBand
    val flat = signMatrix(dim, nHyp).flatten // row-major: plane j, dim i
    val rLit = typedLit(flat.toSeq)
    def sigBands(df: DataFrame, as: String): DataFrame = {
      val v = transform(col(vecCol), x => x.cast("double"))
      // bit_j = [dot(v, plane_j) > 0] — ascending-index fold, so the
      // double sum is bit-identical across engines (v15's contract)
      val bits = transform(sequence(lit(0), lit(nHyp - 1)), j =>
        when(aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
          (acc, i) => acc +
            element_at(rLit, j * lit(dim) + i + 1) * element_at(v, i + 1))
          > 0, 1).otherwise(0))
      // band value packs that band's rowsPerBand bits (compile-time
      // unrolled: small integer sums, no runtime shift expression)
      val bvals = array((0 until bands).map { b =>
        (0 until rowsPerBand).map { r =>
          element_at(bits, b * rowsPerBand + r + 1) * lit(1 << r)
        }.reduce(_ + _)
      }: _*)
      df.select(col(idCol).as(as), posexplode(bvals).as(Seq("band", "v")))
    }
    bandedTopK(corpus, queries, idCol, vecCol, k, sigBands)
  }

  /** Shared LSH top-k machinery: (band, value) bucket join with the
    * small query side broadcast, candidate dedup, exact-cosine verify,
    * per-query rank — O(corpus) bucket work, no cross product. */
  private def bandedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      sigBands: (DataFrame, String) => DataFrame): DataFrame = {
    val corpusSpread = graft.queries.Tables.spread(corpus)
    val cb = sigBands(corpusSpread, "nbr_id")
    val qb = sigBands(queries, "query_id")
    val cand = cb.join(broadcast(qb), Seq("band", "v"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select("query_id", "nbr_id")
      .distinct()
      .join(withNorm(corpusSpread, idCol, vecCol)
        .select(col(idCol).as("nbr_id"), col(vecCol).as("v_c"),
          col("nrm").as("n_c")), "nbr_id")
      .join(broadcast(withNorm(queries, idCol, vecCol)
        .select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
          col("nrm").as("n_q"))), "query_id")
    // zero-norm vectors get null cosine via withNorm (NaN would sort
    // ABOVE every real value in desc order and steal top-k slots)
    val scored = cand.withColumn("cosine", round(
      vec_dot(col("v_q"), col("v_c")) / (col("n_q") * col("n_c")), 6))
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), round(col("cosine"), 4).as("cosine"),
        col("rank"))
  }

  /** IVF-style ANN top-k: a coarse quantizer of `nCells` seeded sample
    * centroids partitions the corpus by nearest centroid; each query
    * probes its `nProbe` nearest cells and searches only those.
    *
    * This is the canonical 100-TB ANN architecture on Spark: the
    * corpus is bucketed ONCE by cell (in production: written
    * partitioned/bucketed by cell id), and a query touches
    * nProbe/nCells of the data — partition pruning, not a cross
    * product. Centroids are a tiny model: collected to the driver and
    * broadcast into codegen as literals. Recall depends on how
    * clustered the data is; [[bruteForceTopK]] is the exact baseline. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val (cents, assigned) = ivfBuildIndex(corpus, idCol, vecCol, nCells)
    ivfSearchIndex(cents, assigned, queries, idCol, vecCol, k, nProbe)
  }

  /** The PERSISTABLE build half of [[ivfTopK]] — production IVF
    * separates index BUILD (once per corpus snapshot) from SEARCH
    * (every query batch). Returns (centroids, assignments):
    * centroids is nCells tiny rows (cell, cvec); assignments is one
    * (nbr_id, v_c, cell) row per corpus vector — write it partitioned
    * by cell and a search probes nProbe/nCells of the files.
    * AnnSpec proves a parquet round trip searches identically to the
    * fused path. */
  def ivfBuildIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16): (DataFrame, DataFrame) = {
    // deterministic ENGINE-PORTABLE sample: the nCells corpus vectors
    // with smallest (md5(id), id) — any SQL engine re-derives the same
    // centroid set, which is what lets the whole pipeline (assign →
    // probe → verify → rank) replay in an oracle
    val centroids = collectCentroids(corpus, idCol, vecCol, nCells)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centsDf = centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("cell", "cvec")
      .select(col("cell"), col("cvec").cast("array<float>").as("cvec"))
    // corpus side: assign to the single nearest cell
    val assigned = graft.queries.Tables.spread(corpus)
      .withColumn("sims", cellSimsFor(centroids, col(vecCol)))
      .withColumn("cell",
        expr("array_position(sims, array_max(sims))").cast("int") - 1)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("v_c"), col("cell"))
    (centsDf, assigned)
  }

  private def collectCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): Array[(Int, Array[Float])] =
    corpus
      .select(col(idCol), col(vecCol))
      .withColumn("h", md5(col(idCol).cast("string")))
      .orderBy(col("h"), col(idCol))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

  // similarities round to 6 decimals BEFORE argmax/probe selection
  // (ties break on cell index) — v13's rounded-argmin determinism rule
  private def cellSimsFor(
      centroids: Array[(Int, Array[Float])],
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array(centroids.map { case (_, c) =>
      val cl = array(c.map(x => lit(x)).toSeq: _*)
      round(vec_dot(v, cl) / sqrt(lit(c.map(x => x.toDouble * x).sum)), 6)
    }.toSeq: _*)

  /** SEARCH half of [[ivfTopK]] over a (possibly persisted) index from
    * [[ivfBuildIndex]]: the bounded centroid table collects back to a
    * driver model (nCells·dim floats) and queries probe assignments by
    * cell — identical scoring/rank contract to the fused path. */
  def ivfSearchIndex(
      centroidsDf: DataFrame, assignments: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val centroids: Array[(Int, Array[Float])] = centroidsDf
      .select(col("cell"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def cellSims(v: org.apache.spark.sql.Column) = cellSimsFor(centroids, v)
    val withCell = assignments

    // query side: probe the nProbe nearest cells
    val qProbes = queries
      .withColumn("sims", cellSims(col(vecCol)))
      .withColumn("probe_cells",
        expr(s"slice(array_sort(transform(sims, (s, i) -> struct(-s AS s, i AS i))), 1, $nProbe).i"))
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
        explode(col("probe_cells")).as("cell"))

    // zero-norm guard as in lshTopK: null cosine, filtered (not NaN)
    val scored = withCell.join(broadcast(qProbes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("n_q", when(vec_dot(col("v_q"), col("v_q")) > 0.0,
        sqrt(vec_dot(col("v_q"), col("v_q")))))
      .withColumn("n_c", when(vec_dot(col("v_c"), col("v_c")) > 0.0,
        sqrt(vec_dot(col("v_c"), col("v_c")))))
      .withColumn("cosine", round(
        vec_dot(col("v_q"), col("v_c")) / (col("n_q") * col("n_c")), 6))
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), round(col("cosine"), 4).as("cosine"),
        col("rank"))
  }

  /** INCREMENTAL append to a persisted IVF index: assign a NEW batch
    * of vectors to the FROZEN centroid set from [[ivfBuildIndex]] —
    * the same rounded-argmax rule the build used — and return rows in
    * the assignments schema (nbr_id, v_c, cell). Write them
    * partitionBy(cell) next to the existing index files and
    * [[ivfSearchIndex]] over the union searches history + batch
    * identically (AnnSpec proves the round trip).
    *
    * This is the third piece of the index LIFECYCLE: build once per
    * snapshot (v05), append each arriving batch at O(|batch|·nCells)
    * with NO history re-scan and NO re-cluster (this), and re-cluster
    * only when centroid-drift monitoring (v32's per-source drift
    * report) says the frozen quantizer has drifted — the standard
    * production IVF maintenance loop. At 100 TB a daily batch lands as one
    * partitioned append (map-only: centroids are a driver model of
    * nCells·dim floats folded in as literals, so the batch never
    * shuffles), vs. re-clustering the full corpus.
    *
    * Caveat the monitoring loop owns: appends concentrate in the
    * cells the NEW data is densest in, so probe cost per query grows
    * with the hottest cell, not the average — the [[graft.operators
    * .Skew]] histogram over `cell` is the reindex trigger. */
  def ivfAppendIndex(
      centroidsDf: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val centroids: Array[(Int, Array[Float])] = centroidsDf
      .select(col("cell"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(centroids.nonEmpty, "ivfAppendIndex: empty centroid table")
    require(centroids.map(_._1).toSeq == centroids.indices,
      s"ivfAppendIndex: centroid cells must be exactly 0..${centroids.length - 1}")
    graft.queries.Tables.spread(batch)
      .withColumn("sims", cellSimsFor(centroids, col(vecCol)))
      .withColumn("cell",
        expr("array_position(sims, array_max(sims))").cast("int") - 1)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("v_c"), col("cell"))
  }

  /** All pairs with cosine ≥ threshold via IVF cell blocking — the
    * third member of the near-dup family (exact [[cosineDupPairs]] /
    * hyperplane-banded [[lshCosinePairs]] / this). Each vector joins
    * its `nProbe` nearest coarse cells; candidate pairs are generated
    * WITHIN cells only and verified with the exact cosine, so
    * precision is 1.0 and only recall is probabilistic (a pair whose
    * members share no probed cell is missed — multi-probe on both
    * sides covers boundary-straddling pairs).
    *
    * Scale shape vs [[lshCosinePairs]]: one hashpartition shuffle on
    * cell id carrying (cell, id) ONLY — 16 bytes per probe, never the
    * vectors (the sf1 rehearsal caught the vector-carrying variant
    * filling 73 GB of shuffle disk; vectors now join back per
    * SURVIVING candidate pair, the lshCosinePairs discipline).
    * Candidate volume ≈ Σ|cell|² ≈ n²·nProbe²/nCells for balanced
    * cells, so `nCells` MUST grow with n: pass nCells ≤ 0 (the
    * default) to derive it as n / targetCellSize — cell population
    * then stays constant as the corpus grows and candidate volume
    * scales linearly (n·targetCellSize·nProbe²). A fixed nCells on a
    * growing corpus re-creates the quadratic blowup. Clustered data
    * (the realistic embedding shape) makes cells the natural dedup
    * blocks; a pathologically hot cell degrades to all-pairs within
    * it — the [[graft.operators.Skew]] histogram diagnoses that, and
    * banded LSH is the fallback. Centroids are a driver model
    * (nCells·dim floats) folded into the plan as literals — capped at
    * 1024 cells (≈256k literal floats at dim 64); past that
    * (≳260k vectors at the default cell size) assignment needs a
    * two-level quantizer (coarse cells → sub-cells), the standard
    * IVF-HNSW/IMI evolution. */
  def ivfCosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 0, nProbe: Int = 2,
      targetCellSize: Int = 256): DataFrame = {
    val spread = graft.queries.Tables.spread(emb)
    // nProbe multiplies the probe population, so it enters the sizing:
    // cells = n·nProbe/target keeps the PER-CELL probe count at
    // targetCellSize and candidate volume linear (n·nProbe·target/2)
    // sizing count runs on the RAW input (not the spread/repartitioned
    // frame) so parquet-backed corpora answer from footer metadata
    // instead of paying a scan+shuffle before the plan even exists
    val cells =
      if (nCells > 0) nCells
      else math.min(1024,
        math.max(16, (emb.count() * nProbe / targetCellSize).toInt + 1))
    val centroids: Array[(Int, Array[Float])] = emb
      .select(col(idCol), col(vecCol))
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy("h")
      .limit(cells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

    def cellSims(v: org.apache.spark.sql.Column) = array(centroids.map {
      case (_, c) =>
        val cl = array(c.map(x => lit(x)).toSeq: _*)
        vec_dot(v, cl) / sqrt(lit(c.map(x => x.toDouble * x).sum))
    }.toSeq: _*)

    // the probe rows CARRY (vector, norm) through the one cell-keyed
    // exchange, and the cosine verify runs INSIDE the pair join: one
    // corpus-sized shuffle of nProbe·|corpus| vector rows replaces the
    // old ids-only shape's candidate distinct + two vector join-backs
    // (3 candidate-set exchanges + 2 joins — at a candidate volume of
    // n·nProbe·targetCellSize/2 the 16-byte pair rows outweighed the
    // vectors they were saving: measured 7.5 MB of candidate exchanges
    // vs 2 MB of vectors at sf0.1, and 3 fewer stages). Crossover
    // condition for retuning: this shape shuffles nProbe·vectorBytes
    // per row vs the old shape's ~16·nProbe·targetCellSize/2 bytes of
    // pair rows — vector-carrying wins while vectorBytes <
    // 8·targetCellSize (dim ≲ 512 at target 256, float32); higher dims
    // or a much smaller targetCellSize flip it back toward ids-only.
    // A pair
    // co-occurring in up to nProbe cells now pays up to nProbe dot
    // products instead of a 1M-row distinct; survivors dedup at the
    // end, where the set is output-sized. The per-cell SMJ group
    // buffer holds one cell's rows (targetCellSize × vector bytes —
    // ~768 KB at dim 768), executor-safe.
    val probed = withNorm(spread, idCol, vecCol)
      .withColumn("sims", cellSims(col(vecCol)))
      .withColumn("cells",
        expr(s"slice(array_sort(transform(sims, (s, i) -> struct(-s AS s, i AS i))), 1, $nProbe).i"))
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("nrm"),
        explode(col("cells")).as("cell"))

    val a = probed.select(col("cell"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = probed.select(col("cell"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    // hint("merge"): self-join exchange reuse — the cell-similarity
    // projection (nCells dot products per row) runs ONCE, not once per
    // join side (see Dedup.jaccardPairsWithCounts for the rationale)
    a.hint("merge").join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(vec_dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication in embedding space — block the corpus with the IVF
    * coarse quantizer, generate within-cell cosine near-dup pairs,
    * union-find the pairs into duplicate groups, and keep ONE
    * representative per group. The representative here is the minimum
    * id (deterministic, auditable); the paper keeps the member with
    * the lowest centroid similarity — that variant is a one-line swap
    * of the keep rank using [[centroidDistance]].
    *
    * Scale shape: pair generation is [[ivfCosinePairs]] (cell-blocked
    * candidates + exact verify — never all-pairs), grouping is
    * [[graft.operators.Dedup.connectedComponents]] (alternating
    * large-star/small-star keyed aggs, O(log diameter) rounds), and
    * the keep decision is ONE left join back to the corpus spine. No
    * stage materializes more than corpus + candidate pairs.
    *
    * Output: (idCol, rep_id, keep) for EVERY input row — `keep=false`
    * rows name the representative that supersedes them. */
  def semDeDup(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val pairs = ivfCosinePairs(emb, idCol, vecCol, threshold, nCells, nProbe)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("doc_id", idCol)
    emb.select(col(idCol).cast("long").as(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("rep_id", coalesce(col("component_id"), col(idCol)))
      .withColumn("keep", col("rep_id") === col(idCol))
      .select(col(idCol), col("rep_id"), col("keep"))
  }

  /** Soft semantic dedup: instead of [[semDeDup]]'s keep/drop
    * decision, every member of a near-duplicate cluster gets sampling
    * weight 1/|cluster| — the corpus keeps its full support (no
    * document vanishes) while each duplicated CONTENT contributes one
    * unit of expected training mass. This is the mixture-preserving
    * variant: hard dedup shifts the source mixture when duplication
    * rates differ across sources; soft weights leave every marginal
    * untouched.
    *
    * Scale shape: [[semDeDup]]'s IVF-bucketed pair generation +
    * label propagation, then ONE rep-keyed count and a rep-keyed
    * join-back — both shuffles on the (small) component id space.
    * Weight arithmetic is exact (1/int, round-6). */
  def softDedupWeights(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val labeled = semDeDup(emb, idCol, vecCol, threshold, nCells, nProbe)
    val sizes = labeled.groupBy("rep_id")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "rep_id")
      .select(col(idCol), col("rep_id"), col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 6).as("weight"))
  }

  /** Per-group embedding centroid + each vector's cosine to its own
    * group's centroid — the standard embedding-space outlier / label-
    * noise score (vectors far from their class centroid are candidate
    * mislabels or off-distribution samples to prune before training).
    *
    * Scale shape: `posexplode → groupBy(group, dim).avg` rides on
    * map-side partial aggregation — the shuffle carries only
    * #groups × dim partials per input partition, never N × dim element
    * rows. Centroid re-assembly (#groups rows) is a driver-scale
    * aggregate broadcast back to the corpus, so the per-vector scoring
    * stage is map-only with no second shuffle.
    *
    * Precision: the centroid is true doubles (an average), so the dot
    * product uses double `zip_with`/`aggregate` (sequential index
    * order, like DuckDB's list_dot_product) rather than [[vec_dot]],
    * whose float input coercion would down-cast the centroid. */
  def centroidDistance(
      emb: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

    val centroids = emb
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(groupCol, "pos")
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy(groupCol)
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

    emb
      .withColumn("v", transform(col(vecCol), x => x.cast("double")))
      .join(broadcast(centroids), Seq(groupCol))
      .withColumn("n_v", when(dot(col("v"), col("v")) > 0.0,
        sqrt(dot(col("v"), col("v")))))
      .withColumn("n_c", when(dot(col("centroid"), col("centroid")) > 0.0,
        sqrt(dot(col("centroid"), col("centroid")))))
      .select(col(idCol), col(groupCol),
        round(dot(col("v"), col("centroid")) / (col("n_v") * col("n_c")), 4)
          .as("cos_centroid"))
  }

  /** Per-dimension mean / stddev / extrema of an embedding column —
    * the feature-distribution health check run before training or
    * index-building (a collapsed dimension or an unnormalized feature
    * shows up here first).
    *
    * Shape: posexplode fans each row into `dim` (pos, value) rows, then
    * ONE hash aggregation keyed by pos — map-side partial aggregation
    * means the shuffle carries `dim × partitions` partial states, not
    * `rows × dim` values, so at 100 TB the exchanged data is a few KB
    * per partition regardless of corpus size. */
  def dimensionStats(emb: DataFrame, vecCol: String): DataFrame =
    graft.queries.Tables.spread(emb)
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy("pos")
      .agg(
        count(lit(1)).as("n"),
        round(avg("x"), 4).as("mean"),
        round(stddev_samp(col("x")), 4).as("sd"),
        round(min("x"), 4).as("mn"),
        round(max("x"), 4).as("mx"))

  /** Semantic (embedding-space) cross-corpus contamination: pairs of
    * (probe, corpus) vectors with cosine ≥ threshold. The companion to
    * [[graft.operators.Dedup.contaminationPairs]]'s n-gram overlap —
    * n-grams catch verbatim leakage, cosine catches paraphrased /
    * re-rendered leakage of eval data into a training corpus.
    *
    * Exact by contract: the probe (benchmark) side is SMALL — it is
    * broadcast, so the corpus side streams through one map stage with
    * zero shuffle, the same asymptotics as [[bruteForceTopK]]. For a
    * probe set too large to broadcast, compose [[ivfCosinePairs]] /
    * [[lshCosinePairs]] over the union instead (probabilistic recall,
    * bucketed join). */
  def crossContamination(
      corpus: DataFrame, probe: DataFrame,
      idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val c = withNorm(graft.queries.Tables.spread(corpus), idCol, vecCol)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("v_c"), col("nrm").as("n_c"))
    val p = withNorm(probe, idCol, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("v_p"), col("nrm").as("n_p"))
    c.join(broadcast(p), col("corpus_id") =!= col("probe_id"))
      .withColumn("cosine",
        round(vec_dot(col("v_c"), col("v_p")) / (col("n_c") * col("n_p")), 4))
      .filter(col("cosine") >= threshold)
      .select("probe_id", "corpus_id", "cosine")
  }

  /** Distributed k-means fit over int8-quantized embeddings — the
    * TRAINING step behind [[ivfTopK]]/[[ivfCosinePairs]]'s coarse
    * quantizer, as a deterministic, oracle-checkable operator.
    *
    * Why it is exactly reproducible (the hard part of distributed
    * k-means — float summation order varies with partitioning):
    *   - vectors are int8-quantized first (v07's per-vector symmetric
    *     scale), so every centroid UPDATE is an INTEGER sum + count:
    *     exact, summation-order-free; the mean is one double division
    *     of exact integers, rounded to 4 decimals;
    *   - assignment distances are rounded to 6 decimals before the
    *     argmin (the FP noise floor is ~1e-10; real distance gaps are
    *     orders above 1e-6), with the centroid id as tie-break, so the
    *     per-row assignment is a deterministic function of (vector,
    *     centroids) regardless of plan shape;
    *   - init is the k smallest ids (no RNG) — k-means++ at scale uses
    *     a seeded hash instead, same plan shape.
    *
    * Scale shape per iteration: one broadcast of the k×dim centroid
    * table (KBs) against the corpus — assignment is MAP-ONLY; the
    * update is one posexplode + map-side-combined (cid, pos) integer
    * agg, shuffling k·dim partial states per partition, not the
    * corpus. The corpus is never collected; the centroid table never
    * exceeds k·dim doubles. Empty clusters drop their row (no
    * re-seeding) — documented contract, matches the SQL oracle's
    * join semantics.
    *
    * Returns one row per surviving cluster: (cid, n_members,
    * centroid_csv) — centroids as DECIMAL(14,4)-formatted CSV (the
    * engine-portable string form; see v07's representation note). */
  def kmeansFitInt8(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 8,
      iters: Int = 2): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    val q = graft.queries.Tables.spread(emb).select(
        col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("max_abs",
        greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-12)))
      .select(col("vec_id"),
        transform(col("v"), x => round(x * (lit(127.0) / col("max_abs")), 0)
          .cast("int")).as("qv"))

    var centroids = q.orderBy("vec_id").limit(k)
      .withColumn("cid",
        row_number().over(Window.orderBy("vec_id")) - 1)
      .select(col("cid"),
        transform(col("qv"), x => x.cast("double")).as("c"))

    // centroids MATERIALIZE between iterations (k·dim doubles — the
    // tiny driver model): without this, iteration i's assignment plan
    // embeds the full lineage of iterations 1..i-1 and recompute
    // doubles per Lloyd step — exponential in `iters`. Collecting the
    // k rows keeps the per-iteration cost at exactly one corpus pass.
    val spark = emb.sparkSession
    def materialize(c: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(c.collect(): _*), c.schema)

    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      val dist = round(aggregate(
        zip_with(col("qv"), col("c"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, e) => acc + e), 6)
      assigned = q.crossJoin(broadcast(centroids))
        .withColumn("dist", dist)
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cid"))).as("m"),
          first("qv").as("qv"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("qv"))
      centroids = materialize(assigned
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(round(sum("x").cast("double") / count(lit(1)), 4).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p("m")).as("c")))
    }
    assigned.groupBy("cid").agg(count(lit(1)).as("n_members"))
      .join(broadcast(centroids.select(col("cid"), array_join(
        transform(col("c"), x => x.cast("decimal(14,4)").cast("string")),
        ",").as("centroid_csv"))), Seq("cid"), "left")
      .orderBy("cid")
  }

  /** Product-quantization ENCODE: each vector splits into `m`
    * contiguous subvectors; each subvector is replaced by the id of
    * its nearest code in that subspace's codebook. A 64-dim float
    * vector (256 B) becomes m small integers (m bytes at k ≤ 256) —
    * the compression that lets a 100-TB embedding corpus keep its
    * whole index in memory, with [[kmeansFitInt8]] as the codebook
    * trainer (run once per subspace over a sample; any codebook table
    * with the same shape drops in).
    *
    * Scale shape: the codebook table (m·k rows of subvector length
    * dim/m — KBs) broadcasts; scoring is map-side; the only shuffle is
    * the per-vector regroup of its m code choices (m rows per vector,
    * map-side-combined min_by). Determinism: per-subspace distances
    * fold sequentially over the subvector (identical both engines) and
    * round to 6 decimals before the (dist, code) argmin — same
    * contract as the k-means fit.
    *
    * @param codebooks (subspace: int, code: int, cvec: array<double>)
    *                  — one row per code per subspace.
    * @return (vec_id, code_csv, recon_err): the m code ids joined
    *         "," in subspace order, and the total squared
    *         reconstruction error (sum of the m chosen distances,
    *         rounded to 4). */
  def pqEncode(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: DataFrame,
      m: Int,
      dim: Int = 64): DataFrame = {
    require(m >= 1 && dim % m == 0, "m must divide dim")
    val subLen = dim / m
    val sub = graft.queries.Tables.spread(emb).select(
        col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(col("vec_id"),
        explode(array((0 until m).map { s =>
          struct(lit(s).as("subspace"),
            slice(col("v"), s * subLen + 1, subLen).as("sv"))
        }: _*)).as("sub"))
      .select(col("vec_id"), col("sub.subspace"), col("sub.sv"))
    val scored = sub.join(broadcast(codebooks), Seq("subspace"))
      .withColumn("dist", round(aggregate(
        zip_with(col("sv"), col("cvec"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, e) => acc + e), 6))
      .groupBy("vec_id", "subspace")
      .agg(min(struct(col("dist"), col("code"))).as("best"))
    // recon_err sums the rounded per-subspace distances as DECIMALs —
    // decimal addition is exact and associative, so the total is
    // independent of aggregation order (a double sum of four rounded
    // values can straddle a 4-decimal rounding boundary differently
    // per engine — observed one-ulp flips at the gate)
    scored.groupBy("vec_id")
      .agg(
        array_sort(collect_list(struct(col("subspace"), col("best"))))
          .as("ps"),
        round(sum(col("best")("dist").cast("decimal(18,6)")), 4)
          .cast("decimal(18,4)").cast("double").as("recon_err"))
      .select(col("vec_id"),
        array_join(transform(col("ps"),
          p => p("best")("code").cast("string")), ",").as("code_csv"),
        col("recon_err"))
  }

  /** PQ asymmetric-distance (ADC) top-k SEARCH — the query half of
    * IVF-PQ: queries stay full-precision, the corpus exists ONLY as
    * [[pqEncode]]'s m code ids per vector, and each query's distance
    * to a vector is the sum of m lookup-table entries
    * `LUT[q][s][code] = ||q_s − codebook[s][code]||²` (Jégou et al.
    * 2011's ADC). This is what makes 100-TB-corpus search feasible:
    * the scan touches m BYTES per corpus vector, never the floats.
    *
    * Scale shape: the LUT is queries × m × k rows (KBs — broadcast);
    * corpus codes explode to m rows per vector, broadcast-join the
    * LUT on (subspace, code), and the per-(query, vector) sum is a
    * map-side-combined keyed agg; the final top-k is a per-query
    * window (rank over each query's scored corpus — at production
    * scale cap candidates first with the IVF cell filter, v05's
    * shape). Determinism: LUT distances round to 6 decimals (the
    * pqEncode contract); the per-pair total sums DECIMALs (exact,
    * order-free) and rounds to 4; rank ties break on (adist, vec_id).
    *
    * @param codes (vec_id, code_csv) — [[pqEncode]] output: the
    *              search reads ONLY this compressed form.
    * @return (query_id, nbr_id, adist, rank) for rank ≤ k. */
  def pqAdcTopK(
      codes: DataFrame,
      codebooks: DataFrame,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      m: Int,
      k: Int,
      dim: Int = 64): DataFrame = {
    require(m >= 1 && dim % m == 0, "m must divide dim")
    val subLen = dim / m
    val qsub = queries.select(
        col(qIdCol).as("query_id"),
        transform(col(qVecCol), x => x.cast("double")).as("qv"))
      .select(col("query_id"),
        explode(array((0 until m).map { s =>
          struct(lit(s).as("subspace"),
            slice(col("qv"), s * subLen + 1, subLen).as("qs"))
        }: _*)).as("sub"))
      .select(col("query_id"), col("sub.subspace"), col("sub.qs"))
    val lut = qsub.join(codebooks, Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code"),
        round(aggregate(
          zip_with(col("qs"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, e) => acc + e), 6).as("d"))
    val corpus = graft.queries.Tables.spread(codes).select(col("vec_id"),
        posexplode(split(col("code_csv"), ","))
          .as(Seq("subspace", "code_s")))
      .select(col("vec_id"), col("subspace"), col("code_s").cast("int").as("code"))
    val scored = corpus.join(broadcast(lut), Seq("subspace", "code"))
      .groupBy("query_id", "vec_id")
      .agg(round(sum(col("d").cast("decimal(18,6)")), 4)
        .cast("decimal(18,4)").cast("double").as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        col("adist"), col("rank"))
  }

  /** 1-bit (sign) binary quantization: dimension j of the embedding
    * contributes bit j%32 of word j/32 when positive — a 64-dim float
    * vector (256 B) becomes two BIGINT words (16 B, bits in two
    * 32-bit halves so neither word's integer value overflows a signed
    * 64-bit lane in ANY engine). Angular distance is then Hamming
    * distance over the words ([[hammingTopK]]) — the coarsest, and at
    * corpus scale often the first, vector-compression tier (1-bit
    * quantization retrieval à la Rademacher/sign-LSH: sign bits of
    * unit vectors preserve angle up to the Hamming/angle identity).
    * Pure map, zero shuffle, exact integer output — fully
    * oracle-checkable. Requires dim ≤ 64 here (two words); widen the
    * word array for larger dims. */
  def binarySignBits(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= 64, "dim must be in [2, 64] (two 32-bit words)")
    import graft.functions.TextFunctions.bound
    def word(v: Column, lo: Int, hi: Int): Column =
      (lo until hi).map { j =>
        when(element_at(v, j + 1) > 0.0, lit(1L << (j - lo))).otherwise(0L)
      }.reduce(_ + _)
    val half = math.min(32, dim)
    graft.queries.Tables.spread(emb).select(
      col(idCol).as("vec_id"),
      bound(transform(col(vecCol), x => x.cast("double"))) { v =>
        struct(word(v, 0, half).as("w0"),
          (if (dim > 32) word(v, 32, dim) else lit(0L)).as("w1"))
      }.as("__w"))
      .select(col("vec_id"), col("__w.w0").as("w0"), col("__w.w1").as("w1"))
  }

  /** Hamming top-k over [[binarySignBits]] words: distance =
    * popcount(w0⊕q0) + popcount(w1⊕q1) — integer-exact, so ranks are
    * deterministic with the (distance, vec_id) tie-break. Scale
    * shape: queries broadcast, the corpus scan reads 16 B per vector
    * (the whole point), one per-query window for the cut. */
  def hammingTopK(
      signs: DataFrame,
      queryIds: DataFrame => DataFrame,
      k: Int): DataFrame = {
    val probes = queryIds(signs).select(
      col("vec_id").as("query_id"), col("w0").as("q0"), col("w1").as("q1"))
    val scored = signs.join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .withColumn("hamming",
        bit_count(col("w0").bitwiseXOR(col("q0"))) +
          bit_count(col("w1").bitwiseXOR(col("q1"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        col("hamming"), col("rank"))
  }

  /** Composed IVF-PQ top-k search — the canonical 100-TB ANN shape in
    * one operator: a coarse quantizer prunes the corpus to the
    * query's nProbe nearest CELLS, then [[pqAdcTopK]]'s
    * asymmetric-distance scoring runs over only those cells' m-byte
    * codes. Corpus cost per query: |corpus|·nProbe/nCells code
    * lookups instead of a full scan — the IVF cut — and the scan
    * still never touches the stored floats.
    *
    * Determinism contract (what makes the WHOLE composition
    * oracle-checkable): cell assignment + probe selection use
    * 6-decimal-rounded distances with id tie-breaks (v13's argmin
    * rule), and the ADC stage inherits v14/v17's rounded-LUT +
    * exact-DECIMAL-sum contract. Both stages' models (centroids,
    * codebooks) are tiny broadcast tables.
    *
    * @param centroids (cid, cvec array<double>) — coarse cells, e.g.
    *                  [[kmeansFitInt8]] output re-parsed, or any
    *                  deterministic table of cell centers.
    * @param codes     (vec_id, cid, code_csv) — [[pqEncode]] output
    *                  pre-joined with each vector's cell id.
    * @return (query_id, nbr_id, adist, rank) for rank ≤ k within the
    *         probed cells. */
  def ivfPqTopK(
      codes: DataFrame,
      codebooks: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      m: Int,
      k: Int,
      nProbe: Int,
      dim: Int = 64): DataFrame = {
    require(nProbe >= 1, "nProbe must be positive")
    val q = queries.select(
      col(qIdCol).as("query_id"),
      transform(col(qVecCol), x => x.cast("double")).as("qv"))
    // probe selection: nProbe nearest cells per query (rounded-argmin
    // rule); centroid table is KBs — broadcast, map-only scoring
    val cellDist = round(aggregate(
      zip_with(col("qv"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, e) => acc + e), 6)
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdist").asc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", cellDist)
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))
    // LUT per (query, subspace, code) — v17's shape
    val subLen = dim / m
    val qsub = probes.select(col("query_id"), col("cid"),
        explode(array((0 until m).map { s =>
          struct(lit(s).as("subspace"),
            slice(col("qv"), s * subLen + 1, subLen).as("qs"))
        }: _*)).as("sub"))
      .select(col("query_id"), col("cid"), col("sub.subspace"), col("sub.qs"))
    val lut = qsub.join(codebooks, Seq("subspace"))
      .select(col("query_id"), col("cid"), col("subspace"), col("code"),
        round(aggregate(
          zip_with(col("qs"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, e) => acc + e), 6).as("d"))
    // ADC over ONLY the probed cells: the (cid) equi-join key is what
    // prunes the corpus before any scoring happens
    val corpus = graft.queries.Tables.spread(codes).select(
        col("vec_id"), col("cid"),
        posexplode(split(col("code_csv"), ","))
          .as(Seq("subspace", "code_s")))
      .select(col("vec_id"), col("cid"), col("subspace"),
        col("code_s").cast("int").as("code"))
    val scored = corpus.join(broadcast(lut), Seq("cid", "subspace", "code"))
      .groupBy("query_id", "vec_id")
      .agg(round(sum(col("d").cast("decimal(18,6)")), 4)
        .cast("decimal(18,4)").cast("double").as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        col("adist"), col("rank"))
  }

  /** ANN index-quality report: recall@k of an approximate result
    * against a reference top-k, per query — the measurement loop that
    * decides nProbe/band/bit budgets BEFORE a 100-TB index build.
    * Both inputs are (query_id, nbr_id) sets; output is (query_id,
    * n_hit, recall). One equi-join keyed on (query_id, nbr_id) + one
    * tiny agg — queries with zero hits are kept via the reference's
    * query spine (an inner-join-only report silently drops the worst
    * queries, the exact rows a recall audit exists to surface). */
  def annRecall(ann: DataFrame, ref: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val hits = ann.select("query_id", "nbr_id")
      .join(ref.select("query_id", "nbr_id"), Seq("query_id", "nbr_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    ref.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hit"))
      .withColumn("recall", round(col("n_hit") / k.toDouble, 4))
  }

  /** The sign matrix for [[randomProjection]]: entry (i, j) is ±1 by
    * the parity of the first hex digit of md5("i_j") — a seed-free,
    * ENGINE-PORTABLE derivation (any SQL engine reproduces it from
    * md5 alone), which is what lets the whole projection be
    * oracle-checked. Dense ±1 (Achlioptas 2001) preserves pairwise
    * distances within (1±ε) like Gaussian JL projections. */
  private[graft] def signMatrix(dimIn: Int, dimOut: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dimOut, dimIn) { (j, i) =>
      val h = md.digest(s"${i}_${j}".getBytes("UTF-8"))
      val firstHexDigit = (h(0) >> 4) & 0xF
      if (firstHexDigit % 2 == 0) 1.0 else -1.0
    }
  }

  /** Matryoshka-style prefix truncation: keep the first `dimOut`
    * coordinates and L2-renormalize — the zero-compute reduction for
    * embeddings trained with matryoshka representation learning
    * (nested prefixes are themselves valid embeddings). Pure map,
    * zero shuffle; cosine over the truncated vectors needs no norm
    * correction because the output is unit-length. Rows whose prefix
    * is the zero vector yield a null projection (no direction to
    * keep — same contract as [[withNorm]]'s null norm). Ordered-fold
    * norm arithmetic, rounded DECIMAL CSV output (the v13–v15
    * determinism/representation contract). */
  def truncateRenorm(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dimOut: Int): DataFrame = {
    require(dimOut >= 1, "dimOut must be positive")
    import graft.functions.TextFunctions.bound
    val out = bound(slice(transform(col(vecCol), x => x.cast("double")),
        1, dimOut)) { p =>
      bound(aggregate(p, lit(0.0), (acc, x) => acc + x * x)) { n2 =>
        when(n2 > 0.0, struct(
          round(sqrt(n2), 4).cast("decimal(12,4)").cast("double").as("prefix_norm"),
          array_join(transform(p, x =>
            round(x / sqrt(n2), 4).cast("decimal(12,4)").cast("string")),
            ",").as("unit_csv")))
      }
    }
    // struct evaluated ONCE in its own projection (lambda trees skip
    // CSE — the t40/t41 lesson), fields extracted downstream
    graft.queries.Tables.spread(emb)
      .select(col(idCol).as("vec_id"), out.as("__t"))
      .select(col("vec_id"),
        col("__t.prefix_norm").as("prefix_norm"),
        col("__t.unit_csv").as("unit_csv"))
  }

  /** Per-dimension percentile-calibrated scalar quantization (the
    * FAISS `ScalarQuantizer` QT_8bit discipline): ONE corpus pass
    * learns each dimension's [p_lo, p_hi] envelope (exact
    * percentiles), then every coordinate maps to
    * `clamp(round((x−lo)/(hi−lo)·255), 0, 255)` — 1 byte/dim, 4×
    * smaller than float32, robust to the per-dim outliers that blow
    * up [[binarySignBits]]-style global scaling. Contrast with v07's
    * per-VECTOR max-abs scale: calibration here is a per-CORPUS
    * model, so codes are comparable ACROSS vectors (the property ADC
    * scoring needs) and a single wild coordinate saturates instead of
    * crushing the whole vector's resolution.
    *
    * Scale shape: the calibration aggregate is 64 tiny groups
    * (posexplode → per-dim percentile — at 100 TB swap the exact
    * percentile for t78's median/MAD or q68's histogram sketch, same
    * plan shape); the calibrated bounds ride as ONE broadcast row and
    * encoding is pure map. Determinism: bounds round to 6 decimals
    * BEFORE encoding on both engines, so the quantization grid —
    * not just the emitted bounds — is cross-engine exact; the
    * remaining arithmetic is reproducible IEEE ops (÷, ×, round-half-
    * away on non-negative values). */
  def sq8Calibrated(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      pLo: Double = 0.01,
      pHi: Double = 0.99): DataFrame = {
    require(dim >= 1 && pLo >= 0 && pHi <= 1 && pLo < pHi,
      "sq8Calibrated: need 0 <= pLo < pHi <= 1")
    val e = graft.queries.Tables.spread(emb).select(
      col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val cal = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(round(expr(s"percentile(x, $pLo)"), 6).as("lo"),
        round(expr(s"percentile(x, $pHi)"), 6).as("hi"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("lo")))),
          s => s("lo")).as("los"),
        transform(array_sort(collect_list(struct(col("pos"), col("hi")))),
          s => s("hi")).as("his"))
    import graft.functions.TextFunctions.bound
    e.crossJoin(broadcast(cal))
      .select(col("vec_id"),
        bound(transform(col("v"), (x, i) =>
          bound(element_at(col("los"), i + 1)) { lo =>
            bound(greatest(element_at(col("his"), i + 1) - lo, lit(1e-9))) {
              w =>
                least(greatest(round((x - lo) / w * 255.0, 0), lit(0.0)),
                  lit(255.0)).cast("int")
            }
          })) { codes =>
          struct(
            array_join(codes, ",").as("code_csv"),
            round(aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
              (acc, ix) => {
                val lo = element_at(col("los"), ix + 1)
                val w = greatest(element_at(col("his"), ix + 1) - lo,
                  lit(1e-9))
                val rec = lo + element_at(codes, ix + 1).cast("double") /
                  255.0 * w
                acc + (rec - element_at(col("v"), ix + 1)) *
                  (rec - element_at(col("v"), ix + 1))
              }), 6).as("recon_err"))
        }.as("__t"))
      .select(col("vec_id"), col("__t.code_csv").as("code_csv"),
        col("__t.recon_err").as("recon_err"))
  }

  /** IVF + per-dimension SQ8 search (FAISS `IndexIVFScalarQuantizer`):
    * the corpus is stored as ONE BYTE per dimension ([[sq8Calibrated]]'s
    * corpus-calibrated codes) bucketed by coarse cell; a query probes
    * `nProbe` cells and scores candidates by asymmetric distance to
    * the DECODED codes — full-precision query, compressed corpus.
    * Completes the quantized-ANN ladder: PQ-ADC (v17/v19, 4 bits/dim
    * here) ≺ SQ8 (8 bits/dim, no codebook training, better recall) ≺
    * int8-sym (v12) ≺ float (v03/v05).
    *
    * Scale shape: cells prune the corpus BEFORE any scoring (equi-join
    * on cid); the calibration row and centroid table broadcast; the
    * scan reads 64 B/vector. Determinism: the v33 rounded-envelope
    * grid, rounded cell distances with cid tie-break, ADC folds in
    * ascending dim order, ranks tie on vec_id. Seeds = the nSeeds
    * smallest-id vectors (the v14 deterministic-codebook convention)
    * so the WHOLE index build is oracle-replayable; swap kmeans
    * centroids (v13) in production. */
  def ivfSq8TopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nSeeds: Int,
      k: Int,
      nProbe: Int): DataFrame = {
    require(nSeeds >= 1 && k >= 1 && nProbe >= 1 && nProbe <= nSeeds)
    import graft.functions.TextFunctions.bound
    val e = graft.queries.Tables.spread(emb).select(
      col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val w0 = Window.orderBy("vec_id")
    val cents = e.orderBy("vec_id").limit(nSeeds)
      .withColumn("cid", row_number().over(w0) - 1)
      .select(col("cid"), col("v").as("cvec"))
    def sqDist(a: Column, b: Column): Column =
      round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t), 6)
    def nearestCells(df: DataFrame, idName: String, keep: Int) = {
      val w = Window.partitionBy(idName)
        .orderBy(col("cdist").asc, col("cid").asc)
      df.crossJoin(broadcast(cents))
        .withColumn("cdist", sqDist(col("v"), col("cvec")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cvec", "cdist", "crank")
    }
    // calibration (v33's rounded envelope) + codes, bucketed by cell
    val cal = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(round(expr("percentile(x, 0.01)"), 6).as("lo"),
        round(expr("percentile(x, 0.99)"), 6).as("hi"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("lo")))),
          s => s("lo")).as("los"),
        transform(array_sort(collect_list(struct(col("pos"), col("hi")))),
          s => s("hi")).as("his"))
    val codes = nearestCells(e, "vec_id", 1)
      .crossJoin(broadcast(cal))
      .select(col("vec_id"), col("cid"),
        transform(col("v"), (x, i) =>
          bound(element_at(col("los"), i + 1)) { lo =>
            bound(greatest(element_at(col("his"), i + 1) - lo, lit(1e-9))) {
              wd =>
                least(greatest(round((x - lo) / wd * 255.0, 0), lit(0.0)),
                  lit(255.0)).cast("int")
            }
          }).as("cds"))
    val probes = nearestCells(
      queries.select(col(idCol).cast("long").as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("v")),
      "query_id", nProbe)
      .select(col("query_id"), col("v").as("qv"), col("cid"))
    val adist = round(aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
      (acc, ix) => {
        val lo = element_at(col("los"), ix + 1)
        val wd = greatest(element_at(col("his"), ix + 1) - lo, lit(1e-9))
        val rec = lo + element_at(col("cds"), ix + 1).cast("double") /
          255.0 * wd
        val d = element_at(col("qv"), ix + 1) - rec
        acc + d * d
      }), 6)
    val wR = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vec_id").asc)
    probes.join(codes, Seq("cid"))
      .crossJoin(broadcast(cal))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        col("adist"), col("rank"))
  }

  /** Unit-normalized sub-vector facets of each embedding — the
    * shared split for the max-sim family. */
  private def unitFacets(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, dim: Int, nSub: Int): DataFrame = {
    import graft.functions.TextFunctions.bound
    val subLen = dim / nSub
    df.select(col(idCol).cast("long").as(idAs),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(col(idAs), explode(array((0 until nSub).map { s =>
        struct(lit(s).as("si"),
          slice(col("v"), s * subLen + 1, subLen).as("sv"))
      }: _*)).as("s"))
      .select(col(idAs), col("s.si").as("si"),
        bound(col("s.sv")) { sv =>
          bound(sqrt(aggregate(sv, lit(0.0), (a, x) => a + x * x))) { n =>
            when(n > 0.0, transform(sv, x => x / n))
              .otherwise(transform(sv, x => lit(0.0)))
          }
        }.as("u"))
  }

  /** Max-sim scoring restricted to a CANDIDATE pair set — the
    * two-stage production shape: a cheap first stage (v34's IVF-SQ8,
    * v05's IVF, …) shortlists, late interaction re-ranks ONLY the
    * shortlist. Join volume is |candidates|·nSub², independent of
    * corpus size. */
  def maxSimRerank(
      emb: DataFrame,
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nSub: Int,
      k: Int): DataFrame = {
    require(nSub >= 1 && dim % nSub == 0, "nSub must divide dim")
    val cand = candidates.select(col("query_id"), col("nbr_id"))
    val dSubs = unitFacets(emb, idCol, vecCol, "vec_id", dim, nSub)
      .join(cand.select(col("nbr_id").as("vec_id")).distinct(), Seq("vec_id"))
    val qSubs = unitFacets(queries, idCol, vecCol, "query_id", dim, nSub)
      .withColumnRenamed("si", "qsi").withColumnRenamed("u", "qu")
    val pairSubs = broadcast(cand)
      .join(dSubs, cand("nbr_id") === dSubs("vec_id"))
      .join(broadcast(qSubs), Seq("query_id"))
    val best = pairSubs
      .select(col("query_id"), col("vec_id"), col("qsi"),
        aggregate(zip_with(col("qu"), col("u"), (a, b) => a * b),
          lit(0.0), (acc, t) => acc + t).as("dot"))
      .groupBy("query_id", "vec_id", "qsi")
      .agg(max("dot").as("m"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("maxsim").desc, col("vec_id").asc)
    best.groupBy("query_id", "vec_id")
      .agg(round(aggregate(
        sort_array(collect_list(struct(col("qsi"), col("m")))),
        lit(0.0), (acc, e) => acc + e("m")), 6).as("maxsim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("nbr_id"),
        col("maxsim"))
  }

  /** Late-interaction (ColBERT-style) max-sim retrieval: documents
    * and queries are BAGS of unit sub-vectors (here `nSub` slices of
    * the embedding — production feeds per-token vectors), and
    * score(q, d) = Σ_{qs∈q} max_{ds∈d} ⟨qs, ds⟩ — each query facet
    * matches its best document facet INDEPENDENTLY, which is what
    * single-vector cosine (v03) structurally cannot express (one
    * facet's match doesn't have to share a direction with another's).
    *
    * Scale shape: query sub-vectors broadcast; the corpus scan is
    * |corpus|·nSub² dot products — brute-force tier; the production
    * path prunes candidates with v05/v34 on the pooled vector first
    * and max-sims only the shortlist (the standard ColBERT re-rank).
    * Determinism: unit-normalize guards zero norms, per-(query, doc)
    * facet maxima fold in ascending facet order, round 6, rank ties
    * on vec_id. */
  def maxSimTopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nSub: Int,
      k: Int): DataFrame = {
    require(nSub >= 1 && dim % nSub == 0, "nSub must divide dim")
    val dSubs = unitFacets(graft.queries.Tables.spread(emb),
      idCol, vecCol, "vec_id", dim, nSub)
    val qSubs = unitFacets(queries, idCol, vecCol, "query_id", dim, nSub)
      .withColumnRenamed("si", "qsi").withColumnRenamed("u", "qu")
    val dots = dSubs.crossJoin(broadcast(qSubs))
      .select(col("query_id"), col("vec_id"), col("qsi"),
        aggregate(zip_with(col("qu"), col("u"), (a, b) => a * b),
          lit(0.0), (acc, t) => acc + t).as("dot"))
    val best = dots.groupBy("query_id", "vec_id", "qsi")
      .agg(max("dot").as("m"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("maxsim").desc, col("vec_id").asc)
    best.groupBy("query_id", "vec_id")
      .agg(round(aggregate(
        sort_array(collect_list(struct(col("qsi"), col("m")))),
        lit(0.0), (acc, e) => acc + e("m")), 6).as("maxsim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("nbr_id"),
        col("maxsim"))
  }

  /** Johnson–Lindenstrauss random projection: dense ±1 sign matrix,
    * `y_j = Σ_i r(i,j)·x_i / √dimOut`. The dimensionality-reduction
    * pre-pass that makes downstream ANN/dedup cheaper (a 64-dim float
    * vector becomes dimOut dims with pairwise distances preserved to
    * (1±ε), ε ~ √(ln n / dimOut)).
    *
    * Scale shape: the projection matrix is a LITERAL in the plan
    * (dimOut×dimIn doubles — KBs; at production dims, broadcast it) —
    * the operator is pure map, zero shuffle, and each output
    * coordinate folds the input in ascending-index order so the
    * double arithmetic is reproducible bit-for-bit across engines
    * (the v13/v14 determinism contract). Output coordinates round to
    * 4 decimals and serialize as a DECIMAL CSV (v07's sortable
    * representation). */
  def randomProjection(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dimIn: Int,
      dimOut: Int): DataFrame = {
    require(dimIn >= 1 && dimOut >= 1, "dims must be positive")
    val flat = signMatrix(dimIn, dimOut).flatten
    val rLit = typedLit(flat.toSeq)
    val scale = math.sqrt(dimOut.toDouble)
    import graft.functions.TextFunctions.bound
    val proj = bound(transform(col(vecCol), x => x.cast("double"))) { v =>
      transform(sequence(lit(0), lit(dimOut - 1)), j =>
        round(aggregate(
          sequence(lit(0), lit(dimIn - 1)), lit(0.0),
          (acc, i) => acc +
            element_at(rLit, j * dimIn + i + 1) * element_at(v, i + 1)) /
          scale, 4).cast("decimal(12,4)").cast("string"))
    }
    graft.queries.Tables.spread(emb).select(
      col(idCol).as("vec_id"),
      array_join(proj, ",").as("proj_csv"))
  }

  /** Asymmetric binary search: FULL-PRECISION queries score a corpus
    * stored ONLY as [[binarySignBits]]'s two BIGINT words (16 B per
    * vector) — `score = Σ_j q_j · sign_j`, the asymmetric analogue of
    * [[hammingTopK]] (Gordo et al. 2014's asymmetric distances for
    * binary codes): keeping the query un-quantized recovers most of
    * the recall sym-Hamming loses, at the same corpus footprint.
    *
    * Scale shape: queries broadcast; the corpus scan reads two longs
    * per vector and the score is one codegen'd 64-step fold — a
    * brute-force tier over the COMPRESSED corpus (the banded variant
    * for planet-scale is [[graft.operators.Multimodal.imageNearDupPairs]]'s
    * blocking applied to these words). Determinism: the fold walks
    * dimensions in ascending order, rounds to 6; rank ties break on
    * (score DESC, vec_id).
    *
    * @param signs (vec_id, w0, w1) from [[binarySignBits]]
    * @param queries (query_id, qv: array<double>)
    * @return (query_id, nbr_id, score, rank) for rank ≤ k. */
  def asymmetricBinaryTopK(
      signs: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    val scored = graft.queries.Tables.spread(signs)
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(expr(
        """aggregate(sequence(0, 63), CAST(0 AS DOUBLE),
           (acc, j) -> acc + element_at(qv, j + 1) *
             CASE WHEN (CASE WHEN j < 32 THEN shiftright(w0, j)
               ELSE shiftright(w1, j - 32) END) % 2 = 1
               THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"""),
        6) + lit(0.0))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        col("score"), col("rank"))
  }

  /** Greedy k-center (farthest-first traversal) coreset selection —
    * the deterministic diversity-sampling pass for embedding-space
    * data curation (Sener & Savarese 2018's core-set approach,
    * arXiv:1708.00489): seed with the smallest id, then repeatedly
    * pick the point FARTHEST from everything selected so far. The
    * selection 2-approximates the optimal k-center cover, and unlike
    * k-means++ it needs no RNG — (rounded distance, id) argmax is a
    * total order, so the whole traversal unrolls in a SQL oracle.
    *
    * Scale shape: the selected set is a k×dim driver-side model (the
    * IVF-centroid pattern) embedded as plan literals, so each of the
    * k−1 iterations is ONE map-only corpus scan + a 1-row TakeOrdered
    * — no shuffle, no cross join, nothing corpus-sized ever sorts.
    * (At production scale, cache the projected corpus once;
    * k scans of a cached 2-column projection, k small.)
    *
    * Determinism: per-candidate distances fold the dimension in
    * ascending order, round to 6, and the running min applies `least`
    * per step — identical arithmetic to the DuckDB unroll.
    *
    * @return one row per selected point: (step, vec_id, min_dist) —
    *         min_dist is the selection-time distance² to the nearest
    *         earlier pick (null for the step-0 seed). */
  def kcenterSelect(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = graft.queries.Tables.spread(emb).select(
      col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val seed = corpus.orderBy("vec_id").limit(1).head()
    var selected = Vector(
      (seed.getLong(0), seed.getSeq[Double](1).toArray, Option.empty[Double]))
    for (_ <- 1 until k) {
      val minDist = selected.map { case (_, sv, _) =>
        val svLit = typedLit(sv.toSeq)
        round(aggregate(
          zip_with(col("v"), svLit, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, e) => acc + e), 6)
      }.reduce(least(_, _))
      val next = corpus.withColumn("mind", minDist)
        .orderBy(col("mind").desc, col("vec_id").asc).limit(1).head()
      selected = selected :+
        ((next.getLong(0), next.getSeq[Double](1).toArray,
          Some(next.getDouble(2))))
    }
    selected.zipWithIndex
      .map { case ((id, _, mind), i) => (i, id, mind) }
      .toDF("step", "vec_id", "min_dist")
  }

  /** PQ-shortlist + exact re-rank — THE production ANN serving shape
    * (Jégou et al. 2011 §V): [[pqAdcTopK]] scans the corpus as m-byte
    * codes to produce a `kShort` shortlist per query, then ONLY those
    * candidates' full vectors are fetched (keyed join — candidate
    * rows, not corpus rows) and re-scored exactly. Compression error
    * affects WHICH kShort candidates surface, never the final order —
    * the rank the user sees is true distance.
    *
    * Scale shape: the expensive full-precision corpus is touched by a
    * candidates-only keyed join (queries·kShort rows); queries
    * broadcast; the re-rank window partitions per query over kShort
    * rows. Determinism: exact distances fold in dimension order,
    * round to 6; rank ties break on (dist, vec_id).
    *
    * @return (query_id, nbr_id, dist, rank) for rank ≤ k. */
  def pqRerankTopK(
      codes: DataFrame,
      codebooks: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      kShort: Int,
      k: Int,
      dim: Int = 64): DataFrame = {
    val short = pqAdcTopK(codes, codebooks, queries, idCol, vecCol,
      m = m, k = kShort, dim = dim)
    val cor = corpus.select(col(idCol).as("nbr_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("nbr_id").asc)
    short.select("query_id", "nbr_id")
      .join(cor, "nbr_id")
      .join(broadcast(qv), "query_id")
      .withColumn("dist", round(aggregate(
        zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, e) => acc + e), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("dist"), col("rank"))
  }

  /** PageRank centrality over the exact-cosine kNN graph — the
    * graph-based data-selection signal (a document whose neighbors are
    * themselves well-connected is "central" to a semantic region;
    * low-centrality outliers and isolated near-duplicate clusters
    * score low). Directed edges: each node → its k nearest neighbors;
    * out-degree is uniformly k, so the damped update is
    * pr' = (1-d) + d/k · Σ_in pr(u) (unnormalized 1-based PageRank).
    *
    * Determinism contract: every per-node in-neighbor sum folds over
    * the contribution list SORTED BY SOURCE ID (sort_array +
    * `aggregate`), so double addition order is fixed and the oracle's
    * `list(... ORDER BY src)` fold is bit-identical — the v29/v15
    * ascending-index rule applied to graph aggregation. Constants are
    * computed, not literal: d/k and 1-d evaluate in IEEE double on
    * both engines.
    *
    * Scale shape: the kNN build here is the exact [[bruteForceTopK]]
    * (auditing baseline — the corpus×corpus scored join); at 100 TB
    * swap it for [[ivfTopK]]'s pruned build — the PageRank loop
    * itself is iters keyed shuffles over an O(n·k) edge list with
    * map-side-combinable partial folds, the canonical distributed
    * power iteration. */
  def knnPagerank(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, iters: Int = 3, d: Double = 0.85): DataFrame = {
    val base = emb.select(col(idCol), col(vecCol))
    // The O(n·k) edge list feeds EVERY iteration; without
    // materialization each one lazily re-runs the kNN build (the
    // corpus-sized scored join — by far the dominant stage), tripling
    // the whole job. An EAGER localCheckpoint (disk-backed, lineage
    // truncated) runs the build exactly once — even across repeated
    // evaluations of the returned plan — and its blocks are released
    // by the ContextCleaner when the plan is garbage-collected, so
    // repeated calls cannot accumulate cache entries the way an
    // explicit persist() with no unpersist() would (a real leak this
    // code shipped with first).
    val edges = bruteForceTopK(base, base, idCol, vecCol, k)
      .select(col("query_id").as("src"), col("nbr_id").as("dst"))
      .localCheckpoint(true)
    val nodes = base.select(col(idCol).as("id"))
    val w = d / k     // both engines evaluate this division in double
    var pr = nodes.withColumn("pr", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = edges.join(pr, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("src"), col("pr")))),
          lit(0.0),
          (acc, x) => acc + x.getField("pr") * lit(w)).as("s"))
      pr = nodes.join(contribs, col("id") === col("dst"), "left")
        .select(col("id"), (lit(1 - d) + coalesce(col("s"), lit(0.0))).as("pr"))
    }
    pr.select(col("id").as(idCol), round(col("pr"), 6).as("pagerank"))
  }

  /** Cluster-balanced diversity downsampling — the DCLM/SemDeDup-family
    * curation move that a plain uniform sample gets wrong: assign every
    * vector to its nearest coarse cell, then keep a PER-CELL quota
    * (`max(1, cell_n / denom)`) so dense regions are thinned hard while
    * sparse regions survive intact (a uniform sample reproduces the
    * density skew; this flattens it toward semantic coverage).
    *
    * Determinism/oracle contract: centroids are the engine-portable
    * (md5(id), id)-smallest sample (the [[ivfTopK]] rule), cell
    * similarities round to 6 decimals before argmax with ties on cell
    * index, the within-cell keep order is (md5(id), id), and the quota
    * is integer division — every stage replays exactly in SQL.
    *
    * Scale shape: assignment is map-only (centroids are an nCells·dim
    * driver model folded into the plan as literals); the only shuffle
    * is ONE hash partition by cell carrying (id, cell) — 16 bytes per
    * row, never the vectors — for the per-cell window. Cell population
    * n/nCells bounds the window partition; grow nCells with the corpus
    * (the [[ivfCosinePairs]] sizing rule) to keep it constant.
    *
    * @return (id, cell, cell_n, pick) for the kept rows only —
    *         pick ∈ [1, quota] is the deterministic keep rank. */
  def clusterBalancedSample(
      emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, denom: Int = 5): DataFrame = {
    require(nCells >= 1 && denom >= 1, "nCells and denom must be positive")
    val centroids: Array[(Int, Array[Float])] = emb
      .select(col(idCol), col(vecCol))
      .withColumn("h", md5(col(idCol).cast("string")))
      .orderBy(col("h"), col(idCol))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
    def cellSims(v: org.apache.spark.sql.Column) = array(centroids.map {
      case (_, c) =>
        val cl = array(c.map(x => lit(x)).toSeq: _*)
        round(vec_dot(v, cl) / sqrt(lit(c.map(x => x.toDouble * x).sum)), 6)
    }.toSeq: _*)
    val assigned = graft.queries.Tables.spread(emb)
      .withColumn("sims", cellSims(col(vecCol)))
      .withColumn("cell",
        (expr("array_position(sims, array_max(sims))") - 1).cast("long"))
      .select(col(idCol), col("cell"))
    val w = Window.partitionBy("cell")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    assigned
      .withColumn("pick", row_number().over(w).cast("long"))
      .withColumn("cell_n", count(lit(1)).over(Window.partitionBy("cell")))
      // `div`, not `/`: Spark's `/` is double division even on longs;
      // the quota must be the exact integer DuckDB's `//` computes
      .filter(col("pick") <= greatest(lit(1L), expr(s"cell_n div $denom")))
      .select(col(idCol), col("cell"), col("cell_n"), col("pick"))
  }
}
