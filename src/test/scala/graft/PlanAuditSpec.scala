package graft

import graft.queries.Registry
import graft.tools.PlanAudit

/** The fleet-wide plan audit as a BUILD GATE: every registry query's
  * optimized physical plan is checked for the two shapes that do not
  * survive a 100× scale-up. `tools/PlanAudit` caught v32's
  * un-broadcast pairwise centroid join in round 6, but only ran when
  * invoked by hand — this spec makes a plan regression fail
  * `sbt test`. Planning-only (nothing executes beyond the bounded
  * driver models some operators fit at construction: centroid
  * collects, metadata-answerable sizing counts), so the sweep stays
  * cheap at sf0.001. */
class PlanAuditSpec extends SparkTestBase {

  // BNLJ survivors: broadcast side is a bounded model or probe set
  // (centroids, query batches, literal dims) — each a conscious,
  // reviewed decision with rationale in SCALE.md. A NEW name landing
  // here must be reviewed the same way, so the list is pinned.
  private val reviewedBnlj = Set(
    "m04_media_feature_topk", "q10_range_join_buckets",
    "q22_exists_antijoin", "q34_levenshtein_nearest",
    "q47_zorder_layout", "q48_funnel_stages", "q67_scd2_point_in_time",
    "q79_fk_integrity_audit", "q84_market_basket",
    "q85_erasure_propagation", "q92_conversion_window_funnel",
    "t100_domain_quality_shrinkage", "t103_shard_balance",
    "t104_reliability_diagram", "t12_boilerplate_strip",
    "t24_unigram_surprisal", "t33_pmi_collocations",
    "t35_temperature_mixture", "t43_tfidf_keywords",
    "t45_domain_reputation_filter", "t48_bpe_merges",
    "t50_dsir_importance", "t52_bm25_topk",
    "t55_trigram_backoff_surprisal", "t56_quantile_normalize",
    "t64_bpe_apply_encode", "t66_source_kl_divergence",
    "t67_heaps_law_fit", "t72_corpus_data_card", "t73_hybrid_rrf_fusion",
    "t86_rocchio_prf", "t91_curation_funnel", "t99_kneser_ney_surprisal",
    "v02_cosine_dup_pairs", "v03_ann_topk_bruteforce",
    "v11_semantic_contamination", "v12_ann_topk_int8",
    "v13_kmeans_int8", "v18_hamming_topk_1bit", "v19_ivf_pq_topk",
    "v20_ann_recall_report", "v22_hard_negatives", "v23_mmr_diversify",
    "v24_top_principal_component", "v27_asymmetric_binary_topk",
    "v28_abtt_whiten", "v32_source_centroid_drift", "v33_sq8_calibrated",
    "v34_ivf_sq8_topk", "v35_maxsim_topk", "v36_two_stage_retrieval")

  // Partition-less WindowExec survivors ("Moving all data to a single
  // partition"): acceptable ONLY when the window input is provably
  // bounded — a LIMIT-k seed/codebook table, a fixed bucket/stage
  // spine, or a documented exact-audit tier whose scale path is a
  // different registry entry. Reviewed 2026-08-15 (rationale rows in
  // SCALE.md "Partition-less window inventory"):
  //  - q31_ntile_quartiles: exact NTILE needs a total order by
  //    definition; documented audit tier (scale path = q25's
  //    approx-percentile family, no global sort).
  //  - q84_market_basket: final top-20 rank over the brand-pair
  //    AGGREGATE (|brands|² rows max, cab>=20 filtered), not baskets.
  //  - t48_bpe_merges: row_number over an already-LIMIT(10) set.
  //  - t56_quantile_normalize: documented exact-audit global rank
  //    (scale path = rank-free quantile mapping via percent_rank per
  //    source + approx target quantiles).
  //  - t58_zipf_fit: rank over the LIMIT(1000) head of the vocab.
  //  - t67_heaps_law_fit: running sums over the 10-row bucket fold.
  //  - t91_curation_funnel: running sum over the 4-row stage spine.
  //  - v14/v17/v19/v26/v34/v36: row_number over LIMIT(k) codebook /
  //    centroid seed tables (k·dim driver models, corpus-independent).
  private val reviewedGlobalWindows = Set(
    "q31_ntile_quartiles", "q84_market_basket", "t48_bpe_merges",
    "t56_quantile_normalize", "t58_zipf_fit", "t67_heaps_law_fit",
    "t91_curation_funnel", "v14_pq_encode", "v17_pq_adc_topk",
    "v19_ivf_pq_topk", "v26_pq_rerank_topk", "v34_ivf_sq8_topk",
    "v36_two_stage_retrieval")

  test("no registry plan contains a CartesianProduct; BNLJ set is the reviewed one") {
    val audit = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(audit.failed.isEmpty,
      s"queries failed to plan:\n  ${audit.failed.sorted.mkString("\n  ")}")
    assert(audit.cartesians.isEmpty,
      s"CartesianProduct (un-broadcast all-pairs join — never acceptable) " +
        s"in: ${audit.cartesians.sorted.mkString(", ")}")
    val unreviewed = audit.bnlj.toSet -- reviewedBnlj
    val gone = reviewedBnlj -- audit.bnlj.toSet
    assert(unreviewed.isEmpty,
      s"NEW BroadcastNestedLoopJoin in ${unreviewed.toSeq.sorted.mkString(", ")} — " +
        "verify the broadcast side is a bounded model/probe set, record the " +
        "rationale in SCALE.md, then add the name to reviewedBnlj")
    assert(gone.isEmpty,
      s"stale reviewedBnlj entries (plan no longer has BNLJ — remove them): " +
        gone.toSeq.sorted.mkString(", "))
    val newGw = audit.globalWindows.toSet -- reviewedGlobalWindows
    val goneGw = reviewedGlobalWindows -- audit.globalWindows.toSet
    assert(newGw.isEmpty,
      s"NEW partition-less WindowExec in ${newGw.toSeq.sorted.mkString(", ")} — " +
        "a global window sorts ALL rows onto one task. Verify the window " +
        "input is bounded (LIMIT-k model table / fixed spine) or rewrite " +
        "via Ranking.globalRank, record the rationale in SCALE.md, then " +
        "add the name to reviewedGlobalWindows")
    assert(goneGw.isEmpty,
      s"stale reviewedGlobalWindows entries (plan no longer has a global " +
        s"window — remove them): ${goneGw.toSeq.sorted.mkString(", ")}")
  }
}
