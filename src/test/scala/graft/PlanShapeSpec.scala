package graft

import graft.queries.Registry

/** Physical-plan-shape regressions: the scale properties of the
  * headline operators are design commitments, not accidents of the
  * current optimizer mood. Each assertion here encodes a "would this
  * survive 100×?" decision documented in the operator's Scaladoc. */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).run(spark, dir).queryExecution.executedPlan.toString

  test("q03 dim joins broadcast (no sort-merge shuffle of the fact side)") {
    val p = plan("q03_join_agg_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q02 filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThan(value,300.0") || p.contains("GreaterThan(value, 300.0")))
  }

  test("q17 as-of join is join-free (union + window, one keyed shuffle)") {
    val p = plan("q17_asof_join")
    assert(!p.contains("Join"), s"as-of rewrite must not produce a join:\n$p")
    assert(p.contains("Window"))
  }

  test("t07/t08 dedup plans have no cartesian/nested-loop joins") {
    Seq("t07_dedup_ngram_jaccard", "t08_dedup_minhash_lsh").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
    }
  }

  test("q05 top-k is TakeOrderedAndProject (no global sort)") {
    val p = plan("q05_topk_customers")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("v05 IVF probes join hash-partitioned by cell, queries broadcast") {
    val p = plan("v05_ann_topk_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t13 PII redaction is map-only (zero shuffles beyond the final sort)") {
    val p = plan("t13_pii_redaction")
    // allowed exchanges: the ORDER BY rangepartitioning and the
    // test-env Tables.spread round-robin; redaction itself must not
    // introduce a keyed shuffle or a join
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"), s"redaction must not shuffle by key:\n$p")
  }

  test("t14 top-ngrams aggregates with map-side combine and TakeOrdered") {
    val p = plan("t14_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    // partial_count before the exchange = map-side combine
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("t12 boilerplate strip computes corpus size in-plan (no collected literal)") {
    val p = plan("t12_boilerplate_strip")
    // the threshold compares against the broadcast scalar agg, so the
    // plan must contain a broadcast of the count — not a folded literal
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("t23 repetition signals are map-only (no keyed shuffle, no explode)") {
    val p = plan("t23_repetition_signals")
    // only the final ORDER BY's range exchange (plus the test-data
    // spread roundrobin) — a hashpartitioning exchange would mean the
    // n-gram work left the map side
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), s"explode crept into the map-only path:\n$p")
  }

  test("v08 centroid scoring broadcasts centroids and combines map-side") {
    val p = plan("v08_centroid_outlier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // dim-wise centroid agg must partial-aggregate before its exchange
    assert(p.contains("partial_avg") || p.contains("partial_"), p)
  }

  test("q26 explicit-values pivot is a single aggregate pass (no values-discovery job)") {
    val p = plan("q26_pivot_revenue")
    assert(!p.contains("CollectLimit"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q32 list agg combines map-side (partial_collect_list before the exchange)") {
    val p = plan("q32_collect_sorted_csv")
    assert(p.contains("partial_collect_list"), p)
    assert(!p.contains("Join"), p)
  }

  test("t27 bloom prefilter evaluates at the scan, verify joins without cartesian") {
    // the final operator plan hides the prefilter behind the eager
    // dup-set materialization (lineage truncation is what lets it
    // release the history cache), so pin the prefilter stage directly:
    // the mightContain UDF must sit in a Filter over the scan (map-only
    // pruning BEFORE any shuffle/join)
    val d = graft.queries.Tables.t(spark, dir, "documents")
    val (candidates, _, histKeys) = graft.operators.Dedup.bloomCandidates(
      d.filter(org.apache.spark.sql.functions.expr("doc_id % 5 != 0")),
      d.filter(org.apache.spark.sql.functions.expr("doc_id % 5 = 0")),
      "doc_id", "text", fpp = 0.001)
    val cp = candidates.queryExecution.executedPlan.toString
    histKeys.unpersist()
    assert(cp.contains("UDF(xxhash64(md5("), cp)
    assert(!cp.contains("Join"), s"prefilter must be join-free:\n$cp")
    // and the full operator's verify path stays cartesian-free
    val p = plan("t27_bloom_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t28 mixture schedule: one per-source window shuffle, bounded preview is TakeOrdered") {
    val p = plan("t28_mixture_interleave")
    assert(p.contains("TakeOrderedAndProject"), s"preview must not global-sort:\n$p")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("t30 OOV: vocab is TakeOrdered + broadcast, per-doc agg combines map-side") {
    val p = plan("t30_oov_rate")
    assert(p.contains("TakeOrderedAndProject"), s"vocab cutoff must be top-k, not global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("t31 containment uses the inverted-index join (no cartesian/nested-loop)") {
    val p = plan("t31_dedup_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("v10 dimension stats combine map-side (partial aggregates before the exchange)") {
    val p = plan("v10_dimension_stats")
    assert(p.contains("partial_avg") || p.contains("partial_count"),
      s"per-dim agg must have a partial phase:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("v11 contamination broadcasts the probe side (corpus never shuffles)") {
    val p = plan("v11_semantic_contamination")
    assert(p.contains("BroadcastExchange"), s"probe side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("hashpartitioning"), s"corpus must not shuffle by key:\n$p")
  }

  test("t33 PMI cutoff is TakeOrdered; count joins have no cartesian") {
    val p = plan("t33_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t32 bigram surprisal: count aggs combine map-side, keyed join-backs only") {
    val p = plan("t32_bigram_surprisal")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t34 winnowing is map-only (array transforms, no join, no keyed shuffle)") {
    val p = plan("t34_winnowing_fingerprints")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"), s"winnowing must not shuffle by key:\n$p")
  }

  test("t36 winnowed pair-join has no cartesian/nested-loop (fingerprint inverted index)") {
    val p = plan("t36_winnowed_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q37 time-range frame: per-key window, no global sort before the frame") {
    val p = plan("q37_time_range_frame")
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(user_id"), s"frame must partition by user:\n$p")
  }

  test("t37 sketch-then-verify has no cartesian; verify joins candidates only") {
    val p = plan("t37_winnow_verify_pipeline")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t38 quality scorer is map-only (no join, no keyed shuffle)") {
    val p = plan("t38_quality_linear_score")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"), s"scorer must not shuffle by key:\n$p")
  }

  test("t39 passage dedup: one keyed shuffle on the chunk hash, no join") {
    val p = plan("t39_chunk_dup_passages")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count"), s"chunk agg must combine map-side:\n$p")
  }

  test("q36 calendar fill: the spine join broadcasts (no shuffle of the hourly agg)") {
    val p = plan("q36_calendar_zero_fill")
    assert(!p.contains("SortMergeJoin"), s"tiny spine/agg must broadcast-join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t40/t41/t42 quality+repetition rules are map-only (no join, no keyed shuffle)") {
    Seq("t40_gopher_quality_rules", "t41_c4_line_filters",
      "t42_dup_ngram_chars").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Join"), s"$n:\n$p")
      assert(!p.contains("hashpartitioning"),
        s"$n must not shuffle by key:\n$p")
    }
  }

  test("q39 lateral explode: generator in the scan stage, count combines map-side") {
    val p = plan("q39_lateral_explode")
    assert(p.contains("Generate"), p)
    assert(p.contains("partial_count"), s"count must combine before the exchange:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q40 EXISTS/NOT EXISTS plan as semi/anti joins, no cartesian") {
    val p = plan("q40_only_late_supplier")
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t09 simhash banding joins on (band,value), no cartesian/nested-loop") {
    val p = plan("t09_dedup_simhash")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("v15 random projection is map-only (literal matrix, no join, no shuffle)") {
    val p = plan("v15_random_projection")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"),
      s"projection must not shuffle by key:\n$p")
  }

  test("v14 pq encode: codebooks broadcast, corpus never sort-merges") {
    val p = plan("v14_pq_encode")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), s"codebook join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v13 kmeans: centroids broadcast to the assignment, update combines map-side") {
    val p = plan("v13_kmeans_int8")
    // the k-row centroid table is the build side of a broadcast
    // nested-loop (intended: assignment scores all k per row); the
    // corpus must never sort-merge. The centroid-UPDATE agg runs
    // eagerly per Lloyd iteration (materialized k-row model — keeps
    // lineage linear in iters), so the returned plan holds only the
    // final assignment + count: its argmin must still combine map-side.
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_min"), s"assignment argmin must combine map-side:\n$p")
    assert(p.contains("partial_count"), s"member count must combine map-side:\n$p")
  }

  test("v17 ADC: LUT broadcasts, per-pair sum combines map-side, no sort-merge") {
    val p = plan("v17_pq_adc_topk")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_sum"), s"ADC sum must combine map-side:\n$p")
  }

  test("v18 hamming: probes broadcast against a linear corpus scan") {
    val p = plan("v18_hamming_topk_1bit")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t44 url dedup: map-side canonicalization + ONE keyed agg, no join") {
    val p = plan("t44_url_canonical_dedup")
    assert(!p.contains("Join"), s"url dedup must not join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"canonical-url agg must combine map-side:\n$p")
  }

  test("q47 zorder: single agg for bounds, no sort-merge, no cartesian blowup") {
    val p = plan("q47_zorder_layout")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"bounds must broadcast:\n$p")
  }

  test("m12 image near-dup: banded bucket join, never all-pairs") {
    val p = plan("m12_image_neardup_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"banding must bucket-join:\n$p")
  }

  test("t48 bpe: corpus never globally sorts — top candidates via TakeOrdered") {
    val p = plan("t48_bpe_merges")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10/merge selection must be TakeOrdered, not a global sort:\n$p")
    // the only broadcasts are the 1-row merge rows; the vocabulary-sized
    // word table must never sort-merge against itself
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"pair counts must combine map-side:\n$p")
  }

  test("q51 SQL asof: interval join, NEVER a nested loop (the lateral regression)") {
    val p = plan("q51_asof_join_sql")
    // the LATERAL LIMIT-1 target decorrelated to a ts-only-domain
    // BroadcastNestedLoopJoin — |distinct ts| × |right| comparisons,
    // measured quadratic at sf0.1. The interval rewrite must keep the
    // join an equi-join (hash or merge) with the window on the right.
    assert(!p.contains("BroadcastNestedLoopJoin"), s"asof must not nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), s"ownership interval needs lead/lag window:\n$p")
  }

  test("t51 passage dedup: keyed joins only, dedup key is the block hash") {
    val p = plan("t51_passage_dedup_rebuild")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("bh"), s"group/join key must be the md5 block hash:\n$p")
  }

  test("t52 bm25: query terms broadcast, postings never sort-merge against corpus") {
    val p = plan("t52_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), s"term filter must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"tf/df aggs must combine map-side:\n$p")
  }

  test("t50 dsir: weight table broadcasts back; no pairwise anything") {
    val p = plan("t50_dsir_importance")
    assert(!p.contains("CartesianProduct"), s"no pairwise stage allowed:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the 1-row totals and 512-row weight table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"bucket join must be broadcast-hash:\n$p")
  }

  test("q57 bucketed range join: equi-join on bucket key, never a nested loop") {
    val p = plan("q57_bucketed_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"big×big range join must bucket, not nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t47 ccnet buckets: vocab join-backs never collect; window partitions by lang") {
    val p = plan("t47_ccnet_perplexity_buckets")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    // per-language ranking must be a partitioned window, not a single
    // global partition (empty partition-by would be the 100-TB killer)
    assert(p.contains("partitionBy") || p.contains("lang_pred"),
      s"window must partition by lang_pred:\n$p")
  }

  test("t62 CMS prefilter is a map-side Filter below the exact aggregate (no join)") {
    val p = plan("t62_cms_heavy_hitters")
    // the grid is a plan literal: the estimate filter must be a plain
    // Filter over the scan — no join against a sketch table, and the
    // ONLY aggregate above it is the exact candidate count
    assert(!p.contains("Join"), s"sketch lookup must not join:\n$p")
    // the least()-over-grid estimate filter sits BELOW the exact
    // aggregate (later in printed order); the filter above the agg is
    // the legitimate cnt >= threshold re-check
    val estIdx = p.indexOf("least(")
    val aggIdx = p.indexOf("HashAggregate")
    assert(estIdx >= 0 && aggIdx >= 0 && estIdx > aggIdx,
      s"estimate filter must sit below the aggregate:\n$p")
  }

  test("q60 VALUES inline dim is a LocalRelation broadcast (no dim-side scan)") {
    val p = plan("q60_values_inline_dim")
    assert(p.contains("LocalTableScan"), s"VALUES must plan as local rows:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t68 readability is map-only (no join, no keyed shuffle)") {
    val p = plan("t68_readability")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"),
      s"readability must not shuffle by key:\n$p")
  }

  test("t69 template shapes: ONE fp-keyed agg, cluster join-back never nested-loop") {
    val p = plan("t69_template_shape_clusters")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t71 repetition depth is map-only (no join, no keyed shuffle)") {
    val p = plan("t71_max_repeated_ngram")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"),
      s"repetition depth must not shuffle by key:\n$p")
  }

  test("t72 data card: two aggs + 1x1 broadcast combine, never sort-merge") {
    val p = plan("t72_corpus_data_card")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v29 portable LSH: bucket equi-join with broadcast query side, no all-pairs") {
    val p = plan("v29_ann_topk_lsh_portable")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
  }

  test("q63 LATERAL decorrelates to WindowGroupLimit (no per-row re-scan)") {
    val p = plan("q63_lateral_topn_join")
    assert(p.contains("WindowGroupLimit"),
      s"correlated LIMIT must plan as a group-limit:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q66 null-safe equality stays a hash-join key, never a nested loop") {
    val p = plan("q66_null_safe_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v31 pagerank materializes the kNN edge list ONCE across iterations") {
    val df = Registry.byName("v31_knn_pagerank").run(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // every iteration must read the checkpointed edges, not re-run the
    // kNN build: the plan scans the materialized RDD ≥ 3 times and the
    // corpus-sized scored join appears nowhere (it ran eagerly, once,
    // inside localCheckpoint)
    val scans = "Scan ExistingRDD".r.findAllIn(p).length
    assert(scans >= 3, s"expected ≥3 checkpointed-edge scans, got $scans:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"kNN build must not re-run inside the iteration plan:\n$p")
  }

  test("t73 rrf fusion never touches the corpus (candidate-list join only)") {
    val p = plan("t73_hybrid_rrf_fusion")
    // the fused join is top-20-per-query vs top-20-per-query; the only
    // corpus-sized structures live inside the two retrievers
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t74 percentile trim is ONE source-keyed window (shared count+rank)") {
    val p = plan("t74_length_percentile_trim")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"count+rank must share one source shuffle:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q69 interval overlap is a bucket equi-join, never a nested loop") {
    val p = plan("q69_interval_overlap_join")
    // the whole point of the bucketing: a bare overlap predicate would
    // plan as BroadcastNestedLoopJoin over the full cross product
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"bucket key must drive an equi-join:\n$p")
  }

  test("q70 GROUPS frame: group table broadcasts back (no row-level shuffle join)") {
    val p = plan("q70_groups_window_frame")
    assert(p.contains("BroadcastHashJoin"),
      s"group-frame table must broadcast to member rows:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q71 EXCLUDE emulation is window arithmetic (no join, no self-shuffle)") {
    val p = plan("q71_window_exclude")
    assert(!p.contains("Join"), s"EXCLUDE must not self-join:\n$p")
  }

  test("t82 weighted reservoir partially aggregates (no Window, no full sort)") {
    val p = plan("t82_weighted_reservoir")
    // the whole point vs the row_number formulation: selection happens
    // in the bounded-heap aggregate with map-side combining
    assert(p.contains("top_k_rows"), p)
    assert(!p.contains("Window"), s"reservoir must not window-shuffle all rows:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q74 DISTINCT window transposition plans as collect_set windows") {
    val p = plan("q74_distinct_window_count")
    assert(p.contains("collect_set"), s"rewrite must reach the plan:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q75 CDC apply windows only the delta (window input is the change feed)") {
    val p = plan("q75_cdc_apply")
    // the latest-change window appears once per consuming branch
    // (anti-join keys + upserts — both over the filtered ORDERS delta,
    // each with a WindowGroupLimit top-1 prefilter); the CUSTOMER
    // snapshot scan must never sit under a Window
    assert("Window \\[row_number".r.findAllIn(p).length <= 2, p)
    assert(p.contains("WindowGroupLimit"), s"top-1 prefilter missing:\n$p")
    assert(p.contains("LeftAnti"), p)
  }

  test("m23 keyframe near-dup joins on the signature bucket, never all-pairs") {
    val p = plan("m23_video_keyframe_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q85 erasure cascade is pure broadcast anti-joins (zero keyed shuffle)") {
    val p = plan("q85_erasure_propagation")
    // ShuffleProbe measures 0.00 MB exchanged; pin the shape behind it
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"),
      s"erasure must broadcast the victim set, never shuffle facts:\n$p")
  }

  test("v33 SQ8 calibration broadcasts the envelope (encode stays map-side)") {
    val p = plan("v33_sq8_calibrated")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"calibration row must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }
}
