package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity}

/** Rank-fusion and kNN-graph-centrality invariants that the
  * correctness gates (t73, v31) can't express: structural properties
  * on adversarial/synthetic inputs rather than fixture equality. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def ranked(rows: (Int, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("rrfFuse: doc in both lists outranks equal-rank doc in one") {
    val a = ranked((1, 10L, 1), (1, 11L, 2))
    val b = ranked((1, 10L, 1), (1, 12L, 2))
    val out = Retrieval.rrfFuse(a, b, k = 10).orderBy("rank")
      .select("doc_id", "rank", "rank_a", "rank_b")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.head == ((10L, 1, 1, 1)))          // in both lists → top
    // absent-list ranks report 0, tie between the two rank-2 singles
    // breaks on doc_id
    assert(out.toSeq == Seq((10L, 1, 1, 1), (11L, 2, 2, 0), (12L, 3, 0, 2)))
  }

  test("rrfFuse: disjoint lists interleave by rank then doc_id") {
    val a = ranked((1, 1L, 1), (1, 2L, 2))
    val b = ranked((1, 3L, 1), (1, 4L, 2))
    val out = Retrieval.rrfFuse(a, b, k = 10).orderBy("rank")
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 3L, 2L, 4L)) // rank-1s first (doc_id tie-break)
  }

  test("rrfFuse: fusion score is exactly the two-term reciprocal sum") {
    val a = ranked((1, 10L, 3))
    val b = ranked((1, 10L, 7))
    val rrf = Retrieval.rrfFuse(a, b, k = 1)
      .select("rrf").as[Double].head()
    val expected = BigDecimal(1.0 / 63 + 1.0 / 67)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rrf == expected)
  }

  test("bm25TopK ranks the doc with more query-term hits first") {
    val docsToks = Seq(
      (1L, Seq("spark", "join", "fast", "x")),
      (2L, Seq("spark", "y", "z", "w")),
      (3L, Seq("a", "b", "c", "d"))).toDF("doc_id", "toks")
    val qt = Seq((1, "spark"), (1, "join")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docsToks, qt, k = 5)
      .orderBy("rank").select("doc_id", "n_terms_hit")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L))) // doc 3 never surfaces
  }

  test("knnPagerank conserves total mass (Σpr = n) and is 1.0 on a regular graph") {
    // 6 vectors in two tight antipodal clusters of 3: each node's kNN
    // (k=2) is exactly its own cluster → two disjoint 3-cycles, a
    // 2-regular graph where in-degree == out-degree == 2 everywhere →
    // the damped update has fixed point pr = 1.0 exactly.
    val vecs = (0 until 6).map { i =>
      val sign = if (i < 3) 1f else -1f
      val jitter = 0.01f * (i % 3)
      (i.toLong, Array(sign * 1f, sign * (0.5f + jitter), sign * 0.25f))
    }.toDF("vec_id", "embedding")
    val pr = Similarity.knnPagerank(vecs, "vec_id", "embedding",
      k = 2, iters = 3)
    val vals = pr.select("pagerank").as[Double].collect()
    assert(vals.length == 6)
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-9), vals.toSeq.toString)
  }

  test("knnPagerank: a node nothing points at drains to the damping floor") {
    // 3 clustered vectors plus one orthogonal outlier: the cluster's
    // kNN edges stay inside the cluster, the outlier points out but
    // nothing points back → after ≥2 iterations its pr is the
    // 2-term geometric floor (1-d)(1 + ... no inbound) = 0.15.
    val vecs = Seq(
      (0L, Array(1f, 0.9f, 0f)),
      (1L, Array(0.9f, 1f, 0f)),
      (2L, Array(1f, 1f, 0.05f)),
      (9L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val pr = Similarity.knnPagerank(vecs, "vec_id", "embedding",
      k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(pr(9L) - 0.15) < 1e-9, pr.toString)
    // cluster nodes absorb the outlier's outbound mass → all above 1's floor
    assert(Seq(0L, 1L, 2L).forall(id => pr(id) > 0.15))
  }

  test("rocchioBm25 recalls a synonym-only doc the literal query misses") {
    import graft.operators.Retrieval
    // docs about "spark": feedback docs pair the query term with
    // "cluster"; doc 4 says only "cluster" — invisible to the literal
    // query, reachable after expansion
    val docsToks = Seq(
      (1L, Seq("spark", "cluster", "cluster", "cluster", "engine")),
      (2L, Seq("spark", "cluster", "cluster", "cluster", "jobs")),
      (3L, Seq("spark", "cluster", "cluster", "cluster", "fast")),
      (4L, Seq("cluster", "cluster", "compute")),
      (5L, Seq("database", "rows", "tables")),
      (6L, Seq("weather", "rain", "sun"))
    ).toDF("doc_id", "toks")
    val qt = Seq((1, "spark")).toDF("query_id", "term")
    val literal = Retrieval.bm25TopK(docsToks, qt, 5)
      .collect().map(_.getLong(2)).toSet
    assert(!literal.contains(4L))
    val prf = Retrieval.rocchioBm25(docsToks, qt,
        kFeedback = 3, nExpand = 1, k = 5)
      .collect().map(_.getLong(2)).toSet
    assert(prf.contains(4L), s"expansion must recall doc 4: $prf")
    // original query terms are never chosen as expansion terms, so
    // the literal hits stay in the result
    assert(literal.subsetOf(prf))
  }
}
