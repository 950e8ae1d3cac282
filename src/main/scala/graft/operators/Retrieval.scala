package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (BM25) retrieval and rank fusion — the retrieval half of a
  * training-data curation stack (dense ANN lives in [[Similarity]]).
  *
  * Scale shape: BM25 is an inverted-index computation — postings are
  * filtered by the broadcast query-term list BEFORE any shuffle, so
  * the keyed work is O(docs containing a query term), not O(corpus);
  * tf/df aggregations are map-side combinable. Fusion operates on
  * per-query top-k lists (bounded: |queries| × depth rows), so its
  * cost is independent of corpus size — the standard hybrid-retrieval
  * architecture where fan-out happens in the two retrievers and the
  * fuser touches only candidates.
  */
object Retrieval {

  /** BM25 top-k (Robertson/Spärck Jones; default k1=1.2, b=0.75) over
    * pre-tokenized documents.
    *
    * `docsToks`: (doc_id, toks: array<string>); `queryTerms`:
    * (query_id, term). Output: (query_id, rank, doc_id, bm25,
    * n_terms_hit), rank by round-4 bm25 desc then doc_id.
    *
    * avgdl is an exact integer sum ÷ count (bit-identical across
    * engines — a distributed float average would not be); idf is the
    * +1 log-smoothed form, always positive. */
  def bm25TopK(
      docsToks: DataFrame, queryTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = docsToks.select(col("doc_id"), size(col("toks")).as("dl"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = docsToks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(queryTerms), "term")
      .groupBy("query_id", "term", "doc_id").agg(count(lit(1)).as("tf"))
    val dfreq = tf.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("doc_id"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      // fold per-term scores in ascending-term order: a distributed
      // sum("s") merges partials in shuffle-arrival order, and a
      // round-4 boundary case would make the gate hash flaky across
      // runs/engines (the v31/v32 deterministic-sum rule)
      .agg(round(aggregate(
          sort_array(collect_list(struct(col("term"), col("s")))),
          lit(0.0), (acc, x) => acc + x.getField("s")), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "bm25", "n_terms_hit")
  }

  /** Rocchio-style pseudo-relevance feedback: run BM25, treat the
    * top `kFeedback` docs per query as relevant, mine their
    * highest-tf·idf terms (minus the original query terms) as
    * expansion terms, and re-run BM25 with the expanded query — the
    * classic two-pass recall lever for sparse retrieval (Rocchio
    * 1971 / RM3's deterministic core).
    *
    * Scale shape: the feedback set is |queries|×kFeedback doc ids
    * (broadcast); candidate-term stats touch the corpus through ONE
    * posting join keyed by the candidate vocabulary (broadcast — the
    * union of a few docs' vocabularies), never a full-vocab
    * aggregation. Both retrieval passes are [[bm25TopK]]'s bounded
    * plan. Determinism: expansion scores round to 6 before the
    * (score desc, term) selection, so the expanded query — and hence
    * the whole second pass — is cross-engine exact. */
  def rocchioBm25(
      docsToks: DataFrame, queryTerms: DataFrame,
      kFeedback: Int, nExpand: Int, k: Int): DataFrame = {
    require(kFeedback >= 1 && nExpand >= 1 && k >= 1)
    val fb = bm25TopK(docsToks, queryTerms, kFeedback)
      .select("query_id", "doc_id")
    val post = docsToks.select(col("doc_id"), explode(col("toks")).as("term"))
    val cand = post.join(broadcast(fb), "doc_id")
      .groupBy("query_id", "term").agg(count(lit(1)).as("tf_fb"))
      .join(queryTerms, Seq("query_id", "term"), "left_anti")
    val termSet = cand.select("term").distinct()
    val dfreq = post.join(broadcast(termSet), "term")
      .select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docsToks.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("escore").desc, col("term"))
    val expansion = cand.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("escore", round(col("tf_fb") * log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)), 6))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= nExpand)
      .select("query_id", "term")
    bm25TopK(docsToks,
      queryTerms.select("query_id", "term").unionByName(expansion), k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of two
    * per-query rankings: score = Σ 1/(c + rank) over the lists a doc
    * appears in, re-ranked per query.
    *
    * Inputs: (query_id, doc_id, rank) each. Output: (query_id, rank,
    * doc_id, rrf round-6, rank_a, rank_b) with absent-list ranks
    * reported as 0. The unrounded fusion score is a fixed two-term
    * expression (no aggregation), so ordering is bit-deterministic;
    * ties (e.g. rank r in exactly one list either side) break on
    * doc_id. The join is |queries|×depth vs |queries|×depth — bounded
    * candidate lists, never corpus-sized. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    val aa = a.select(col("query_id"), col("doc_id"), col("rank").as("rank_a"))
    val bb = b.select(col("query_id"), col("doc_id"), col("rank").as("rank_b"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_raw").desc, col("doc_id"))
    aa.join(bb, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rrf_raw"), 6).as("rrf"),
        coalesce(col("rank_a"), lit(0)).as("rank_a"),
        coalesce(col("rank_b"), lit(0)).as("rank_b"))
  }
}
