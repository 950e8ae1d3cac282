package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{CosineDedup, Similarity}

/** Vector similarity / ANN operators over the `embeddings` table
  * (array<float> column) — training-data-pipeline extension surface.
  * Oracles use DuckDB's list_dot_product with the same accumulation
  * shape (double math, index order, sqrt(a)·sqrt(b) denominator). */
object VectorOps {
  import Tables.t

  private def duckCos(a: String, b: String, digits: Int) =
    s"round(list_dot_product($a, $b) / " +
      s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), $digits)"

  private val v01 = GraftQuery(
    "v01_vector_norms",
    (s, dir) => {
      Similarity.withNorm(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), round(col("nrm"), 4).as("norm"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id,
            round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS norm
            FROM embeddings ORDER BY vec_id"""))

  private val v02 = GraftQuery(
    "v02_cosine_dup_pairs",
    (s, dir) => {
      Similarity.cosineDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ${duckCos("a.v", "b.v", 4)} AS cosine
             FROM e a JOIN e b ON a.vec_id < b.vec_id
             WHERE ${duckCos("a.v", "b.v", 4)} >= 0.4
             ORDER BY id_a, id_b"""),
    audit = true)

  private val v03 = GraftQuery(
    "v03_ann_topk_bruteforce",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS v_q FROM e WHERE vec_id < 10),
             sc AS (SELECT query_id, e.vec_id AS nbr_id,
                      ${duckCos("v_q", "e.v", 6)} AS c
                    FROM q CROSS JOIN e WHERE e.vec_id != query_id),
             r AS (SELECT query_id, nbr_id, c, row_number() OVER
                     (PARTITION BY query_id ORDER BY c DESC, nbr_id) AS rank
                   FROM sc)
             SELECT query_id, nbr_id, round(c, 4) AS cosine, rank
             FROM r WHERE rank <= 5 ORDER BY query_id, rank"""),
    audit = true)

  // LSH-bucketed ANN, oracle-checked via planted exact twins: the
  // corpus gains a bit-identical copy of every query under
  // vec_id+1000000. An identical vector produces identical sign bits →
  // identical band values → a guaranteed bucket collision in EVERY
  // band, and the exact-cosine verify ranks it first (cosine 1.0 beats
  // any non-dup; rank ties break on nbr_id, and no natural vector
  // duplicates a random-float embedding). The gate asserts rank-1 =
  // the twin for all 10 queries — a deterministic end-to-end proof
  // that banding, bucket join, dedup, and verify all fire (a vacuous
  // bucket join or dropped band would lose the twin and fail the
  // hash). Probabilistic recall on non-planted neighbors stays
  // AnnSpec-measured; v29 hash-checks the full ranking with portable
  // signatures.
  private val v04 = GraftQuery(
    "v04_ann_topk_lsh",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = emb.select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.lshTopK(
          base.unionByName(planted), emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, dim = 64)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("nbr_id").as("dup_id"), col("cosine"))
        .orderBy("query_id")
    },
    Some("""SELECT vec_id AS query_id, vec_id + 1000000 AS dup_id,
              CAST(1.0 AS DOUBLE) AS cosine
            FROM embeddings WHERE vec_id < 10 ORDER BY query_id"""))

  // IVF coarse-quantizer ANN — the partition-pruning scale path —
  // oracle-checked by the same planted-twin contract as v04: an
  // identical vector has an identical (round-6) centroid-similarity
  // array, so its assigned cell is exactly the query's first probe
  // (both sides break argmax ties on the first maximal index). The
  // twin therefore survives cell pruning deterministically and wins
  // rank 1 in the exact verify. Cell-recall on non-planted data stays
  // AnnSpec-measured (it depends on how clustered the corpus is).
  private val v05 = GraftQuery(
    "v05_ann_topk_ivf",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = emb.select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.ivfTopK(
          base.unionByName(planted), emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("nbr_id").as("dup_id"), col("cosine"))
        .orderBy("query_id")
    },
    Some("""SELECT vec_id AS query_id, vec_id + 1000000 AS dup_id,
              CAST(1.0 AS DOUBLE) AS cosine
            FROM embeddings WHERE vec_id < 10 ORDER BY query_id"""))

  // All-pairs near-dup via hyperplane LSH — the scale path replacing
  // v02's O(n²) enumeration for HIGH thresholds (banding cannot prune
  // low-similarity pairs; see Similarity.lshCosinePairs).
  //
  // The fixture embeddings are near-uniform, so no natural pair reaches
  // cosine 0.85 (the round-1 gate row was vacuous: 0 rows). The query
  // therefore PLANTS exact duplicates: a scaled copy (×1.001) of every
  // vector under vec_id+1000000. Scaling preserves direction exactly →
  // every hyperplane band matches deterministically → LSH recall on the
  // planted pairs is 1.0, and all other pairs stay far below the
  // threshold — which makes the output exact and ORACLE-CHECKABLE
  // (DuckDB computes the same all-pairs answer over base ∪ planted):
  // the oracle asserts both "found all planted dups" (recall) and
  // "nothing else survived the verify step" (precision).
  private val v06 = GraftQuery(
    "v06_cosine_dup_lsh",
    (s, dir) => {
      val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = base.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.lshCosinePairs(base.unionByName(planted), "vec_id", "embedding",
          threshold = 0.85, dim = 64)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             planted AS (SELECT vec_id + 1000000 AS vec_id,
                 list_transform(v, x -> x * 1.001) AS v FROM base),
             e AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ${duckCos("a.v", "b.v", 4)} AS cosine
             FROM e a JOIN e b ON a.vec_id < b.vec_id
             WHERE ${duckCos("a.v", "b.v", 4)} >= 0.85
             ORDER BY id_a, id_b"""),
    headline = true)

  // Symmetric int8 quantization — the standard memory-reduction step
  // before ANN at scale (4 bytes/dim → 1). Per-vector scale =
  // 127/max|x|; all arithmetic in double on BOTH engines so the
  // rounding is bit-identical and the oracle checks every element.
  // Map-only, zero shuffle.
  //
  // The quantized vector is emitted as a CSV STRING, not array<int>:
  // the driver's compare sorts column values in pandas, and array
  // columns are unhashable there (the round-2 gate errored on exactly
  // this). Same per-element strictness, sortable representation.
  private val v07 = GraftQuery(
    "v07_quantize_int8",
    (s, dir) => {
      val d = t(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("max_abs",
          greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-12)))
        .withColumn("scale", lit(127.0) / col("max_abs"))
      d.select(col("vec_id"),
          array_join(transform(col("v"),
            x => round(x * col("scale"), 0).cast("int")), ",").as("q_csv"),
          round(col("scale"), 4).as("scale_r"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            s AS (SELECT vec_id, v,
                127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS scale
              FROM e)
            SELECT vec_id,
              array_to_string(list_transform(v, x -> CAST(round(x * scale) AS INTEGER)), ',') AS q_csv,
              round(scale, 4) AS scale_r
            FROM s ORDER BY vec_id"""))

  // Per-label centroid + cosine-to-own-centroid — embedding outlier /
  // label-noise scoring. The oracle recomputes centroids and cosines in
  // DuckDB (double math, same sequential accumulation; see
  // Similarity.centroidDistance's precision note).
  private val v08 = GraftQuery(
    "v08_centroid_outlier",
    (s, dir) => {
      Similarity.centroidDistance(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label")
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            el AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
            cd AS (SELECT label, pos, avg(x) AS m FROM el GROUP BY label, pos),
            cent AS (SELECT label, list(m ORDER BY pos) AS c FROM cd GROUP BY label)
            SELECT e.vec_id, e.label,
              round(list_dot_product(e.v, cent.c) /
                (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.c, cent.c))), 4)
                AS cos_centroid
            FROM e JOIN cent USING (label) ORDER BY vec_id"""))

  // IVF-blocked near-dup pairs — the cell-blocked member of the
  // near-dup family (exact v02 / banded-LSH v06 / this). Same
  // planted-duplicate cohort as v06, and every emitted pair is
  // exact-cosine verified, so the output is a subset of v06's oracle
  // answer and equals it whenever IVF recall on the planted pairs is
  // 1.0 — which it is deterministically here: a ×1.001 copy preserves
  // direction, so both members probe identical cells (the coarse
  // quantizer is seeded/deterministic). The shared oracle makes a
  // recall regression a gate failure. AnnSpec separately measures
  // recall + precision on clustered synthetic data.
  private val v09 = GraftQuery(
    "v09_cosine_dup_ivf",
    (s, dir) => {
      val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = base.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.ivfCosinePairs(base.unionByName(planted), "vec_id", "embedding",
          threshold = 0.85, nCells = 0, nProbe = 2)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             planted AS (SELECT vec_id + 1000000 AS vec_id,
                 list_transform(v, x -> x * 1.001) AS v FROM base),
             e AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ${duckCos("a.v", "b.v", 4)} AS cosine
             FROM e a JOIN e b ON a.vec_id < b.vec_id
             WHERE ${duckCos("a.v", "b.v", 4)} >= 0.85
             ORDER BY id_a, id_b"""),
    headline = true)

  // Per-dimension feature-distribution stats — the embedding health
  // check before training / index builds (collapsed or unnormalized
  // dimensions surface here). posexplode → ONE hash agg keyed by pos;
  // map-side partials mean the shuffle carries dim × partitions states
  // regardless of corpus size. Spark posexplode is 0-based; the oracle
  // subtracts 1 from generate_subscripts to match.
  private val v10 = GraftQuery(
    "v10_dimension_stats",
    (s, dir) => {
      Similarity.dimensionStats(t(s, dir, "embeddings"), "embedding")
        .orderBy("pos")
    },
    Some("""WITH x AS (SELECT unnest(embedding::DOUBLE[]) AS x,
                generate_subscripts(embedding, 1) - 1 AS pos FROM embeddings)
            SELECT pos, count(*) AS n, round(avg(x), 4) AS mean,
              round(stddev_samp(x), 4) AS sd,
              round(min(x), 4) AS mn, round(max(x), 4) AS mx
            FROM x GROUP BY pos ORDER BY pos"""))

  // Semantic cross-corpus contamination: eval-style probe set (a
  // deterministic ~2.5% md5 split of the embeddings, mirroring
  // t17_split_assign's key) vs the remaining corpus, cosine ≥ 0.4 —
  // the paraphrase-robust companion to t19's n-gram contamination.
  // Probe side broadcast → corpus streams through one map stage with
  // zero shuffle (contract documented on Similarity.crossContamination;
  // too-big probe sets compose the LSH/IVF pair family instead).
  private val v11 = GraftQuery(
    "v11_semantic_contamination",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      val key = "substr(md5(CAST(vec_id AS STRING)), 1, 4)"
      Similarity.crossContamination(
          corpus = e.filter(expr(s"$key >= '0a3d'")),
          probe = e.filter(expr(s"$key < '0a3d'")),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy("probe_id", "corpus_id")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                 substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) AS k FROM embeddings),
             p AS (SELECT vec_id AS probe_id, v AS v_p FROM e WHERE k < '0a3d'),
             c AS (SELECT vec_id AS corpus_id, v AS v_c FROM e WHERE k >= '0a3d')
             SELECT probe_id, corpus_id, ${duckCos("v_c", "v_p", 4)} AS cosine
             FROM c CROSS JOIN p
             WHERE corpus_id != probe_id AND ${duckCos("v_c", "v_p", 4)} >= 0.4
             ORDER BY probe_id, corpus_id"""))

  // ANN over int8-quantized vectors (v07's quantization) — the
  // memory-bandwidth-reduction path: 4 bytes/dim → 1 with top-k
  // quality measured against v03's full-precision answer. KEY
  // property: per-vector scales CANCEL in cosine —
  // cos_q = dot(qa,qb)/sqrt(dot(qa,qa)·dot(qb,qb)) — so scoring is
  // pure integer arithmetic (64·127² products, exact in i64/double)
  // with zero FP-accumulation hazard: bit-identical on both engines,
  // hence fully oracle-checkable even though it is an approximation
  // of the float cosine. Broadcast queries × linear corpus scan, as
  // v03.
  private val v12 = GraftQuery(
    "v12_ann_topk_int8",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val q = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("""transform(embedding, x ->
                    cast(round(cast(x as double) *
                      (127.0 / greatest(array_max(transform(embedding,
                         y -> abs(cast(y as double)))), 1e-12)), 0) as int))""")
            .as("qv"))
        .withColumn("qnorm", expr(
          "aggregate(qv, 0L, (acc, v) -> acc + cast(v as bigint) * v)"))
      val probes = q.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("qv").as("qv_q"),
          col("qnorm").as("qn_q"))
      val scored = q.join(broadcast(probes), col("vec_id") =!= col("query_id"))
        .withColumn("idot", expr(
          "aggregate(zip_with(qv, qv_q, (x, y) -> cast(x as bigint) * y), 0L, (acc, v) -> acc + v)"))
        .withColumn("cos_q", round(
          col("idot").cast("double") /
            sqrt((col("qnorm") * col("qn_q")).cast("double")), 4))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos_q").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("nbr_id"), col("cos_q"), col("rank"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id, list_transform(v, x -> CAST(round(x *
                    (127.0 / greatest(list_max(list_transform(v, y -> abs(y))), 1e-12)))
                    AS BIGINT)) AS qv FROM e),
            n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS qnorm FROM q),
            p AS (SELECT vec_id AS query_id, qv AS qv_q, qnorm AS qn_q FROM n WHERE vec_id < 10),
            sc AS (SELECT query_id, n.vec_id AS nbr_id,
                     round(list_dot_product(n.qv, p.qv_q) /
                       sqrt(CAST(n.qnorm * p.qn_q AS DOUBLE)), 4) AS cos_q
                   FROM n CROSS JOIN p WHERE n.vec_id != p.query_id),
            r AS (SELECT query_id, nbr_id, cos_q, row_number() OVER
                    (PARTITION BY query_id ORDER BY cos_q DESC, nbr_id) AS rank
                  FROM sc)
            SELECT query_id, nbr_id, cos_q, rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  // Distributed k-means FIT over int8-quantized embeddings — the
  // training step behind the v05/v09 IVF coarse quantizer, fully
  // oracle-checked: integer centroid-update sums are summation-order-
  // free (exact), assignment distances round to 6 decimals before the
  // (dist, cid) argmin, init = k smallest ids. The oracle unrolls both
  // Lloyd iterations in SQL. Centroids as DECIMAL(14,4) CSV strings
  // (sortable/hashable representation — see v07's note).
  private val v13 = GraftQuery(
    "v13_kmeans_int8",
    (s, dir) => {
      Similarity.kmeansFitInt8(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id, list_transform(v, x -> CAST(round(x *
                    (127.0 / greatest(list_max(list_transform(v, y -> abs(y))), 1e-12)))
                    AS INTEGER)) AS qv FROM e),
            c0 AS (SELECT cid, list_transform(qv, x -> CAST(x AS DOUBLE)) AS c FROM
                    (SELECT qv, row_number() OVER (ORDER BY vec_id) - 1 AS cid
                     FROM q ORDER BY vec_id LIMIT 8)),
            a1 AS (SELECT vec_id, qv, cid FROM (
                    SELECT q.vec_id, q.qv, c0.cid,
                      row_number() OVER (PARTITION BY q.vec_id ORDER BY
                        round(list_sum(list_transform(range(len(q.qv)),
                          i -> (q.qv[i+1] - c0.c[i+1])^2)), 6), c0.cid) AS rn
                    FROM q, c0) WHERE rn = 1),
            m1 AS (SELECT cid, pos, round(CAST(sum(val) AS DOUBLE) / count(*), 4) AS m
                   FROM (SELECT cid, generate_subscripts(qv, 1) AS pos,
                           unnest(qv) AS val FROM a1)
                   GROUP BY cid, pos),
            c1 AS (SELECT cid, list(m ORDER BY pos) AS c FROM m1 GROUP BY cid),
            a2 AS (SELECT vec_id, qv, cid FROM (
                    SELECT q.vec_id, q.qv, c1.cid,
                      row_number() OVER (PARTITION BY q.vec_id ORDER BY
                        round(list_sum(list_transform(range(len(q.qv)),
                          i -> (q.qv[i+1] - c1.c[i+1])^2)), 6), c1.cid) AS rn
                    FROM q, c1) WHERE rn = 1),
            m2 AS (SELECT cid, pos, round(CAST(sum(val) AS DOUBLE) / count(*), 4) AS m
                   FROM (SELECT cid, generate_subscripts(qv, 1) AS pos,
                           unnest(qv) AS val FROM a2)
                   GROUP BY cid, pos),
            c2 AS (SELECT cid, list(m ORDER BY pos) AS c FROM m2 GROUP BY cid)
            SELECT f.cid, f.n_members,
              array_to_string(list_transform(c2.c,
                x -> CAST(CAST(x AS DECIMAL(14,4)) AS VARCHAR)), ',') AS centroid_csv
            FROM (SELECT cid, count(*) AS n_members FROM a2 GROUP BY cid) f
            LEFT JOIN c2 USING (cid)
            ORDER BY cid"""))

  // Product-quantization encode — the PQ half of IVF-PQ (v13 trains
  // codebooks; this compresses the corpus to m=4 code ids per vector).
  // The gate builds deterministic codebooks in-plan (the 16
  // smallest-id vectors' subvectors, code = id rank) so the ENTIRE
  // encode — subspace split, broadcast codebook scoring, rounded
  // (dist, code) argmin, ordered reconstruction-error fold — is
  // oracle-checked in SQL.
  private val v14 = GraftQuery(
    "v14_pq_encode",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val base = emb.orderBy("vec_id").limit(16)
        .withColumn("code", row_number().over(w) - 1)
        .select(col("code"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val codebooks = base.select(col("code"), explode(array((0 until 4).map {
          sp => struct(lit(sp).as("subspace"),
            slice(col("v"), sp * 16 + 1, 16).as("cvec"))
        }: _*)).as("sub"))
        .select(col("sub.subspace"), col("code"), col("sub.cvec"))
      Similarity.pqEncode(emb, "vec_id", "embedding", codebooks, m = 4)
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cb AS (SELECT code, v FROM (SELECT v,
                row_number() OVER (ORDER BY vec_id) - 1 AS code
                FROM e ORDER BY vec_id LIMIT 16)),
            sp AS (SELECT CAST(unnest(range(4)) AS INT) AS subspace),
            cbs AS (SELECT subspace, code,
                v[subspace*16+1 : subspace*16+16] AS cvec FROM cb, sp),
            sub AS (SELECT vec_id, subspace,
                v[subspace*16+1 : subspace*16+16] AS sv FROM e, sp),
            sc AS (SELECT vec_id, subspace, code,
                round(list_sum(list_transform(range(16),
                  i -> (sv[i+1] - cvec[i+1]) * (sv[i+1] - cvec[i+1]))), 6) AS dist
              FROM sub JOIN cbs USING (subspace)),
            best AS (SELECT vec_id, subspace, code, dist FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                  ORDER BY dist, code) AS rn FROM sc) WHERE rn = 1)
            SELECT vec_id,
              array_to_string(list(code ORDER BY subspace), ',') AS code_csv,
              CAST(round(sum(CAST(dist AS DECIMAL(18,6))), 4)
                AS DECIMAL(18,4)) :: DOUBLE AS recon_err
            FROM best GROUP BY vec_id ORDER BY vec_id"""))

  // Johnson–Lindenstrauss random projection (64 → 16 dims) — the
  // dimensionality-reduction pre-pass for cheaper downstream
  // ANN/dedup. The ±1 sign matrix derives from md5 parity (seed-free,
  // engine-portable), Spark embeds it as a literal (map-only, zero
  // per-row hashing), and the oracle re-derives it in SQL from md5
  // alone — the full projection arithmetic is oracle-checked with the
  // v13/v14 ordered-fold determinism contract.
  private val v15 = GraftQuery(
    "v15_random_projection",
    (s, dir) => {
      Similarity.randomProjection(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          dimIn = 64, dimOut = 16)
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            r AS (SELECT j, i, CASE WHEN CAST(concat('0x',
                  substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)),
                    1, 1)) AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END AS rv
              FROM (SELECT CAST(unnest(range(16)) AS INT) AS j),
                   (SELECT CAST(unnest(range(64)) AS INT) AS i)),
            rj AS (SELECT j, list(rv ORDER BY i) AS rl FROM r GROUP BY j),
            p AS (SELECT vec_id, j,
                CAST(CAST(round(list_sum(list_transform(range(64),
                  i -> rl[i+1] * v[i+1])) / sqrt(16), 4)
                  AS DECIMAL(12,4)) AS VARCHAR) AS y
              FROM e CROSS JOIN rj)
            SELECT vec_id, array_to_string(list(y ORDER BY j), ',') AS proj_csv
            FROM p GROUP BY vec_id ORDER BY vec_id"""))

  // Matryoshka prefix truncation (64 → 16 dims, unit-renormalized) —
  // the zero-compute reduction for MRL-trained embeddings; cosine over
  // the output needs no norm correction. Map-only; per-element math is
  // an ordered fold → fully oracle-checked.
  private val v16 = GraftQuery(
    "v16_matryoshka_truncate",
    (s, dir) => {
      Similarity.truncateRenorm(
          t(s, dir, "embeddings"), "vec_id", "embedding", dimOut = 16)
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS p
              FROM embeddings),
            n AS (SELECT vec_id, p,
                list_sum(list_transform(p, x -> x * x)) AS n2 FROM e)
            SELECT vec_id,
              CASE WHEN n2 > 0 THEN
                CAST(round(sqrt(n2), 4) AS DECIMAL(12,4)) :: DOUBLE END AS prefix_norm,
              CASE WHEN n2 > 0 THEN
                array_to_string(list_transform(p, x ->
                  CAST(CAST(round(x / sqrt(n2), 4) AS DECIMAL(12,4))
                    AS VARCHAR)), ',') END AS unit_csv
            FROM n ORDER BY vec_id"""))

  // PQ asymmetric-distance (ADC) top-k search — the query half of
  // IVF-PQ over v14's compressed codes: full-precision queries score
  // a corpus the search reads ONLY as m=4 code ids per vector, each
  // distance the sum of 4 broadcast LUT entries. Self-matches stay in
  // (the query is a corpus member; its adist is its reconstruction
  // distance — deterministic). Identical codes tie on adist and break
  // on vec_id, so the ranked rows are unique. The oracle replays
  // codebook build → encode → LUT → sum → rank entirely in SQL.
  private val v17 = GraftQuery(
    "v17_pq_adc_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val base = emb.orderBy("vec_id").limit(16)
        .withColumn("code", row_number().over(w) - 1)
        .select(col("code"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val codebooks = base.select(col("code"), explode(array((0 until 4).map {
          sp => struct(lit(sp).as("subspace"),
            slice(col("v"), sp * 16 + 1, 16).as("cvec"))
        }: _*)).as("sub"))
        .select(col("sub.subspace"), col("code"), col("sub.cvec"))
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", codebooks, m = 4)
        .select("vec_id", "code_csv")
      Similarity.pqAdcTopK(codes, codebooks,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", m = 4, k = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cb AS (SELECT code, v FROM (SELECT v,
                row_number() OVER (ORDER BY vec_id) - 1 AS code
                FROM e ORDER BY vec_id LIMIT 16)),
            sp AS (SELECT CAST(unnest(range(4)) AS INT) AS subspace),
            cbs AS (SELECT subspace, code,
                v[subspace*16+1 : subspace*16+16] AS cvec FROM cb, sp),
            sub AS (SELECT vec_id, subspace,
                v[subspace*16+1 : subspace*16+16] AS sv FROM e, sp),
            sc AS (SELECT vec_id, subspace, code,
                round(list_sum(list_transform(range(16),
                  i -> (sv[i+1] - cvec[i+1]) * (sv[i+1] - cvec[i+1]))), 6) AS dist
              FROM sub JOIN cbs USING (subspace)),
            best AS (SELECT vec_id, subspace, code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                  ORDER BY dist, code) AS rn FROM sc) WHERE rn = 1),
            q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5),
            qs AS (SELECT query_id, subspace,
                v[subspace*16+1 : subspace*16+16] AS qsv FROM q, sp),
            lut AS (SELECT query_id, subspace, code,
                round(list_sum(list_transform(range(16),
                  i -> (qsv[i+1] - cvec[i+1]) * (qsv[i+1] - cvec[i+1]))), 6) AS d
              FROM qs JOIN cbs USING (subspace)),
            sc2 AS (SELECT query_id, vec_id,
                CAST(round(sum(CAST(d AS DECIMAL(18,6))), 4)
                  AS DECIMAL(18,4)) :: DOUBLE AS adist
              FROM best JOIN lut USING (subspace, code)
              GROUP BY query_id, vec_id),
            r AS (SELECT query_id, vec_id AS nbr_id, adist, row_number() OVER
                (PARTITION BY query_id ORDER BY adist, vec_id) AS rank
              FROM sc2)
            SELECT query_id, nbr_id, adist, rank FROM r
            WHERE rank <= 5 ORDER BY query_id, rank"""))

  // 1-bit binary quantization + Hamming ANN — the coarsest
  // compression tier (64 dims → two BIGINT words, 16 B/vector;
  // retrieval scans bits, not floats). Sign extraction, XOR popcount
  // distance and the (hamming, vec_id) rank are ALL integer-exact, so
  // unlike the float-cosine ANN family this approximate index is
  // fully oracle-checked end-to-end.
  private val v18 = GraftQuery(
    "v18_hamming_topk_1bit",
    (s, dir) => {
      val signs = Similarity.binarySignBits(
        t(s, dir, "embeddings"), "vec_id", "embedding")
      Similarity.hammingTopK(signs, _.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            w AS (SELECT vec_id,
                CAST(list_sum(list_transform(range(32), j ->
                  CASE WHEN v[j+1] > 0 THEN (1::BIGINT << j) ELSE 0 END))
                  AS BIGINT) AS w0,
                CAST(list_sum(list_transform(range(32), j ->
                  CASE WHEN v[j+33] > 0 THEN (1::BIGINT << j) ELSE 0 END))
                  AS BIGINT) AS w1
              FROM e),
            p AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM w
              WHERE vec_id < 10),
            sc AS (SELECT query_id, w.vec_id AS nbr_id,
                CAST(bit_count(xor(w0, q0)) + bit_count(xor(w1, q1)) AS INT)
                  AS hamming
              FROM w CROSS JOIN p WHERE w.vec_id != p.query_id),
            r AS (SELECT query_id, nbr_id, hamming, row_number() OVER
                (PARTITION BY query_id ORDER BY hamming, nbr_id) AS rank
              FROM sc)
            SELECT query_id, nbr_id, hamming, rank FROM r
            WHERE rank <= 5 ORDER BY query_id, rank"""))

  // Composed IVF-PQ search — the full 100-TB ANN pipeline in one
  // operator: coarse cells (8 deterministic centers) prune the corpus
  // to nProbe=2 cells per query, then v17's ADC scores ONLY those
  // cells' codes. Every stage (cell assignment, probe selection,
  // encode, LUT, rank) follows the rounded-argmin / DECIMAL-sum
  // contract, so the entire composition unrolls in the SQL oracle.
  private val v19 = GraftQuery(
    "v19_ivf_pq_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val centroids = emb.orderBy("vec_id").limit(8)
        .withColumn("cid", row_number().over(w) - 1)
        .select(col("cid"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val base = emb.orderBy("vec_id").limit(16)
        .withColumn("code", row_number().over(w) - 1)
        .select(col("code"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val codebooks = base.select(col("code"), explode(array((0 until 4).map {
          sp => struct(lit(sp).as("subspace"),
            slice(col("v"), sp * 16 + 1, 16).as("cvec"))
        }: _*)).as("sub"))
        .select(col("sub.subspace"), col("code"), col("sub.cvec"))
      val cellDist = round(aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")),
          col("cvec"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, e) => acc + e), 6)
      val assign = emb.crossJoin(broadcast(centroids))
        .withColumn("cdist", cellDist)
        .groupBy("vec_id")
        .agg(min(struct(col("cdist"), col("cid"))).as("mc"))
        .select(col("vec_id"), col("mc.cid").as("cid"))
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", codebooks,
          m = 4).select("vec_id", "code_csv")
        .join(assign, "vec_id")
      Similarity.ivfPqTopK(codes, codebooks, centroids,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          m = 4, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cb AS (SELECT code, v FROM (SELECT v,
                row_number() OVER (ORDER BY vec_id) - 1 AS code
                FROM e ORDER BY vec_id LIMIT 16)),
            sp AS (SELECT CAST(unnest(range(4)) AS INT) AS subspace),
            cbs AS (SELECT subspace, code,
                v[subspace*16+1 : subspace*16+16] AS cvec FROM cb, sp),
            sub AS (SELECT vec_id, subspace,
                v[subspace*16+1 : subspace*16+16] AS sv FROM e, sp),
            sc AS (SELECT vec_id, subspace, code,
                round(list_sum(list_transform(range(16),
                  i -> (sv[i+1] - cvec[i+1]) * (sv[i+1] - cvec[i+1]))), 6) AS dist
              FROM sub JOIN cbs USING (subspace)),
            best AS (SELECT vec_id, subspace, code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                  ORDER BY dist, code) AS rn FROM sc) WHERE rn = 1),
            c8 AS (SELECT cid, v AS cvec FROM (SELECT v,
                row_number() OVER (ORDER BY vec_id) - 1 AS cid
                FROM e ORDER BY vec_id LIMIT 8)),
            asg AS (SELECT vec_id, cid FROM (
                SELECT e.vec_id, c8.cid, row_number() OVER
                  (PARTITION BY e.vec_id ORDER BY
                    round(list_sum(list_transform(range(64),
                      i -> (v[i+1] - cvec[i+1]) * (v[i+1] - cvec[i+1]))), 6),
                    c8.cid) AS rn
                FROM e, c8) WHERE rn = 1),
            q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5),
            pr AS (SELECT query_id, cid FROM (
                SELECT q.query_id, c8.cid, row_number() OVER
                  (PARTITION BY q.query_id ORDER BY
                    round(list_sum(list_transform(range(64),
                      i -> (v[i+1] - cvec[i+1]) * (v[i+1] - cvec[i+1]))), 6),
                    c8.cid) AS rn
                FROM q, c8) WHERE rn <= 2),
            qs AS (SELECT query_id, subspace,
                v[subspace*16+1 : subspace*16+16] AS qsv FROM q, sp),
            lut AS (SELECT query_id, subspace, code,
                round(list_sum(list_transform(range(16),
                  i -> (qsv[i+1] - cvec[i+1]) * (qsv[i+1] - cvec[i+1]))), 6) AS d
              FROM qs JOIN cbs USING (subspace)),
            sc2 AS (SELECT lut.query_id, best.vec_id,
                CAST(round(sum(CAST(d AS DECIMAL(18,6))), 4)
                  AS DECIMAL(18,4)) :: DOUBLE AS adist
              FROM best
              JOIN asg USING (vec_id)
              JOIN pr ON asg.cid = pr.cid
              JOIN lut ON lut.query_id = pr.query_id
                AND lut.subspace = best.subspace AND lut.code = best.code
              GROUP BY lut.query_id, best.vec_id),
            r AS (SELECT query_id, vec_id AS nbr_id, adist, row_number() OVER
                (PARTITION BY query_id ORDER BY adist, vec_id) AS rank
              FROM sc2)
            SELECT query_id, nbr_id, adist, rank FROM r
            WHERE rank <= 5 ORDER BY query_id, rank"""))

  // ANN recall report — the measurement operator (Similarity
  // .annRecall) run over two of the registry's own indexes: the 1-bit
  // Hamming tier (v18) audited against the exact int8-cosine top-k
  // (v12). Both pipelines are deterministic, so even the RECALL
  // NUMBERS are oracle-checked — the SQL replays both index
  // computations and the intersection count. Queries with zero hits
  // stay in the report via the reference query spine.
  private val v20 = GraftQuery(
    "v20_ann_recall_report",
    (s, dir) => {
      val ref = v12.run(s, dir).select("query_id", "nbr_id")
      val ann = v18.run(s, dir).select("query_id", "nbr_id")
      Similarity.annRecall(ann, ref, k = 5).orderBy("query_id")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            iq AS (SELECT vec_id, list_transform(v, x -> CAST(round(x *
                    (127.0 / greatest(list_max(list_transform(v, y -> abs(y))), 1e-12)))
                    AS BIGINT)) AS qv FROM e),
            in_ AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS qnorm FROM iq),
            ip AS (SELECT vec_id AS query_id, qv AS qv_q, qnorm AS qn_q
              FROM in_ WHERE vec_id < 10),
            isc AS (SELECT query_id, in_.vec_id AS nbr_id,
                     round(list_dot_product(in_.qv, ip.qv_q) /
                       sqrt(CAST(in_.qnorm * ip.qn_q AS DOUBLE)), 4) AS cos_q
                   FROM in_ CROSS JOIN ip WHERE in_.vec_id != ip.query_id),
            iref AS (SELECT query_id, nbr_id FROM (
                SELECT query_id, nbr_id, row_number() OVER
                  (PARTITION BY query_id ORDER BY cos_q DESC, nbr_id) AS rank
                FROM isc) WHERE rank <= 5),
            hw AS (SELECT vec_id,
                CAST(list_sum(list_transform(range(32), j ->
                  CASE WHEN v[j+1] > 0 THEN (1::BIGINT << j) ELSE 0 END))
                  AS BIGINT) AS w0,
                CAST(list_sum(list_transform(range(32), j ->
                  CASE WHEN v[j+33] > 0 THEN (1::BIGINT << j) ELSE 0 END))
                  AS BIGINT) AS w1
              FROM e),
            hp AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM hw
              WHERE vec_id < 10),
            hsc AS (SELECT query_id, hw.vec_id AS nbr_id,
                bit_count(xor(w0, q0)) + bit_count(xor(w1, q1)) AS hamming
              FROM hw CROSS JOIN hp WHERE hw.vec_id != hp.query_id),
            hann AS (SELECT query_id, nbr_id FROM (
                SELECT query_id, nbr_id, row_number() OVER
                  (PARTITION BY query_id ORDER BY hamming, nbr_id) AS rank
                FROM hsc) WHERE rank <= 5),
            h AS (SELECT hann.query_id, count(*) AS n_hit
              FROM hann JOIN iref USING (query_id, nbr_id) GROUP BY 1)
            SELECT q.query_id, coalesce(n_hit, 0) AS n_hit,
              round(coalesce(n_hit, 0) / 5.0, 4) AS recall
            FROM (SELECT DISTINCT query_id FROM iref) q
            LEFT JOIN h USING (query_id)
            ORDER BY query_id"""))

  // SemDeDup (Abbas et al. 2023) — the full semantic-dedup DECISION,
  // not just the pair list: IVF-blocked near-dup pairs → connected
  // components → keep-min-per-group, emitted for every corpus row.
  // Cohort plants TWO scaled copies (×1.001, ×1.002) of each base
  // vector so components are non-trivial 3-cliques and the min-id
  // representative is exercised across a 2-hop group. Direction is
  // preserved by scaling, so both copies probe the same IVF cells as
  // their base — recall is deterministically 1.0 and the oracle (exact
  // all-pairs + recursive-CTE union-find in DuckDB) checks the entire
  // composition: blocking, verify, grouping, keep decision.
  private val v21 = GraftQuery(
    "v21_semdedup",
    (s, dir) => {
      val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      def planted(off: Long, f: Float) = base.select(
        (col("vec_id") + off).as("vec_id"),
        transform(col("embedding"), x => x * lit(f)).as("embedding"))
      val cohort = base
        .unionByName(planted(1000000L, 1.001f))
        .unionByName(planted(2000000L, 1.002f))
      Similarity.semDeDup(cohort, "vec_id", "embedding",
          threshold = 0.85, nCells = 0, nProbe = 2)
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             pl1 AS (SELECT vec_id + 1000000 AS vec_id,
                 list_transform(v, x -> x * 1.001) AS v FROM base),
             pl2 AS (SELECT vec_id + 2000000 AS vec_id,
                 list_transform(v, x -> x * 1.002) AS v FROM base),
             e AS (SELECT * FROM base UNION ALL SELECT * FROM pl1
                   UNION ALL SELECT * FROM pl2),
             prs AS (SELECT a.vec_id AS u, b.vec_id AS v
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE ${duckCos("a.v", "b.v", 4)} >= 0.85),
             ed AS (SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs),
             cc AS (
               SELECT u AS node, u AS label FROM ed
               UNION
               SELECT ed.v AS node, c.label FROM cc c JOIN ed ON c.node = ed.u
             ),
             comp AS (SELECT node AS vec_id, min(label) AS component_id
               FROM cc GROUP BY node)
             SELECT e.vec_id,
               coalesce(comp.component_id, e.vec_id) AS rep_id,
               coalesce(comp.component_id, e.vec_id) = e.vec_id AS keep
             FROM e LEFT JOIN comp USING (vec_id) ORDER BY vec_id"""))

  // Hard-negative mining — per-anchor top-k most-similar vectors with
  // a DIFFERENT label (the near-miss negatives contrastive batches
  // need). Exact baseline shape (broadcast anchors × linear scan);
  // the label predicate prunes before the dot product, so the IVF
  // composition in Similarity.ivfTopK is the unchanged scale path.
  private val v22 = GraftQuery(
    "v22_hard_negatives",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegativesTopK(
          emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, label AS anchor_label, v AS v_q
                   FROM e WHERE vec_id < 10),
             sc AS (SELECT query_id, anchor_label, e.vec_id AS nbr_id,
                      e.label AS nbr_label,
                      ${duckCos("v_q", "e.v", 6)} AS c
                    FROM q CROSS JOIN e WHERE e.label != anchor_label),
             r AS (SELECT query_id, anchor_label, nbr_id, nbr_label, c,
                     row_number() OVER
                       (PARTITION BY query_id ORDER BY c DESC, nbr_id) AS rank
                   FROM sc)
             SELECT query_id, anchor_label, nbr_id, nbr_label,
               round(c, 4) AS cosine, rank
             FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  // MMR diversified selection — relevance-minus-redundancy greedy
  // pick of 3 from each anchor's 8-candidate pool (λ=0.7). The oracle
  // unrolls the same 3 greedy steps in CTEs; every comparison uses
  // round-6 scores with id tie-breaks, and the redundancy coefficient
  // is written `(1 - 0.7)` in BOTH engines (the IEEE double of the
  // subtraction differs from literal 0.3 in the last ulp).
  private val v23 = GraftQuery(
    "v23_mmr_diversify",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.mmrSelect(
          emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 3, poolSize = 8, lambda = 0.7)
        .orderBy("query_id", "pick")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS v_q FROM e WHERE vec_id < 5),
             sc0 AS (SELECT query_id, e.vec_id AS nbr_id,
                      ${duckCos("v_q", "e.v", 6)} AS qc
                    FROM q CROSS JOIN e WHERE e.vec_id != query_id),
             cand AS (SELECT query_id, nbr_id, qc FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY qc DESC, nbr_id) AS pr FROM sc0)
               WHERE pr <= 8),
             pc AS (SELECT a.query_id, a.nbr_id AS a_id, b.nbr_id AS b_id,
                      ${duckCos("ea.v", "eb.v", 6)} AS pc
                    FROM cand a JOIN cand b
                      ON a.query_id = b.query_id AND a.nbr_id != b.nbr_id
                    JOIN e ea ON ea.vec_id = a.nbr_id
                    JOIN e eb ON eb.vec_id = b.nbr_id),
             s1 AS (SELECT query_id, 1 AS pick, nbr_id, qc AS score FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY qc DESC, nbr_id) AS r FROM cand) WHERE r = 1),
             r1 AS (SELECT c.* FROM cand c LEFT JOIN s1
                 ON c.query_id = s1.query_id AND c.nbr_id = s1.nbr_id
               WHERE s1.nbr_id IS NULL),
             m2 AS (SELECT r1.query_id, r1.nbr_id, r1.qc,
                 round(0.7 * r1.qc - (1 - 0.7) * max(pc.pc), 6) AS score
               FROM r1 JOIN pc ON pc.query_id = r1.query_id AND pc.a_id = r1.nbr_id
               JOIN s1 ON s1.query_id = pc.query_id AND s1.nbr_id = pc.b_id
               GROUP BY r1.query_id, r1.nbr_id, r1.qc),
             s2 AS (SELECT query_id, 2 AS pick, nbr_id, score FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, nbr_id) AS r FROM m2) WHERE r = 1),
             r2 AS (SELECT r1.* FROM r1 LEFT JOIN s2
                 ON r1.query_id = s2.query_id AND r1.nbr_id = s2.nbr_id
               WHERE s2.nbr_id IS NULL),
             sel12 AS (SELECT query_id, nbr_id FROM s1
               UNION ALL SELECT query_id, nbr_id FROM s2),
             m3 AS (SELECT r2.query_id, r2.nbr_id,
                 round(0.7 * r2.qc - (1 - 0.7) * max(pc.pc), 6) AS score
               FROM r2 JOIN pc ON pc.query_id = r2.query_id AND pc.a_id = r2.nbr_id
               JOIN sel12 sl ON sl.query_id = pc.query_id AND sl.nbr_id = pc.b_id
               GROUP BY r2.query_id, r2.nbr_id, r2.qc),
             s3 AS (SELECT query_id, 3 AS pick, nbr_id, score FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, nbr_id) AS r FROM m3) WHERE r = 1),
             u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
               UNION ALL SELECT * FROM s3)
             SELECT query_id, pick, nbr_id, round(score, 4) AS mmr_score
             FROM u ORDER BY query_id, pick"""))

  // Top principal component by distributed covariance + THREE unrolled
  // power iterations — the PCA direction that drives whitening /
  // anisotropy diagnostics (embedding "rogue dimension" checks). The
  // covariance is one (i, j)-keyed agg over exploded coordinate pairs
  // (dim² keys = 4096, uniform — tiny shuffle); each iteration is a
  // 4096-row matrix × 64-row vector join, driver-scale. Intermediate
  // vectors round to 6 digits per iteration: that RE-SYNCS the two
  // engines' float ulp drift each step, making an iterative numeric
  // algorithm exactly oracle-checkable. At 100 TB the covariance agg
  // is the only corpus-sized stage (map-side combined); everything
  // after is constant work.
  /** Oracle-side twin of [[topComponentParts]]: CTEs `e`, `xr`, `n`,
    * `mu`, `cov`, and power iterations through `v3` (rounded-6
    * loadings) — shared by v24 and v28. */
  private val pcaCtes =
    """e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       xr AS (SELECT id, CAST(gs.i AS INT) - 1 AS i, v[gs.i] AS xi
         FROM e, generate_series(1, 64) AS gs(i)),
       n AS (SELECT count(DISTINCT id) AS n FROM xr),
       mu AS (SELECT i, sum(xi) / count(*) AS mu FROM xr GROUP BY i),
       sij AS (SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS s
         FROM xr a JOIN xr b USING (id) GROUP BY a.i, b.i),
       cov AS (SELECT sij.i, sij.j,
           round(s / n.n - mi.mu * mj.mu, 8) AS c
         FROM sij
         JOIN mu mi ON sij.i = mi.i
         JOIN mu mj ON sij.j = mj.i
         CROSS JOIN n),
       v0 AS (SELECT CAST(gs.i AS INT) - 1 AS i, 0.125 AS v
         FROM generate_series(1, 64) AS gs(i)),
       r1 AS (SELECT cov.i, sum(c * v0.v) AS r FROM cov
         JOIN v0 ON cov.j = v0.i GROUP BY cov.i),
       v1 AS (SELECT i, round(r / (SELECT sqrt(sum(r * r)) FROM r1), 6) AS v
         FROM r1),
       r2 AS (SELECT cov.i, sum(c * v1.v) AS r FROM cov
         JOIN v1 ON cov.j = v1.i GROUP BY cov.i),
       v2 AS (SELECT i, round(r / (SELECT sqrt(sum(r * r)) FROM r2), 6) AS v
         FROM r2),
       r3 AS (SELECT cov.i, sum(c * v2.v) AS r FROM cov
         JOIN v2 ON cov.j = v2.i GROUP BY cov.i),
       v3 AS (SELECT i, round(r / (SELECT sqrt(sum(r * r)) FROM r3), 6) AS v
         FROM r3)"""

  /** Shared v24/v28 plumbing: exploded coordinates, per-dim means,
    * covariance, and the 3-iteration rounded power method.
    * @return (xr (id, i, xi), mu (i, mu), cov (i, j, c), v (i, v)) */
  private def topComponentParts(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val xr = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("id", "i", "xi")
      .withColumn("xi", col("xi").cast("double"))
    val n = xr.agg(countDistinct("id").as("n"))
    val mu = xr.groupBy("i")
      .agg((sum("xi") / count(lit(1))).as("mu"))
    val sij = xr.as("a")
      .join(xr.as("b"), "id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.xi") * col("b.xi")).as("s"))
    val cov = sij
      .join(broadcast(mu.select(col("i"), col("mu").as("mu_i"))), "i")
      .join(broadcast(mu.select(col("i").as("j"), col("mu").as("mu_j"))), "j")
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        round(col("s") / col("n") - col("mu_i") * col("mu_j"), 8).as("c"))
    val dim = 64
    var v = s.range(dim).select(col("id").cast("int").as("i"),
      lit(1.0 / math.sqrt(dim)).as("v"))
    for (_ <- 1 to 3) {
      val raw = cov.join(v.select(col("i").as("j"), col("v")), "j")
        .groupBy("i").agg(sum(col("c") * col("v")).as("r"))
      val nrm = raw.agg(sqrt(sum(col("r") * col("r"))).as("nrm"))
      v = raw.crossJoin(broadcast(nrm))
        .select(col("i"), round(col("r") / col("nrm"), 6).as("v"))
    }
    (xr, mu, cov, v)
  }

  private val v24 = GraftQuery(
    "v24_top_principal_component",
    (s, dir) => {
      val (_, _, cov, v) = topComponentParts(s, dir)
      val cv = cov.join(v.select(col("i").as("j"), col("v")), "j")
        .groupBy("i").agg(sum(col("c") * col("v")).as("cv"))
      val lam = cv.join(v, "i")
        .agg((sum(col("cv") * col("v")) / sum(col("v") * col("v"))).as("lambda"))
      v.crossJoin(broadcast(lam))
        .select(col("i").as("dim"), round(col("v"), 4).as("loading"),
          round(col("lambda"), 4).as("eigenvalue"))
        .orderBy("dim")
    },
    Some(s"""WITH $pcaCtes,
             cv AS (SELECT cov.i, sum(c * v3.v) AS cv FROM cov
               JOIN v3 ON cov.j = v3.i GROUP BY cov.i),
             lam AS (SELECT sum(cv.cv * v3.v) / sum(v3.v * v3.v) AS lambda
               FROM cv JOIN v3 ON cv.i = v3.i)
             SELECT v3.i AS dim, round(v3.v, 4) AS loading,
               round(lam.lambda, 4) AS eigenvalue
             FROM v3 CROSS JOIN lam ORDER BY dim"""))

  // Greedy k-center (farthest-first) coreset selection — deterministic
  // diversity sampling: seed = min vec_id, then 3 unrolled iterations
  // each picking the corpus point farthest (rounded-6 squared L2, tie
  // on vec_id) from everything selected. The selected set is a k×dim
  // driver model embedded as plan literals → each iteration is ONE
  // map-only scan + a 1-row TakeOrdered; the oracle replays the whole
  // traversal in chained CTEs.
  private val v25 = GraftQuery(
    "v25_kcenter_coreset",
    (s, dir) => {
      Similarity.kcenterSelect(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4)
        .orderBy("step")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            s0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
            d1 AS (SELECT e.vec_id, e.v,
                round(list_sum(list_transform(range(64),
                  i -> (e.v[i+1] - s0.v[i+1]) * (e.v[i+1] - s0.v[i+1]))), 6)
                  AS mind
              FROM e, s0),
            s1 AS (SELECT vec_id, v, mind FROM d1
              ORDER BY mind DESC, vec_id LIMIT 1),
            d2 AS (SELECT d1.vec_id, d1.v, least(d1.mind,
                round(list_sum(list_transform(range(64),
                  i -> (d1.v[i+1] - s1.v[i+1]) * (d1.v[i+1] - s1.v[i+1]))), 6))
                  AS mind
              FROM d1, s1),
            s2 AS (SELECT vec_id, v, mind FROM d2
              ORDER BY mind DESC, vec_id LIMIT 1),
            d3 AS (SELECT d2.vec_id, d2.v, least(d2.mind,
                round(list_sum(list_transform(range(64),
                  i -> (d2.v[i+1] - s2.v[i+1]) * (d2.v[i+1] - s2.v[i+1]))), 6))
                  AS mind
              FROM d2, s2),
            s3 AS (SELECT vec_id, v, mind FROM d3
              ORDER BY mind DESC, vec_id LIMIT 1)
            SELECT 0 AS step, s0.vec_id, CAST(NULL AS DOUBLE) AS min_dist FROM s0
            UNION ALL SELECT 1, s1.vec_id, s1.mind FROM s1
            UNION ALL SELECT 2, s2.vec_id, s2.mind FROM s2
            UNION ALL SELECT 3, s3.vec_id, s3.mind FROM s3
            ORDER BY step"""))

  // PQ-shortlist + exact re-rank — the production ANN serving shape:
  // v17's ADC scans the corpus as m-byte codes for a kShort=10
  // shortlist, then ONLY those candidates' full vectors re-score
  // exactly (keyed join, queries·kShort rows — compression error can
  // drop a candidate but never mis-orders what the user sees). The
  // oracle replays codebook → encode → LUT → shortlist → exact rerank.
  private val v26 = GraftQuery(
    "v26_pq_rerank_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val base = emb.orderBy("vec_id").limit(16)
        .withColumn("code", row_number().over(w) - 1)
        .select(col("code"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val codebooks = base.select(col("code"), explode(array((0 until 4).map {
          sp => struct(lit(sp).as("subspace"),
            slice(col("v"), sp * 16 + 1, 16).as("cvec"))
        }: _*)).as("sub"))
        .select(col("sub.subspace"), col("code"), col("sub.cvec"))
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", codebooks, m = 4)
        .select("vec_id", "code_csv")
      Similarity.pqRerankTopK(codes, codebooks, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          m = 4, kShort = 10, k = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cb AS (SELECT code, v FROM (SELECT v,
                row_number() OVER (ORDER BY vec_id) - 1 AS code
                FROM e ORDER BY vec_id LIMIT 16)),
            sp AS (SELECT CAST(unnest(range(4)) AS INT) AS subspace),
            cbs AS (SELECT subspace, code,
                v[subspace*16+1 : subspace*16+16] AS cvec FROM cb, sp),
            sub AS (SELECT vec_id, subspace,
                v[subspace*16+1 : subspace*16+16] AS sv FROM e, sp),
            sc AS (SELECT vec_id, subspace, code,
                round(list_sum(list_transform(range(16),
                  i -> (sv[i+1] - cvec[i+1]) * (sv[i+1] - cvec[i+1]))), 6) AS dist
              FROM sub JOIN cbs USING (subspace)),
            best AS (SELECT vec_id, subspace, code FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                  ORDER BY dist, code) AS rn FROM sc) WHERE rn = 1),
            q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5),
            qs AS (SELECT query_id, subspace,
                v[subspace*16+1 : subspace*16+16] AS qsv FROM q, sp),
            lut AS (SELECT query_id, subspace, code,
                round(list_sum(list_transform(range(16),
                  i -> (qsv[i+1] - cvec[i+1]) * (qsv[i+1] - cvec[i+1]))), 6) AS d
              FROM qs JOIN cbs USING (subspace)),
            sc2 AS (SELECT query_id, vec_id,
                CAST(round(sum(CAST(d AS DECIMAL(18,6))), 4)
                  AS DECIMAL(18,4)) :: DOUBLE AS adist
              FROM best JOIN lut USING (subspace, code)
              GROUP BY query_id, vec_id),
            short AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id, row_number() OVER
                  (PARTITION BY query_id ORDER BY adist, vec_id) AS rn
                FROM sc2) WHERE rn <= 10),
            ex AS (SELECT short.query_id, short.vec_id AS nbr_id,
                round(list_sum(list_transform(range(64),
                  i -> (q.v[i+1] - e.v[i+1]) * (q.v[i+1] - e.v[i+1]))), 6)
                  AS dist
              FROM short
              JOIN e ON e.vec_id = short.vec_id
              JOIN q ON q.query_id = short.query_id),
            r AS (SELECT query_id, nbr_id, dist, row_number() OVER
                (PARTITION BY query_id ORDER BY dist, nbr_id) AS rank
              FROM ex)
            SELECT query_id, nbr_id, dist, rank FROM r
            WHERE rank <= 5 ORDER BY query_id, rank"""))

  // Asymmetric binary search — full-precision queries over the 1-bit
  // corpus (v18's words): un-quantizing the query side recovers most
  // of sym-Hamming's recall loss at the SAME 16 B/vector corpus
  // footprint. The 64-step sign-weighted fold walks dimensions in
  // order and rounds to 6, so the whole scorer is oracle-checked;
  // ranks tie-break on (score DESC, vec_id).
  private val v27 = GraftQuery(
    "v27_asymmetric_binary_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val signs = Similarity.binarySignBits(emb, "vec_id", "embedding")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("qv"))
      Similarity.asymmetricBinaryTopK(signs, queries, k = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            w AS (SELECT vec_id,
                CAST(list_sum(list_transform(range(32), j ->
                  CASE WHEN v[j+1] > 0 THEN (1::BIGINT << j) ELSE 0 END))
                  AS BIGINT) AS w0,
                CAST(list_sum(list_transform(range(32), j ->
                  CASE WHEN v[j+33] > 0 THEN (1::BIGINT << j) ELSE 0 END))
                  AS BIGINT) AS w1
              FROM e),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
            sc AS (SELECT query_id, w.vec_id AS nbr_id,
                round(list_sum(list_transform(range(64), j ->
                  qv[j+1] * CASE WHEN (CASE WHEN j < 32
                      THEN (w0 // (1::BIGINT << j))
                      ELSE (w1 // (1::BIGINT << (j - 32))) END) % 2 = 1
                    THEN 1.0 ELSE -1.0 END)), 6) + 0 AS score
              FROM w CROSS JOIN q WHERE w.vec_id != q.query_id),
            r AS (SELECT query_id, nbr_id, score, row_number() OVER
                (PARTITION BY query_id ORDER BY score DESC, nbr_id) AS rank
              FROM sc)
            SELECT query_id, nbr_id, score, rank FROM r
            WHERE rank <= 5 ORDER BY query_id, rank"""))

  // All-but-the-top embedding post-processing (Mu & Viswanath 2018,
  // arXiv:1702.01417): center, then remove the top principal
  // direction — the anisotropy correction that makes cosine
  // similarity discriminative again when one rogue direction
  // dominates (v24 diagnoses it; this repairs it). Re-uses v24's
  // covariance + rounded power iterations; the per-vector pass is
  // explode → broadcast-join (μ, u) → one id-keyed projection agg →
  // map-side residual, with the round-6 / round-4 re-sync contract
  // making the whole composition oracle-checkable.
  private val v28 = GraftQuery(
    "v28_abtt_whiten",
    (s, dir) => {
      val (xr, mu, _, v) = topComponentParts(s, dir)
      val mu6 = mu.select(col("i"), round(col("mu"), 6).as("mu"))
      val joined = xr.join(broadcast(mu6), "i").join(broadcast(v), "i")
      val pj = joined.groupBy("id")
        .agg((round(sum((col("xi") - col("mu")) * col("v")), 6) + lit(0.0))
          .as("proj"))
      joined.join(pj, "id")
        .select(col("id"), col("i"),
          round((col("xi") - col("mu")) - col("proj") * col("v"), 4)
            .cast("decimal(12,4)").as("o"),
          col("proj"))
        .groupBy(col("id").as("vec_id"), col("proj"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("i"), col("o")))),
          p => p("o").cast("string")), ",").as("abtt_csv"))
        .select(col("vec_id"), col("proj"), col("abtt_csv"))
        .orderBy("vec_id")
    },
    Some(s"""WITH $pcaCtes,
             mu6 AS (SELECT i, round(mu, 6) AS mu FROM mu),
             j AS (SELECT xr.id, xr.i, xr.xi, mu6.mu, v3.v
               FROM xr JOIN mu6 USING (i) JOIN v3 USING (i)),
             pj AS (SELECT id, round(sum((xi - mu) * v), 6) + 0 AS proj
               FROM j GROUP BY id),
             o AS (SELECT j.id, j.i,
                 CAST(round((xi - mu) - proj * v, 4) AS DECIMAL(12,4)) AS o,
                 pj.proj
               FROM j JOIN pj USING (id))
             SELECT id AS vec_id, proj,
               array_to_string(list(CAST(o AS VARCHAR) ORDER BY i), ',')
                 AS abtt_csv
             FROM o GROUP BY id, proj ORDER BY id"""))

  // Hyperplane-LSH ANN with the ENTIRE index oracle-checked: the
  // engine-portable signature path ([[Similarity.lshTopKPortable]],
  // md5-parity ±1 planes — v15's seed-free derivation) lets the SQL
  // oracle replay every stage: 64 sign bits (ascending-index dot
  // fold), 8 bands × 8-bit packed values, (band, value) bucket join,
  // candidate dedup, exact-cosine verify (round-6 rank, round-4
  // output — v03's contract). v04 stays the codegen'd-speed path
  // (recall-tested in AnnSpec); THIS gate proves the bucketing
  // machinery itself is exact, not just probabilistically adequate.
  private val v29 = GraftQuery(
    "v29_ann_topk_lsh_portable",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKPortable(
          emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, dim = 64)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             r AS (SELECT j, i, CASE WHEN CAST(concat('0x',
                   substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)),
                     1, 1)) AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END AS rv
               FROM (SELECT CAST(unnest(range(64)) AS INT) AS j),
                    (SELECT CAST(unnest(range(64)) AS INT) AS i)),
             rj AS (SELECT j, list(rv ORDER BY i) AS rl FROM r GROUP BY j),
             sig AS (SELECT vec_id, j, CASE WHEN
                   list_sum(list_transform(range(64), i -> rl[i+1] * v[i+1]))
                   > 0 THEN 1 ELSE 0 END AS bit
               FROM e CROSS JOIN rj),
             bv AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
                   CAST(sum(bit * (1 << CAST(j % 8 AS INT))) AS INT) AS val
               FROM sig GROUP BY vec_id, band),
             cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nbr_id
               FROM bv c JOIN bv q ON c.band = q.band AND c.val = q.val
               WHERE q.vec_id < 10 AND c.vec_id != q.vec_id),
             sc AS (SELECT query_id, nbr_id, ${duckCos("a.v", "b.v", 6)} AS c
               FROM cand
               JOIN e a ON a.vec_id = cand.query_id
               JOIN e b ON b.vec_id = cand.nbr_id
               WHERE list_dot_product(a.v, a.v) > 0
                 AND list_dot_product(b.v, b.v) > 0),
             rk AS (SELECT query_id, nbr_id, c, row_number() OVER
                 (PARTITION BY query_id ORDER BY c DESC, nbr_id) AS rank
               FROM sc)
             SELECT query_id, nbr_id, round(c, 4) AS cosine, rank
             FROM rk WHERE rank <= 5 ORDER BY query_id, rank"""))

  // Soft semantic dedup — v21's clusters, but every member keeps
  // sampling weight 1/|cluster| instead of a keep/drop bit: the
  // mixture-preserving dedup (hard dedup shifts source marginals when
  // duplication rates differ; weights leave them untouched). Same
  // planted-cohort construction as v21, so clusters exist at sf scale
  // and the oracle replays components + sizes exactly.
  private val v30 = GraftQuery(
    "v30_soft_dedup_weights",
    (s, dir) => {
      val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      def planted(off: Long, f: Float) = base.select(
        (col("vec_id") + off).as("vec_id"),
        transform(col("embedding"), x => x * lit(f)).as("embedding"))
      val cohort = base
        .unionByName(planted(1000000L, 1.001f))
        .unionByName(planted(2000000L, 1.002f))
      Similarity.softDedupWeights(cohort, "vec_id", "embedding",
          threshold = 0.85, nCells = 0, nProbe = 2)
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             pl1 AS (SELECT vec_id + 1000000 AS vec_id,
                 list_transform(v, x -> x * 1.001) AS v FROM base),
             pl2 AS (SELECT vec_id + 2000000 AS vec_id,
                 list_transform(v, x -> x * 1.002) AS v FROM base),
             e AS (SELECT * FROM base UNION ALL SELECT * FROM pl1
                   UNION ALL SELECT * FROM pl2),
             prs AS (SELECT a.vec_id AS u, b.vec_id AS v
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE ${duckCos("a.v", "b.v", 4)} >= 0.85),
             ed AS (SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs),
             cc AS (
               SELECT u AS node, u AS label FROM ed
               UNION
               SELECT ed.v AS node, c.label FROM cc c JOIN ed ON c.node = ed.u
             ),
             comp AS (SELECT node AS vec_id, min(label) AS component_id
               FROM cc GROUP BY node),
             lab AS (SELECT e.vec_id,
                 coalesce(comp.component_id, e.vec_id) AS rep_id
               FROM e LEFT JOIN comp USING (vec_id)),
             sz AS (SELECT rep_id, count(*) AS cluster_size
               FROM lab GROUP BY rep_id)
             SELECT vec_id, rep_id, CAST(cluster_size AS BIGINT) AS cluster_size,
               round(1::DOUBLE / cluster_size, 6) AS weight
             FROM lab JOIN sz USING (rep_id)
             ORDER BY vec_id"""))

  // PageRank centrality over the exact-cosine kNN graph (k=5, 3
  // damped iterations) — graph-based data selection: central
  // documents anchor semantic regions, low-pagerank rows are
  // outliers/orphans. Oracle unrolls all three power iterations as
  // chained CTEs; per-node sums fold in ascending-source order on
  // both engines (see Similarity.knnPagerank's determinism contract),
  // and the damping constants are computed expressions (0.85/5,
  // 1-0.85) so both engines round them identically.
  private val v31 = GraftQuery(
    "v31_knn_pagerank",
    (s, dir) => {
      Similarity.knnPagerank(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, iters = 3)
        .orderBy("vec_id")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             sc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                 ${duckCos("a.v", "b.v", 6)} AS c
               FROM e a JOIN e b ON a.vec_id != b.vec_id),
             ed AS (SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (
                   PARTITION BY src ORDER BY c DESC, dst) AS r FROM sc)
               WHERE r <= 5),
             con AS (SELECT CAST(0.85 AS DOUBLE) / 5 AS w,
               1 - CAST(0.85 AS DOUBLE) AS base),
             p0 AS (SELECT vec_id AS id, CAST(1 AS DOUBLE) AS pr FROM e),
             c1 AS (SELECT dst, list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list(pr * w ORDER BY src)), (a, b) -> a + b) AS s
               FROM ed JOIN p0 ON p0.id = ed.src CROSS JOIN con GROUP BY dst),
             p1 AS (SELECT p0.id, base + coalesce(c1.s, 0) AS pr
               FROM p0 LEFT JOIN c1 ON c1.dst = p0.id CROSS JOIN con),
             c2 AS (SELECT dst, list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list(pr * w ORDER BY src)), (a, b) -> a + b) AS s
               FROM ed JOIN p1 ON p1.id = ed.src CROSS JOIN con GROUP BY dst),
             p2 AS (SELECT p1.id, base + coalesce(c2.s, 0) AS pr
               FROM p1 LEFT JOIN c2 ON c2.dst = p1.id CROSS JOIN con),
             c3 AS (SELECT dst, list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list(pr * w ORDER BY src)), (a, b) -> a + b) AS s
               FROM ed JOIN p2 ON p2.id = ed.src CROSS JOIN con GROUP BY dst),
             p3 AS (SELECT p2.id, base + coalesce(c3.s, 0) AS pr
               FROM p2 LEFT JOIN c3 ON c3.dst = p2.id CROSS JOIN con)
             SELECT id AS vec_id, round(pr, 6) AS pagerank
             FROM p3 ORDER BY vec_id"""))

  // Embedding drift between sources: per-source centroid vectors and
  // their pairwise cosines — the observability report that catches a
  // new crawl/encoder shifting the embedding distribution before it
  // poisons dedup thresholds and ANN recall. Determinism: each
  // (source, dim) mean folds its values in ascending vec_id order
  // (v31's graph-sum rule applied to centroids — a distributed
  // float sum would be order-nondeterministic), each centroid
  // assembles in ascending dim order, and the pairwise cosine is the
  // ascending-index dot product both engines share. Scale: one
  // (source, dim)-keyed shuffle over the exploded corpus, then the
  // matrix join runs on |sources| rows.
  private val v32 = GraftQuery(
    "v32_source_centroid_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val src = t(s, dir, "documents").select(
        col("doc_id").as("vec_id"), col("source"))
      val e = t(s, dir, "embeddings").join(src, "vec_id")
        .select(col("vec_id"), col("source"),
          posexplode(transform(col("embedding"), x => x.cast("double")))
            .as(Seq("pos", "x")))
      val cent = e.groupBy("source", "pos")
        .agg((aggregate(
            sort_array(collect_list(struct(col("vec_id"), col("x")))),
            lit(0.0), (acc, v) => acc + v.getField("x"))
          / count(lit(1))).as("m"))
      val vecs = cent.groupBy("source")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("m")))),
          v => v.getField("m")).as("cv"))
      val a = vecs.select(col("source").as("source_a"), col("cv").as("va"))
      val b = vecs.select(col("source").as("source_b"), col("cv").as("vb"))
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
      // |sources| rows per side — broadcast so the inequality-only
      // pairing plans as a bounded BNLJ, never a CartesianProduct
      // with a full shuffle barrier (PlanAudit catch, round 6)
      a.join(broadcast(b), col("source_a") < col("source_b"))
        .select(col("source_a"), col("source_b"),
          round(dot(col("va"), col("vb")) /
            (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb")))),
            6).as("centroid_cosine"))
        .orderBy("source_a", "source_b")
    },
    Some("""WITH e AS (SELECT d.source, em.vec_id,
                 unnest(em.embedding::DOUBLE[]) AS x,
                 generate_subscripts(em.embedding, 1) - 1 AS pos
               FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id),
             cent AS (SELECT source, pos,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(x ORDER BY vec_id)), (a, b) -> a + b)
                 / count(*) AS m
               FROM e GROUP BY source, pos),
             vecs AS (SELECT source, list(m ORDER BY pos) AS cv
               FROM cent GROUP BY source)
             SELECT a.source AS source_a, b.source AS source_b,
               round(list_dot_product(a.cv, b.cv) /
                 (sqrt(list_dot_product(a.cv, a.cv)) *
                  sqrt(list_dot_product(b.cv, b.cv))), 6) AS centroid_cosine
             FROM vecs a JOIN vecs b ON a.source < b.source
             ORDER BY source_a, source_b"""))

  // Per-dimension percentile-calibrated SQ8 (FAISS ScalarQuantizer
  // QT_8bit): corpus-level [p01,p99] envelope per dimension → 1-byte
  // codes comparable ACROSS vectors (v07's per-vector scale is not).
  // Bounds round to 6dp BEFORE encoding on both engines, so the
  // quantization grid itself is cross-engine exact; the oracle
  // replays calibration + encode + reconstruction-error fold in SQL.
  private val v33 = GraftQuery(
    "v33_sq8_calibrated",
    (s, dir) => {
      Similarity.sq8Calibrated(t(s, dir, "embeddings"),
          "vec_id", "embedding", dim = 64)
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            d AS (SELECT i, round(quantile_cont(x, 0.01), 6) AS lo,
                    round(quantile_cont(x, 0.99), 6) AS hi
                  FROM (SELECT CAST(generate_subscripts(v, 1) AS INT) - 1 AS i,
                          unnest(v) AS x FROM e)
                  GROUP BY i),
            cal AS (SELECT list(lo ORDER BY i) AS los,
                      list(hi ORDER BY i) AS his FROM d),
            q AS (SELECT vec_id, v, los, his,
                    [CAST(least(greatest(round((v[i+1] - los[i+1]) /
                       greatest(his[i+1] - los[i+1], 1e-9) * 255), 0), 255)
                       AS INT) FOR i IN range(64)] AS codes
                  FROM e CROSS JOIN cal),
            r AS (SELECT vec_id, codes,
                    [los[i+1] + codes[i+1] / 255.0 *
                       greatest(his[i+1] - los[i+1], 1e-9) - v[i+1]
                     FOR i IN range(64)] AS errs
                  FROM q)
            SELECT vec_id, array_to_string(codes, ',') AS code_csv,
              round(list_sum(list_transform(errs, y -> y * y)), 6)
                AS recon_err
            FROM r ORDER BY vec_id"""))

  // IVF + SQ8 asymmetric search (FAISS IndexIVFScalarQuantizer):
  // 1-byte-per-dim corpus bucketed by deterministic coarse cells,
  // 2-probe queries score decoded codes — the whole index build
  // (calibration, encode, assignment, probe, ADC, rank) replayed in
  // SQL. Completes the quantized-ANN ladder next to v17/v19 (PQ) and
  // v12 (int8-sym).
  private val v34 = GraftQuery(
    "v34_ivf_sq8_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfSq8TopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", dim = 64, nSeeds = 4, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            d AS (SELECT i, round(quantile_cont(x, 0.01), 6) AS lo,
                    round(quantile_cont(x, 0.99), 6) AS hi
                  FROM (SELECT CAST(generate_subscripts(v, 1) AS INT) - 1 AS i,
                          unnest(v) AS x FROM e)
                  GROUP BY i),
            cal AS (SELECT list(lo ORDER BY i) AS los,
                      list(hi ORDER BY i) AS his FROM d),
            cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                v AS cvec FROM (SELECT vec_id, v FROM e ORDER BY vec_id
                  LIMIT 4)),
            asn AS (SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid, row_number() OVER (
                    PARTITION BY e.vec_id ORDER BY
                    round(list_sum(list_transform(
                      [v[i+1] - cvec[i+1] FOR i IN range(64)],
                      y -> y * y)), 6), c.cid) AS rn
                FROM e CROSS JOIN cents c) WHERE rn = 1),
            codes AS (SELECT vec_id,
                [CAST(least(greatest(round((v[i+1] - los[i+1]) /
                   greatest(his[i+1] - los[i+1], 1e-9) * 255), 0), 255)
                   AS INT) FOR i IN range(64)] AS cds
              FROM e CROSS JOIN cal),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id < 5),
            prob AS (SELECT query_id, qv, cid FROM (
                SELECT q.query_id, q.qv, c.cid, row_number() OVER (
                    PARTITION BY q.query_id ORDER BY
                    round(list_sum(list_transform(
                      [qv[i+1] - cvec[i+1] FOR i IN range(64)],
                      y -> y * y)), 6), c.cid) AS rn
                FROM q CROSS JOIN cents c) WHERE rn <= 2),
            cand AS (SELECT p.query_id, p.qv, cd.vec_id, cd.cds
              FROM prob p
              JOIN (SELECT codes.vec_id, codes.cds, asn.cid
                    FROM codes JOIN asn USING (vec_id)) cd
                ON cd.cid = p.cid),
            sc AS (SELECT query_id, vec_id,
                round(list_sum(list_transform(
                  [qv[i+1] - (los[i+1] + cds[i+1] / 255.0 *
                     greatest(his[i+1] - los[i+1], 1e-9))
                   FOR i IN range(64)], y -> y * y)), 6) AS adist
              FROM cand CROSS JOIN cal),
            r AS (SELECT query_id, vec_id, adist, row_number() OVER (
                PARTITION BY query_id ORDER BY adist, vec_id) AS rank
              FROM sc)
            SELECT query_id, CAST(rank AS INT) AS rank,
              vec_id AS nbr_id, adist
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  // Late-interaction max-sim retrieval (ColBERT's scoring): 4 unit
  // facets per vector, each query facet matches its best document
  // facet independently — semantics single-vector cosine cannot
  // express. Facet split, normalization, per-facet maxima, and the
  // ordered facet-sum fold all replay in SQL.
  private val v35 = GraftQuery(
    "v35_maxsim_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.maxSimTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", dim = 64, nSub = 4, k = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            sub AS (SELECT vec_id, CAST(s AS INT) AS si,
                v[s*16+1 : s*16+16] AS sv
              FROM e, (SELECT unnest(range(4)) AS s)),
            un AS (SELECT vec_id, si,
                CASE WHEN nrm > 0 THEN list_transform(sv, x -> x / nrm)
                  ELSE list_transform(sv, x -> 0.0) END AS u
              FROM (SELECT vec_id, si, sv,
                  sqrt(list_sum(list_transform(sv, x -> x * x))) AS nrm
                FROM sub)),
            q AS (SELECT vec_id AS query_id, si AS qsi, u AS qu
              FROM un WHERE vec_id < 5),
            dots AS (SELECT q.query_id, d.vec_id, q.qsi,
                list_sum(list_transform(range(16),
                  i -> qu[i+1] * u[i+1])) AS dot
              FROM un d CROSS JOIN q),
            best AS (SELECT query_id, vec_id, qsi, max(dot) AS m
              FROM dots GROUP BY 1, 2, 3),
            sc AS (SELECT query_id, vec_id,
                round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list(m ORDER BY qsi)), (a, b) -> a + b), 6) AS maxsim
              FROM best GROUP BY query_id, vec_id),
            r AS (SELECT query_id, vec_id, maxsim, row_number() OVER (
                PARTITION BY query_id ORDER BY maxsim DESC, vec_id) AS rank
              FROM sc)
            SELECT query_id, CAST(rank AS INT) AS rank,
              vec_id AS nbr_id, maxsim
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  // Two-stage retrieval — the production ColBERT shape: v34's
  // compressed IVF-SQ8 index shortlists 20 candidates per query,
  // late-interaction max-sim re-ranks ONLY the shortlist (join volume
  // ∝ |candidates|, not corpus). The oracle replays the ENTIRE
  // composition: calibrate → encode → probe → ADC top-20 → facet
  // split → max-sim → final rank.
  private val v36 = GraftQuery(
    "v36_two_stage_retrieval",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      val shortlist = Similarity.ivfSq8TopK(emb, queries,
        "vec_id", "embedding", dim = 64, nSeeds = 4, k = 20, nProbe = 2)
      Similarity.maxSimRerank(emb, queries, shortlist,
          "vec_id", "embedding", dim = 64, nSub = 4, k = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            d AS (SELECT i, round(quantile_cont(x, 0.01), 6) AS lo,
                    round(quantile_cont(x, 0.99), 6) AS hi
                  FROM (SELECT CAST(generate_subscripts(v, 1) AS INT) - 1 AS i,
                          unnest(v) AS x FROM e)
                  GROUP BY i),
            cal AS (SELECT list(lo ORDER BY i) AS los,
                      list(hi ORDER BY i) AS his FROM d),
            cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                v AS cvec FROM (SELECT vec_id, v FROM e ORDER BY vec_id
                  LIMIT 4)),
            asn AS (SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid, row_number() OVER (
                    PARTITION BY e.vec_id ORDER BY
                    round(list_sum(list_transform(
                      [v[i+1] - cvec[i+1] FOR i IN range(64)],
                      y -> y * y)), 6), c.cid) AS rn
                FROM e CROSS JOIN cents c) WHERE rn = 1),
            codes AS (SELECT vec_id,
                [CAST(least(greatest(round((v[i+1] - los[i+1]) /
                   greatest(his[i+1] - los[i+1], 1e-9) * 255), 0), 255)
                   AS INT) FOR i IN range(64)] AS cds
              FROM e CROSS JOIN cal),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id < 5),
            prob AS (SELECT query_id, qv, cid FROM (
                SELECT q.query_id, q.qv, c.cid, row_number() OVER (
                    PARTITION BY q.query_id ORDER BY
                    round(list_sum(list_transform(
                      [qv[i+1] - cvec[i+1] FOR i IN range(64)],
                      y -> y * y)), 6), c.cid) AS rn
                FROM q CROSS JOIN cents c) WHERE rn <= 2),
            cand0 AS (SELECT p.query_id, p.qv, cd.vec_id, cd.cds
              FROM prob p
              JOIN (SELECT codes.vec_id, codes.cds, asn.cid
                    FROM codes JOIN asn USING (vec_id)) cd
                ON cd.cid = p.cid),
            sc0 AS (SELECT query_id, vec_id,
                round(list_sum(list_transform(
                  [qv[i+1] - (los[i+1] + cds[i+1] / 255.0 *
                     greatest(his[i+1] - los[i+1], 1e-9))
                   FOR i IN range(64)], y -> y * y)), 6) AS adist
              FROM cand0 CROSS JOIN cal),
            shortlist AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id, row_number() OVER (
                  PARTITION BY query_id ORDER BY adist, vec_id) AS rank
                FROM sc0) WHERE rank <= 20),
            sub AS (SELECT vec_id, CAST(s AS INT) AS si,
                v[s*16+1 : s*16+16] AS sv
              FROM e, (SELECT unnest(range(4)) AS s)),
            un AS (SELECT vec_id, si,
                CASE WHEN nrm > 0 THEN list_transform(sv, x -> x / nrm)
                  ELSE list_transform(sv, x -> 0.0) END AS u
              FROM (SELECT vec_id, si, sv,
                  sqrt(list_sum(list_transform(sv, x -> x * x))) AS nrm
                FROM sub)),
            qs AS (SELECT vec_id AS query_id, si AS qsi, u AS qu
              FROM un WHERE vec_id < 5),
            dots AS (SELECT sl.query_id, sl.vec_id, qs.qsi,
                list_sum(list_transform(range(16),
                  i -> qu[i+1] * u[i+1])) AS dot
              FROM shortlist sl
              JOIN un d ON d.vec_id = sl.vec_id
              JOIN qs ON qs.query_id = sl.query_id),
            best AS (SELECT query_id, vec_id, qsi, max(dot) AS m
              FROM dots GROUP BY 1, 2, 3),
            sc AS (SELECT query_id, vec_id,
                round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list(m ORDER BY qsi)), (a, b) -> a + b), 6) AS maxsim
              FROM best GROUP BY query_id, vec_id),
            r AS (SELECT query_id, vec_id, maxsim, row_number() OVER (
                PARTITION BY query_id ORDER BY maxsim DESC, vec_id) AS rank
              FROM sc)
            SELECT query_id, CAST(rank AS INT) AS rank,
              vec_id AS nbr_id, maxsim
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  // Cluster-balanced diversity downsample (the DCLM-family curation
  // move): nearest-coarse-cell assignment, then a per-cell quota keep
  // (max(1, cell_n div 5)) — dense regions thinned hard, sparse
  // regions survive. Every stage (md5-ordered centroid pick, rounded-6
  // argmax with cell-index ties, md5 keep order, integer-division
  // quota) is engine-portable, so the oracle replays the FULL
  // pipeline, not a planted invariant.
  private val v37 = GraftQuery(
    "v37_cluster_balanced_sample",
    (s, dir) => {
      Similarity.clusterBalancedSample(t(s, dir, "embeddings"),
          "vec_id", "embedding", nCells = 8, denom = 5)
        .orderBy("cell", "pick")
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            c0 AS (SELECT vec_id, v FROM e
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
            cents AS (SELECT row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                v AS cv FROM c0),
            sim AS (SELECT e.vec_id, c.cell,
                round(list_dot_product(e.v, c.cv) /
                  sqrt(list_dot_product(c.cv, c.cv)), 6) AS s
              FROM e CROSS JOIN cents c),
            asg AS (SELECT vec_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                  PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
                FROM sim) WHERE rn = 1),
            cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_n
              FROM asg GROUP BY cell),
            rk AS (SELECT vec_id, cell, CAST(row_number() OVER (
                PARTITION BY cell
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT)
                AS pick FROM asg)
            SELECT rk.vec_id, rk.cell, cnt.cell_n, rk.pick
            FROM rk JOIN cnt USING (cell)
            WHERE pick <= greatest(1, cell_n // 5)
            ORDER BY cell, pick"""))

  // Incremental IVF index maintenance — the APPEND leg of the index
  // lifecycle (v05 builds/searches, v32's drift report says WHEN to
  // re-cluster, this is how new data lands WITHOUT a rebuild).
  // History (vec_id % 5 != 0) builds the frozen centroid set; the
  // arriving batch (vec_id % 5 == 0) assigns to those centroids only:
  // no re-cluster, no history re-scan, O(|batch|·nCells) map-only
  // work. Fully oracle-checked — the coarse quantizer is
  // deterministic and engine-portable (md5-ordered centroid sample,
  // rounded-6 argmax with cell-index ties, the v37 discipline), so
  // DuckDB re-derives the centroids from history and replays every
  // batch assignment. AnnSpec separately proves the appended rows
  // are SEARCHABLE: ivfSearchIndex over history+appended finds
  // batch-planted twins at rank 1 after a parquet round trip.
  private val v38 = GraftQuery(
    "v38_ivf_incremental_append",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val hist = emb.filter(col("vec_id") % 5 =!= 0)
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val (cents, _) =
        Similarity.ivfBuildIndex(hist, "vec_id", "embedding", nCells = 16)
      Similarity.ivfAppendIndex(cents, batch, "vec_id", "embedding")
        .select(col("nbr_id").as("vec_id"), col("cell"))
        .orderBy("vec_id")
    },
    Some("""WITH hist AS (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id % 5 != 0),
            c0 AS (SELECT vec_id, v FROM hist
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
            cents AS (SELECT row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                v AS cv FROM c0),
            batch AS (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id % 5 = 0),
            sim AS (SELECT b.vec_id, c.cell,
                round(list_dot_product(b.v, c.cv) /
                  sqrt(list_dot_product(c.cv, c.cv)), 6) AS s
              FROM batch b CROSS JOIN cents c),
            asg AS (SELECT vec_id, cell FROM (
                SELECT vec_id, cell, row_number() OVER (
                  PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
                FROM sim) WHERE rn = 1)
            SELECT vec_id, CAST(cell AS INT) AS cell
            FROM asg ORDER BY vec_id"""))

  // Incremental embedding near-dup — minhashIncrementalPairs' exact
  // analog for cosine space (Similarity.lshCosineIncrementalPairs):
  // history is banded once into a PERSISTABLE hyperplane index, each
  // arriving batch probes cross-set only (daily cost O(|batch|·bands)
  // + candidate verifies, never corpus²). Batch = near-identical
  // scaled copies (cosine 1.0 with their base — banding recall ~1
  // there, v06's planted discipline) + NEGATED copies (cosine −1, a
  // non-vacuous never-matches cohort). Oracle = exact cross-set
  // cosine pairs at the same rounded threshold.
  private val v39 = GraftQuery(
    "v39_cosine_incremental_dedup",
    (s, dir) => {
      val hist = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val batch = hist.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
        .unionByName(hist.filter(pmod(col("vec_id"), lit(7)) === 0)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
      Similarity.lshCosineIncrementalPairs(hist, batch,
          "vec_id", "embedding", threshold = 0.85, dim = 64)
        .orderBy("batch_id", "hist_id")
    },
    Some(s"""WITH hist AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings),
             batch AS (SELECT vec_id + 1000000 AS vec_id,
                 list_transform(v, x -> x * 1.001) AS v FROM hist
               WHERE vec_id % 5 = 0
               UNION ALL
               SELECT vec_id + 2000000, list_transform(v, x -> -x)
               FROM hist WHERE vec_id % 7 = 0)
             SELECT b.vec_id AS batch_id, h.vec_id AS hist_id,
               ${duckCos("b.v", "h.v", 4)} AS cosine
             FROM batch b JOIN hist h
               ON ${duckCos("b.v", "h.v", 4)} >= 0.85
             ORDER BY batch_id, hist_id"""))

  // STREAMING cosine admission (CosineDedup.streamingCosineDupFilter),
  // gated as a deterministic batch REPLAY — t108's discipline in
  // cosine space: the registry can't run a StreamingQuery, but the
  // daemon's whole contract lives in its per-trigger body
  // (cosineDupFilterBatch → cosineDupCommitBatch over persisted
  // parquet state), so replaying a fixed 3-batch schedule through
  // exactly those calls gates the same code the foreachBatch daemon
  // runs (CosineDedupSpec covers the wiring: retries, replay
  // idempotence, compaction, torn state). Schedule: batch0 = %9==0;
  // batch1 adds 2×-scaled copies of batch0 (cross-batch dups);
  // batch2 adds 0.5×-scaled copies of batch1's class (cross-batch),
  // 3×-scaled copies of its own class (WITHIN-batch dups, min-id
  // canonical survives) and NEGATED copies of batch0 (cosine −1 — the
  // never-match cohort, admitted). The state is compacted between
  // bids 1 and 2 (replay-safe floor), so bid 2 gates the folded,
  // bucket-pruned probe path. Recall is exactly 1 for every planted
  // pair: hyperplane signs are invariant under positive scaling, so a
  // scaled copy collides in EVERY band; precision is exact on both
  // sides (rounded-cosine verify vs the oracle's exact pairs). The
  // oracle replays probe-then-commit per bid in recursive CTEs (exact
  // cosine pairs → min-label connected components → min-id canonical
  // → NOT EXISTS vs earlier admits).
  private val v40 = GraftQuery(
    "v40_streaming_cosine_dedup_replay",
    (s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      def cls(k: Int) = e.filter(pmod(col("vec_id"), lit(9)) === k)
      def scaled(df: org.apache.spark.sql.DataFrame, off: Long, f: Float) =
        df.select((col("vec_id") + off).as("vec_id"),
          transform(col("embedding"), x => x * lit(f)).as("embedding"))
      val b0 = cls(0)
      val b1 = cls(1).unionByName(scaled(cls(0), 1000000L, 2f))
      val b2 = cls(2)
        .unionByName(scaled(cls(1), 2000000L, 0.5f))
        .unionByName(scaled(cls(2), 3000000L, 3f))
        .unionByName(scaled(cls(0), 4000000L, -1f))
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft_v40_state")
      val perBid = Seq(b0, b1, b2).zipWithIndex.map { case (b, bid) =>
        val surv = CosineDedup.cosineDupFilterBatch(b, "vec_id",
          "embedding", stateDir.toString, bid.toLong,
          threshold = 0.95, dim = 64)
        CosineDedup.cosineDupCommitBatch(surv, "vec_id", "embedding",
          stateDir.toString, bid.toLong, dim = 64)
        // checkpoint BEFORE the fold deletes the pre-fold state files
        val ids = surv.select(lit(bid.toLong).as("bid"), col("vec_id"))
          .localCheckpoint(true)
        if (bid == 1) CosineDedup.compactCosineDupState(s,
          stateDir.toString, upToBid = 1L, minReplayableBid = 2L)
        ids
      }
      java.nio.file.Files.walk(stateDir)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      perBid.reduce(_ unionByName _).orderBy("bid", "vec_id")
    },
    Some(s"""WITH RECURSIVE
             e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             b0 AS (SELECT vec_id, v FROM e WHERE vec_id % 9 = 0),
             b1 AS (SELECT vec_id, v FROM e WHERE vec_id % 9 = 1
               UNION ALL
               SELECT vec_id + 1000000, list_transform(v, x -> x * 2)
               FROM e WHERE vec_id % 9 = 0),
             b2 AS (SELECT vec_id, v FROM e WHERE vec_id % 9 = 2
               UNION ALL
               SELECT vec_id + 2000000, list_transform(v, x -> x * 0.5)
               FROM e WHERE vec_id % 9 = 1
               UNION ALL
               SELECT vec_id + 3000000, list_transform(v, x -> x * 3)
               FROM e WHERE vec_id % 9 = 2
               UNION ALL
               SELECT vec_id + 4000000, list_transform(v, x -> -x)
               FROM e WHERE vec_id % 9 = 0),
             p0 AS (SELECT a.vec_id AS u, b.vec_id AS w FROM b0 a
               JOIN b0 b ON a.vec_id < b.vec_id
               WHERE ${duckCos("a.v", "b.v", 4)} >= 0.95),
             e0 AS (SELECT u, w FROM p0 UNION ALL SELECT w, u FROM p0),
             cc0 AS (SELECT u AS node, u AS label FROM e0
               UNION
               SELECT g.w AS node, c.label FROM cc0 c JOIN e0 g
                 ON c.node = g.u),
             s0 AS (SELECT vec_id, v FROM b0 WHERE vec_id NOT IN
               (SELECT node FROM (SELECT node, min(label) AS m FROM cc0
                  GROUP BY node) WHERE node <> m)),
             p1 AS (SELECT a.vec_id AS u, b.vec_id AS w FROM b1 a
               JOIN b1 b ON a.vec_id < b.vec_id
               WHERE ${duckCos("a.v", "b.v", 4)} >= 0.95),
             e1 AS (SELECT u, w FROM p1 UNION ALL SELECT w, u FROM p1),
             cc1 AS (SELECT u AS node, u AS label FROM e1
               UNION
               SELECT g.w AS node, c.label FROM cc1 c JOIN e1 g
                 ON c.node = g.u),
             s1w AS (SELECT vec_id, v FROM b1 WHERE vec_id NOT IN
               (SELECT node FROM (SELECT node, min(label) AS m FROM cc1
                  GROUP BY node) WHERE node <> m)),
             s1 AS (SELECT w.vec_id, w.v FROM s1w w WHERE NOT EXISTS
               (SELECT 1 FROM s0 h
                WHERE ${duckCos("w.v", "h.v", 4)} >= 0.95)),
             a1 AS (SELECT vec_id, v FROM s0
               UNION ALL SELECT vec_id, v FROM s1),
             p2 AS (SELECT a.vec_id AS u, b.vec_id AS w FROM b2 a
               JOIN b2 b ON a.vec_id < b.vec_id
               WHERE ${duckCos("a.v", "b.v", 4)} >= 0.95),
             e2 AS (SELECT u, w FROM p2 UNION ALL SELECT w, u FROM p2),
             cc2 AS (SELECT u AS node, u AS label FROM e2
               UNION
               SELECT g.w AS node, c.label FROM cc2 c JOIN e2 g
                 ON c.node = g.u),
             s2w AS (SELECT vec_id, v FROM b2 WHERE vec_id NOT IN
               (SELECT node FROM (SELECT node, min(label) AS m FROM cc2
                  GROUP BY node) WHERE node <> m)),
             s2 AS (SELECT w.vec_id, w.v FROM s2w w WHERE NOT EXISTS
               (SELECT 1 FROM a1 h
                WHERE ${duckCos("w.v", "h.v", 4)} >= 0.95))
             SELECT CAST(bid AS BIGINT) AS bid,
               CAST(vec_id AS BIGINT) AS vec_id FROM (
                 SELECT 0 AS bid, vec_id FROM s0
                 UNION ALL SELECT 1, vec_id FROM s1
                 UNION ALL SELECT 2, vec_id FROM s2)
             ORDER BY bid, vec_id"""))

  val all: Seq[GraftQuery] = Seq(v01, v02, v03, v04, v05, v06, v07, v08, v09,
    v10, v11, v12, v13, v14, v15, v16, v17, v18, v19, v20, v21, v22, v23, v24,
    v25, v26, v27, v28, v29, v30, v31, v32, v33, v34, v35, v36, v37, v38,
    v39, v40)
}
