package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN recall on CLUSTERED vectors (the realistic embedding shape —
  * the sf testdata embeddings are near-uniform, where no sublinear
  * method can have high recall; real embedding corpora cluster). */
class AnnSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 32
  private def mkClustered = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 10)
      val v = c.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    vecs.toDF("vec_id", "embedding")
  }

  test("ivfTopK recall@5 ≥ 0.8 on clustered vectors") {
    val emb = mkClustered.cache()
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("lshTopK recall@5 ≥ 0.5 on clustered vectors") {
    val emb = mkClustered.cache()
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("lshTopKPortable recall@5 ≥ 0.5 and results verified-exact") {
    val emb = mkClustered.cache()
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val port = Similarity.lshTopKPortable(emb, queries, "vec_id", "embedding",
        5, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & port).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("lshCosinePairs finds most exact cosine-dup pairs, precision 1.0") {
    val emb = mkClustered.cache()
    val exact = Similarity.cosineDupPairs(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.9,
        dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // exact verify step ⇒ every reported pair is a true pair
    assert((lsh -- exact).isEmpty)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall (${lsh.size}/${exact.size})")
  }

  test("bruteForceTopK is deterministic and self-excluding") {
    val emb = mkClustered
    val queries = emb.filter(col("vec_id") < 3)
    val r1 = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5).collect()
    val r2 = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(r1.forall(r => r.getLong(0) != r.getLong(1)))
    assert(r1.length == 15)
  }

  test("ivfCosinePairs: precision 1.0, high recall on clustered vectors") {
    val emb = mkClustered
    val exact = Similarity.cosineDupPairs(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfCosinePairs(emb, "vec_id", "embedding", 0.9,
        nCells = 12, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert((ivf -- exact).isEmpty, "exact verify step ⇒ precision 1.0")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall (${ivf.size}/${exact.size})")
  }

  test("centroidDistance: in-cluster vectors score near 1, cross-cluster outliers lower") {
    // two tight, well-separated clusters + one planted outlier whose
    // label disagrees with its position in space
    val rnd = new scala.util.Random(11)
    val cA = Array.fill(dim)(5.0f + 0.01f * rnd.nextGaussian().toFloat)
    val cB = Array.fill(dim)(-5.0f + 0.01f * rnd.nextGaussian().toFloat)
    val rows = (0 until 50).map { i =>
      (i.toLong, 0, cA.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    } ++ (50 until 100).map { i =>
      (i.toLong, 1, cB.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    } :+ ((100L, 0, cB.clone())) // labeled 0, lives at cluster B
    val emb = rows.toDF("vec_id", "label", "embedding")

    val scored = Similarity.centroidDistance(emb, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val inliers = (0L until 100L).map(scored)
    assert(inliers.forall(_ > 0.99), s"min inlier ${inliers.min}")
    // the mislabeled vector is anti-aligned with its own centroid
    assert(scored(100L) < 0.0, s"outlier score ${scored(100L)}")
    assert(scored.values.forall(c => c <= 1.0001 && c >= -1.0001))
  }

  test("crossContamination finds exactly the probe-corpus pairs above threshold") {
    val rnd = new scala.util.Random(5)
    val dim = 16
    val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val corpus = ((1 to 30).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    } :+ ((99L, base.map(x => x * 2.0f)))   // planted paraphrase-dup of probe 1000
    ).toDF("vec_id", "embedding")
    val probe = Seq((1000L, base)).toDF("vec_id", "embedding")
    val got = Similarity.crossContamination(corpus, probe, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1000L, 99L)))
    // brute-force agreement at a loose threshold
    val loose = Similarity.crossContamination(corpus, probe, "vec_id", "embedding", 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cl = corpus.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val want = cl.map { case (id, v) =>
        (1000L, id, BigDecimal(cos(base, v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.filter(_._3 >= 0.2).toSet
    assert(loose == want)
  }

  test("dimensionStats: per-dimension moments match a local computation") {
    val rows = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(3.0f, 0.0f, 0.5f)),
      (3L, Array(5.0f, 2.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = Similarity.dimensionStats(rows, "embedding")
      .orderBy("pos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got(0) == ((0, 3L, 3.0, 2.0, 1.0, 5.0)))
    assert(got(1) == ((1, 3L, 0.0, 2.0, -2.0, 2.0)))
    // constant dimension: sd 0 — the "collapsed feature" signal
    assert(got(2) == ((2, 3L, 0.5, 0.0, 0.5, 0.5)))
  }

  test("kmeansFitInt8 recovers well-separated planted clusters") {
    // 3 distant centers, tight noise → 2 Lloyd iterations from the
    // min-id init must converge to one kmeans cluster per planted
    // cluster (sizes 134/133/133) with all members together
    val rnd = new scala.util.Random(11)
    val centers = Array(
      Array.fill(dim)(10.0f + rnd.nextFloat()),
      Array.fill(dim)(-10.0f - rnd.nextFloat()),
      Array.fill(dim)(rnd.nextFloat() * 0.1f))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val out = Similarity.kmeansFitInt8(emb, "vec_id", "embedding", k = 3, iters = 2)
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n_members")).sum == 400L)
    // purity: re-assign each planted member by its id's cluster → the
    // operator's sizes must match the planted sizes exactly
    assert(out.map(_.getAs[Long]("n_members")).sorted.toSeq == Seq(133L, 133L, 134L))
    // centroid csv parses back to dim values
    val c0 = out.head.getAs[String]("centroid_csv").split(",")
    assert(c0.length == dim)
  }

  test("pqEncode: codebook members encode to their own code with zero error") {
    // vectors 0..7 ARE the codebook (2 subspaces × 4 codes of dim 16):
    // each must encode to its own (codeA, codeB) with recon_err 0;
    // a perturbed copy must choose the nearest original's codes
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 8).map(i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat * 5f)))
    val emb = (vecs ++ Seq((100L, vecs(2)._2.map(x => x + 0.01f))))
      .toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("code"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val codebooks = base.select(col("code"), explode(array((0 until 2).map {
        sp => struct(lit(sp).as("subspace"),
          slice(col("v"), sp * 16 + 1, 16).as("cvec"))
      }: _*)).as("sub"))
      .select(col("sub.subspace"), col("code"), col("sub.cvec"))
    val out = Similarity.pqEncode(emb, "vec_id", "embedding", codebooks,
        m = 2, dim = 32)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("code_csv"),
          r.getAs[Double]("recon_err"))).toMap
    (0 until 8).foreach { i =>
      assert(out(i.toLong)._1 == s"$i,$i", s"vec $i must self-encode")
      assert(out(i.toLong)._2 == 0.0)
    }
    assert(out(100L)._1 == "2,2", "perturbed copy picks its source's codes")
    assert(out(100L)._2 > 0.0 && out(100L)._2 < 0.1)
  }

  test("pqAdcTopK: ADC over codes ranks the query's planted twin first") {
    // same construction as the encode test: codebook = vectors 0..7,
    // corpus adds near-copies of vectors 2 and 5. An ADC search for
    // vector 2 must rank {2, its twin 100} (adist 0 — identical codes,
    // tie broken by id) ahead of everything else.
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 8).map(i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat * 5f)))
    val emb = (vecs ++ Seq(
      (100L, vecs(2)._2.map(x => x + 0.01f)),
      (101L, vecs(5)._2.map(x => x - 0.01f))))
      .toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("code"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val codebooks = base.select(col("code"), explode(array((0 until 2).map {
        sp => struct(lit(sp).as("subspace"),
          slice(col("v"), sp * 16 + 1, 16).as("cvec"))
      }: _*)).as("sub"))
      .select(col("sub.subspace"), col("code"), col("sub.cvec"))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", codebooks,
      m = 2, dim = 32).select("vec_id", "code_csv")
    val out = Similarity.pqAdcTopK(codes, codebooks,
        emb.filter(col("vec_id") === 2L), "vec_id", "embedding",
        m = 2, k = 3, dim = 32)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("nbr_id")).take(2).toSeq == Seq(2L, 100L),
      "self and twin (identical codes, adist 0) rank first")
    assert(out.take(2).forall(
      _.getAs[Double]("adist") == 0.0))
    assert(out(2).getAs[Double]("adist") > 0.0)
  }

  test("randomProjection approximately preserves pairwise distances (JL)") {
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(emb, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[String]("proj_csv").split(",").map(_.toDouble)).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0 until 20; j <- (i + 1) until 20
      orig = d2(vecs(i)._2.map(_.toDouble), vecs(j)._2.map(_.toDouble))
      red = d2(proj(i.toLong), proj(j.toLong))
    } yield red / orig
    // ε ~ sqrt(ln n / k): generous bounds — the point is the projection
    // is a genuine isometry-up-to-ε, not a degenerate map
    assert(ratios.forall(r => r > 0.25 && r < 2.5),
      s"distance ratios outside JL bounds: min=${ratios.min} max=${ratios.max}")
    // deterministic: two runs over different partitionings are identical
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.randomProjection(df, "vec_id", "embedding", 64, 16)
        .orderBy("vec_id").collect().map(_.getString(1)).toSeq
    assert(run(emb.repartition(1)) == run(emb.repartition(5, col("vec_id"))))
  }

  test("kmeansFitInt8 is invariant to input partitioning (deterministic fit)") {
    val emb = mkClustered
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansFitInt8(df, "vec_id", "embedding", k = 4, iters = 2)
        .collect().map(_.toString).toSeq
    val a = run(emb.repartition(1))
    val b = run(emb.repartition(7, col("vec_id")))
    assert(a == b, "fit must not depend on partitioning/summation order")
  }

  test("semDeDup: one representative per duplicate group, min-id rep, spine complete") {
    // three planted cliques (scaled copies preserve direction → cosine 1)
    // plus two singletons that must survive untouched
    val rnd = new scala.util.Random(11)
    def v() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val g1 = v(); val g2 = v(); val g3 = v()
    val rows = Seq(
      (1L, g1), (2L, g1.map(_ * 1.01f)), (3L, g1.map(_ * 0.99f)),
      (10L, g2), (11L, g2.map(_ * 1.02f)),
      (20L, g3), (21L, g3.map(_ * 1.01f)), (22L, g3.map(_ * 0.98f)),
      (30L, v()), (31L, v()))
    val emb = rows.toDF("vec_id", "embedding")
    val r = Similarity.semDeDup(emb, "vec_id", "embedding",
      threshold = 0.999, nCells = 4, nProbe = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSet
    assert(r.map(_._1) == rows.map(_._1).toSet, "every input row present")
    val keeps = r.filter(_._3).map(_._1)
    assert(keeps.contains(1L) && keeps.contains(10L) && keeps.contains(20L),
      s"min id kept per clique: $keeps")
    assert(keeps.contains(30L) && keeps.contains(31L), "singletons kept")
    assert(r.filter(t => Set(2L, 3L).contains(t._1)).forall(t => t._2 == 1L && !t._3))
    assert(r.filter(t => t._1 == 11L).forall(t => t._2 == 10L && !t._3))
    assert(r.filter(t => Set(21L, 22L).contains(t._1)).forall(t => t._2 == 20L && !t._3))
  }

  test("hardNegativesTopK never returns the anchor's own label") {
    val emb = mkClustered
      .withColumn("label", (col("vec_id") % 10).cast("int"))
    val queries = emb.filter(col("vec_id") < 10)
    val r = Similarity.hardNegativesTopK(
      emb, queries, "vec_id", "embedding", "label", k = 5).collect()
    assert(r.length == 50, s"10 anchors × 5 = ${r.length}")
    assert(r.forall(x => x.getInt(1) != x.getInt(3)),
      "anchor_label must differ from nbr_label on every row")
    // negatives are the HARDEST available: each anchor's top negative
    // must score at least as high as its 5th
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.values.forall { rs =>
      val sorted = rs.sortBy(_.getInt(5))
      sorted.map(_.getDouble(4)).sliding(2).forall(p => p(0) >= p(1))
    })
  }

  test("mmrSelect diversifies: picks k distinct vectors, redundancy penalized") {
    // planted geometry with hand-computable scores (λ=0.5):
    //   c1 (cos 0.90 to q) wins step 1; its exact-direction twin c2
    //   scores 0.5·0.9 − 0.5·1.0 = −0.05 at step 2, losing to the
    //   moderately-relevant-but-different c3 (0.5·0.85 − 0.5·0.535 =
    //   0.157) and even to the orthogonal c4 (0.0) — plain top-3
    //   would take (c1, c2, c3); MMR must take (c1, c3, c4)
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),          // the anchor
      (1L, Array(0.9f, 0.436f, 0.0f, 0.0f)),        // c1: most relevant
      (2L, Array(0.909f, 0.44036f, 0.0f, 0.0f)),    // c2 = 1.01·c1 (twin)
      (3L, Array(0.85f, -0.527f, 0.0f, 0.0f)),      // c3: relevant, distinct
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)))          // c4: orthogonal
    val emb = rows.toDF("vec_id", "embedding")
    val anchor = emb.filter(col("vec_id") === 0L)
    val picks = Similarity.mmrSelect(emb, anchor, "vec_id", "embedding",
        k = 3, poolSize = 4, lambda = 0.5)
      .orderBy("pick").collect().map(_.getLong(2))
    assert(picks.toSeq == Seq(1L, 3L, 4L),
      s"expected diversified (1, 3, 4), got ${picks.toSeq}")
  }

  test("asymmetricBinaryTopK: the sign-matched twin outranks sign-mismatched corpus") {
    // corpus of distinct sign patterns + a twin of vector 0 (same
    // signs, scaled): the max of Σ q_j·s_j over sign patterns s is
    // attained exactly at s = sign(q), so the twin must rank first
    val mk = (seed: Int) => Array.tabulate(64) { d =>
      (((seed * 31 + d * 7) % 13) - 6).toFloat + (if (((seed + d) % 2) == 0) 0.5f else -0.5f)
    }
    val rows = (0 until 20).map(i => (i.toLong, mk(i))) :+
      (100L, mk(0).map(_ * 1.01f))
    val emb = rows.toDF("vec_id", "embedding")
    val signs = Similarity.binarySignBits(emb, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val top = Similarity.asymmetricBinaryTopK(signs, queries, k = 3)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) == 100L,
      s"twin must rank first, got ${top.map(_.getLong(1)).toSeq}")
  }

  test("kcenterSelect covers well-separated clusters one pick each") {
    // three tight clusters far apart + the seed's cluster: farthest-
    // first must visit a NEW cluster every step (the 2-approximation
    // geometry), never two picks from one cluster while another is
    // uncovered.
    val rows = (0 until 4).flatMap { c =>
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 10.0f * (c + 1)
      (0 until 5).map { j =>
        val v = base.clone(); v(c * 2 + 1) = j * 0.01f
        (c * 10L + j, v)
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
    val picks = Similarity.kcenterSelect(emb, "vec_id", "embedding", k = 4)
      .orderBy("step").collect()
    val clusters = picks.map(_.getLong(1) / 10L).toSet
    assert(clusters == Set(0L, 1L, 2L, 3L),
      s"expected one pick per cluster, got ${picks.map(_.getLong(1)).toSeq}")
    assert(picks.head.isNullAt(2) && picks.head.getLong(1) == 0L)
  }

  test("pqRerankTopK final order is exact within the shortlist") {
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    val base = emb.orderBy("vec_id").limit(8)
      .withColumn("code", row_number().over(w) - 1)
      .select(col("code"), transform(col("embedding"), _.cast("double")).as("v"))
    val codebooks = base.select(col("code"), explode(array((0 until 4).map {
        sp => struct(lit(sp).as("subspace"),
          slice(col("v"), sp * 2 + 1, 2).as("cvec"))
      }: _*)).as("sub"))
      .select(col("sub.subspace"), col("code"), col("sub.cvec"))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", codebooks,
      m = 4, dim = 8).select("vec_id", "code_csv")
    val queries = emb.filter(col("vec_id") < 3)
    val got = Similarity.pqRerankTopK(codes, codebooks, emb, queries,
        "vec_id", "embedding", m = 4, kShort = 10, k = 3, dim = 8)
      .orderBy("query_id", "rank").collect()
    // within each query: ranks strictly ordered by exact distance, and
    // a corpus-member query's rank-1 is itself (exact dist 0)
    got.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val dists = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(dists == dists.sorted, s"query $q reranked out of order")
      val r1 = rs.minBy(_.getInt(3))
      assert(r1.getLong(1) == q && r1.getDouble(2) == 0.0,
        s"query $q rank-1 should be its own exact match")
    }
  }

  test("ivfSq8TopK: recall@5 ≥ 0.7 on clustered vectors; self is rank 1") {
    val emb = mkClustered.cache()
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ids 0..9 are one per planted cluster → the smallest-id seeds
    // give one coarse cell per cluster
    val got = Similarity.ivfSq8TopK(emb, queries, "vec_id", "embedding",
      dim = dim, nSeeds = 10, k = 5, nProbe = 3)
      .collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force self-excludes; drop self-pairs before comparing
    val nonSelf = pairs.filterNot { case (q, n) => q == n }
    val recall = (bf & nonSelf).size.toDouble / bf.size
    assert(recall >= 0.7, s"recall=$recall")
    // the query is a corpus member: its own (near-zero recon) distance
    // must win rank 1
    (0L until 10L).foreach { q =>
      val r1 = got.filter(_.getLong(0) == q).minBy(_.getInt(3))
      assert(r1.getLong(1) == q, s"query $q rank-1 is ${r1.getLong(1)}")
    }
  }

  test("sq8Calibrated: codes bounded, outlier saturates without crushing other dims") {
    import org.apache.spark.sql.functions._
    // 40 well-behaved vectors in [-1,1]^4, plus one with a wild dim-0
    val rnd = new scala.util.Random(7)
    // enough mass that p99 excludes the single planted outlier
    val base = (0 until 300).map { i =>
      (i.toLong, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val wild = (999L, Array(1e6.toFloat, 0.1f, 0.2f, 0.3f))
    val df = (base :+ wild).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .sq8Calibrated(df, "vec_id", "embedding", dim = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    val codes = out.map { case (id, csv, _) => id -> csv.split(",").map(_.toInt) }.toMap
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // the wild coordinate clamps to the top code...
    assert(codes(999L)(0) == 255)
    // ...and the outlier vector's OTHER dims still quantize mid-range
    // (per-vector max-abs scaling would have crushed them to ~0)
    assert(codes(999L).drop(1).forall(c => c > 10 && c < 245),
      s"non-outlier dims crushed: ${codes(999L).toSeq}")
    // calibrated reconstruction stays tight inside the envelope; the
    // few base vectors between p99 and the max clamp, so bound the
    // 90th percentile rather than the max
    val errs = out.filter(_._1 != 999L).map(_._3).sorted
    assert(errs(errs.length * 9 / 10) < 0.01,
      s"p90 recon err ${errs(errs.length * 9 / 10)}")
  }

  test("clusterBalancedSample keeps exactly the per-cell quota, invariant to layout") {
    val emb = mkClustered.cache()
    val rows = Similarity.clusterBalancedSample(
      emb, "vec_id", "embedding", nCells = 10, denom = 4).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getLong(1))
    byCell.foreach { case (cell, rs) =>
      val n = rs.head.getLong(2)
      assert(rs.forall(_.getLong(2) == n), s"cell_n inconsistent in cell $cell")
      // kept rows = the quota exactly, with contiguous pick ranks
      assert(rs.length.toLong == math.max(1L, n / 4),
        s"cell $cell kept ${rs.length} of $n")
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).map(identity),
        s"pick ranks not contiguous in cell $cell")
    }
    // dense regions are thinned ~4x overall while every populated cell
    // keeps at least one representative
    assert(rows.length < 400 / 3 && byCell.nonEmpty)
    // deterministic under physical layout changes
    val re = Similarity.clusterBalancedSample(
        emb.repartition(7), "vec_id", "embedding", nCells = 10, denom = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(re == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet)
  }

  test("ivfBuildIndex parquet round trip searches identically to fused ivfTopK") {
    val emb = mkClustered.cache()
    val queries = emb.filter(col("vec_id") < 10)
    val direct = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nCells = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val (cents, assigned) =
      Similarity.ivfBuildIndex(emb, "vec_id", "embedding", nCells = 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    // production layout: assignments partitioned BY CELL so a probe
    // reads nProbe/nCells of the files
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assign")
    val viaIndex = Similarity.ivfSearchIndex(
        spark.read.parquet(s"$dir/cents"),
        spark.read.parquet(s"$dir/assign"),
        queries, "vec_id", "embedding", 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("ivfAppendIndex: appended rows are searchable after a parquet round trip") {
    val all = mkClustered.cache()
    // history builds the frozen index; the batch arrives later and
    // must land WITHOUT re-clustering — including exact twins of the
    // queries (vec_id+1000000), which search must then find at rank 1
    val hist = all.filter(col("vec_id") % 5 =!= 0)
    val queries = all.filter(col("vec_id") < 10)
    val batch = all.filter(col("vec_id") % 5 === 0).unionByName(
      queries.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val (cents, assigned) =
      Similarity.ivfBuildIndex(hist, "vec_id", "embedding", nCells = 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfapp")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assign")
    // the append: assign batch to the PERSISTED centroids, land next
    // to the existing files (same partition layout, no history rescan)
    Similarity.ivfAppendIndex(spark.read.parquet(s"$dir/cents"), batch,
        "vec_id", "embedding")
      .write.mode("append").partitionBy("cell").parquet(s"$dir/assign")
    val got = Similarity.ivfSearchIndex(
        spark.read.parquet(s"$dir/cents"),
        spark.read.parquet(s"$dir/assign"),
        queries, "vec_id", "embedding", 5, nProbe = 3)
    // (a) identical contract to a one-shot search over the union of
    // assignments (append ≡ assign-at-build for the same centroids)
    val direct = Similarity.ivfSearchIndex(cents,
        assigned.unionByName(
          Similarity.ivfAppendIndex(cents, batch, "vec_id", "embedding")),
        queries, "vec_id", "embedding", 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val gotSet = got.collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(gotSet == direct && gotSet.nonEmpty)
    // (b) every query's rank-1 neighbor is its batch-planted twin:
    // an identical vector has an identical centroid-similarity array,
    // so it lands in the query's first probe cell deterministically
    val rank1 = got.filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 10L).foreach { q =>
      assert(rank1(q) == q + 1000000L, s"query $q rank1=${rank1(q)}")
    }
  }

  test("hyperplane band index: parquet round trip probes identically; mismatched params rejected") {
    val hist = mkClustered.cache()
    // batch: near-identical copies (cosine 1.0) of every 4th vector +
    // negated copies (cosine -1, must never match)
    val batch = hist.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0005f)).as("embedding"))
      .unionByName(hist.filter(col("vec_id") % 9 === 0)
        .select((col("vec_id") + 2000L).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")))
    val direct = Similarity.lshCosineIncrementalPairs(hist, batch,
        "vec_id", "embedding", threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every planted near-copy must find its base; no negated vector may
    assert((0 until 400 by 4).forall(i =>
      direct.exists(p => p._1 == i + 1000L && p._2 == i.toLong)), direct.size.toString)
    assert(!direct.exists(_._1 >= 2000L))
    // the index persists: probing the parquet round trip is identical
    val idxDir = java.nio.file.Files.createTempDirectory("graft_hpidx")
    Similarity.hyperplaneBandBuckets(hist, "vec_id", "embedding", dim)
      .write.mode("overwrite").parquet(idxDir.toString)
    val persisted = spark.read.parquet(idxDir.toString)
    val viaIndex = Similarity.cosineProbeIndex(persisted, hist, batch,
        "vec_id", "embedding", threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == direct && direct.nonEmpty)
    // build params ride the artifact: a probe with a different seed or
    // geometry must fail loudly, not silently lose all recall
    val err = intercept[IllegalArgumentException] {
      Similarity.cosineProbeIndex(persisted, hist, batch,
        "vec_id", "embedding", threshold = 0.9, dim = dim, seed = 7L)
    }
    assert(err.getMessage.contains("never collide"), err.getMessage)
  }
}
