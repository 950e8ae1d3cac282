package graft.operators

import org.apache.spark.sql.DataFrame
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
    * probabilistic recall). */
  def cosineDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = withNorm(graft.queries.Tables.spread(emb), idCol, vecCol)
    val a = e.select(col(idCol).as("id_a"), col(vecCol).as("v_a"), col("nrm").as("n_a"))
    val b = e.select(col(idCol).as("id_b"), col(vecCol).as("v_b"), col("nrm").as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(vec_dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** All pairs with cosine ≥ threshold via random-hyperplane LSH
    * banding — the 100-TB replacement for [[cosineDupPairs]]'s O(n²)
    * enumeration. Same output contract (id_a < id_b, rounded cosine);
    * candidate generation is a self-join keyed by (band, signature
    * band value) — O(corpus) shuffle, uniform keys — then the exact
    * cosine verify makes precision 1.0, so only recall (pairs whose
    * signatures collide in no band) is probabilistic. Recall rises
    * with `bands` and falls with band width `nbits/bands`. */
  def lshCosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int,
      nbits: Int = 16, bands: Int = 8, seed: Long = 42L): DataFrame = {
    require(nbits % bands == 0)
    val rows = nbits / bands
    val mask = (1L << rows) - 1
    val e = withNorm(graft.queries.Tables.spread(emb), idCol, vecCol)
      .withColumn("sig", hyperplaneSig(col(vecCol), dim, nbits, seed))
    val bandCols = array((0 until bands).map { i =>
      struct(lit(i).as("band"),
        shiftright(col("sig"), i * rows).bitwiseAND(lit(mask)).as("v"))
    }: _*)
    val buckets = e.select(
      col(idCol), col(vecCol), col("nrm"), explode(bandCols).as("b"))
      .select(col(idCol), col(vecCol), col("nrm"), col("b.band"), col("b.v"))
    val a = buckets.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      col("nrm").as("n_a"), col("band"), col("v"))
    val b = buckets.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      col("nrm").as("n_b"), col("band"), col("v"))
    a.join(b, Seq("band", "v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b", "n_a", "n_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine",
        round(vec_dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

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

  /** Random-hyperplane signature: bit i = sign(v · r_i) for `nbits`
    * fixed seeded hyperplanes. Hamming distance on signatures
    * approximates angular distance. Hyperplanes are literal arrays
    * (seeded, deterministic) — broadcast as constants into codegen. */
  def hyperplaneSig(vecCol: org.apache.spark.sql.Column, dim: Int, nbits: Int,
      seed: Long): org.apache.spark.sql.Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val bits: Seq[org.apache.spark.sql.Column] = planes.toSeq.zipWithIndex.map {
      case (p, i) =>
        val plane = array(p.map(x => lit(x)).toSeq: _*)
        when(vec_dot(vecCol, plane) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: candidates = corpus vectors sharing at
    * least one signature band with the query, exact cosine + top-k
    * within candidates.
    *
    * The scale path vs [[bruteForceTopK]]: bucket join is keyed by
    * (band, value) — O(corpus) shuffle, no cross product; recall is
    * tunable via nbits/bands. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, nbits: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    require(nbits % bands == 0)
    val rows = nbits / bands
    val mask = (1L << rows) - 1
    def sigBands(df: DataFrame, as: String): DataFrame = {
      val withSig = df.withColumn("sig", hyperplaneSig(col(vecCol), dim, nbits, seed))
      val bandCols = array((0 until bands).map { i =>
        struct(lit(i).as("band"),
          shiftright(col("sig"), i * rows).bitwiseAND(lit(mask)).as("v"))
      }: _*)
      withSig.select(col(idCol).as(as), col(vecCol), explode(bandCols).as("b"))
        .select(col(as), col(vecCol), col("b.band"), col("b.v"))
    }
    val cb = sigBands(graft.queries.Tables.spread(corpus), "nbr_id")
      .withColumnRenamed(vecCol, "v_c")
    val qb = sigBands(queries, "query_id")
      .withColumnRenamed(vecCol, "v_q")
    val cand = cb.join(qb, Seq("band", "v"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select("query_id", "v_q", "nbr_id", "v_c")
      .distinct()
    val scored = cand.withColumn("cosine", round(
      vec_dot(col("v_q"), col("v_c")) /
        (sqrt(vec_dot(col("v_q"), col("v_q"))) *
          sqrt(vec_dot(col("v_c"), col("v_c")))), 6))
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
    // deterministic sample: the nCells corpus vectors with smallest xxhash64(id)
    val centroids: Array[(Int, Array[Float])] = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy("h")
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

    def cellSims(v: org.apache.spark.sql.Column) = array(centroids.map {
      case (_, c) =>
        val cl = array(c.map(x => lit(x)).toSeq: _*)
        vec_dot(v, cl) / sqrt(lit(c.map(x => x.toDouble * x).sum))
    }.toSeq: _*)

    // corpus side: assign to the single nearest cell
    val withCell = graft.queries.Tables.spread(corpus)
      .withColumn("sims", cellSims(col(vecCol)))
      .withColumn("cell",
        expr("array_position(sims, array_max(sims))").cast("int") - 1)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("v_c"), col("cell"))

    // query side: probe the nProbe nearest cells
    val qProbes = queries
      .withColumn("sims", cellSims(col(vecCol)))
      .withColumn("probe_cells",
        expr(s"slice(array_sort(transform(sims, (s, i) -> struct(-s AS s, i AS i))), 1, $nProbe).i"))
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
        explode(col("probe_cells")).as("cell"))

    val scored = withCell.join(broadcast(qProbes), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(
        vec_dot(col("v_q"), col("v_c")) /
          (sqrt(vec_dot(col("v_q"), col("v_q"))) *
            sqrt(vec_dot(col("v_c"), col("v_c")))), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), round(col("cosine"), 4).as("cosine"),
        col("rank"))
  }
}
