package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.portableTokenHash60

/** Count–min sketch heavy-hitter mining (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1)).
  *
  * The 100-TB problem this solves: finding all tokens above a corpus
  * frequency threshold with a plain `groupBy(token).count()` shuffles
  * the ENTIRE vocabulary — billions of distinct keys, most of them
  * singletons that can never reach the threshold. The CMS pass
  * replaces that with a depth×width counter grid (a few KB) whose
  * estimate NEVER under-counts, so filtering the token stream on
  * `estimate ≥ threshold` before the exact aggregation provably drops
  * no true heavy hitter — the exact agg then shuffles only candidate
  * occurrences (heavy tokens + the sketch's bounded false-positive
  * mass), not the vocabulary.
  *
  * Determinism/portability: bucket hashes are the repo's portable
  * md5-prefix scheme (`portableTokenHash60`), so a DuckDB oracle can
  * rebuild the identical sketch; and because the prefilter is lossless
  * for true heavy hitters and the verify is exact, the OUTPUT is
  * byte-identical to the naive exact answer — the sketch changes cost,
  * never results.
  */
object Sketch {

  /** Bucket id of `tok` in CMS row `r`: md5 over the row-salted token,
    * 60-bit prefix, mod `width` — nonnegative in any engine. */
  private def bucket(r: Int, tok: Column, width: Int): Column =
    portableTokenHash60(concat(lit(s"${r}_"), tok)) % width

  /** The depth×width counter grid over a token-occurrence stream:
    * each occurrence increments one bucket per row. ONE
    * map-side-combined aggregate with depth·width distinct keys
    * (uniform by construction — md5 buckets), so the shuffle carries
    * ~depth·width·partitions pre-aggregated states, not occurrences.
    *
    * @param toks one row per token OCCURRENCE (not distinct)
    * @return (r, b, c): counter value per grid cell */
  def cmsCounts(
      toks: DataFrame,
      tokenCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame =
    toks.select(explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"), bucket(r, col(tokenCol), width).as("b"))
      }: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Exact heavy hitters with a CMS prefilter: every token whose TRUE
    * occurrence count is ≥ `threshold`, with its exact count.
    *
    * Three stages:
    *  1. [[cmsCounts]] — one tiny-keyed aggregate over the stream;
    *  2. the grid (depth·width longs — KBs) collects to the driver and
    *     embeds in the plan as a literal lookup array (the IVF-centroid
    *     broadcast-model pattern): the prefilter
    *     `min_r grid[r][bucket_r(tok)] ≥ threshold` is then a pure
    *     map-side expression, codegen'd, no join, no UDF;
    *  3. exact `groupBy(token).count()` over SURVIVING occurrences
    *     only, re-filtered on the true count (kills the sketch's false
    *     positives — CMS over-counts, never under-counts, so nothing
    *     true is lost and nothing false survives).
    *
    * Output ordered (cnt DESC, token) — a total order. */
  def heavyHitters(
      toks: DataFrame,
      tokenCol: String,
      threshold: Long,
      depth: Int = 4,
      width: Int = 256): DataFrame =
    exactOverGrid(toks, tokenCol, collectGrid(toks, tokenCol, depth, width),
      threshold, depth, width)

  /** [[heavyHitters]] with a RELATIVE threshold: every token whose
    * count is ≥ 1/`denom` of total occurrences (`denom` = 500 → ≥
    * 0.2%). The total comes from the sketch itself — each occurrence
    * increments exactly one bucket of row 0, so row 0 sums to the
    * stream length — no extra corpus scan for sizing.
    *
    * Width auto-sizes to 8·denom (min 256) when not given: a bucket's
    * expected tail mass is total/width, so width must comfortably
    * exceed denom (= total/threshold) or EVERY bucket crosses the
    * threshold and the prefilter saturates (passes everything —
    * measured on a 2M-singleton-tail stream at width 256/denom 500:
    * zero pruning; at width 4000: tail fully pruned). Grid stays
    * KB-scale: 4×8·denom longs. */
  def heavyHittersRelative(
      toks: DataFrame,
      tokenCol: String,
      denom: Long,
      depth: Int = 4,
      width: Int = 0): DataFrame = {
    val w = if (width > 0) width else math.max(256L, 8L * denom).toInt
    val flat = collectGrid(toks, tokenCol, depth, w)
    val total = flat.take(w).sum
    exactOverGrid(toks, tokenCol, flat, (total + denom - 1) / denom,
      depth, w)
  }

  /** Collects the grid to a flat depth·width array (cell (r,b) at
    * index r·width+b; absent cells 0) — KBs, the broadcast-model
    * pattern. */
  private def collectGrid(
      toks: DataFrame, tokenCol: String, depth: Int, width: Int): Array[Long] = {
    val grid = cmsCounts(toks, tokenCol, depth, width).collect()
      .map(r => (r.getInt(0).toLong * width + r.getLong(1), r.getLong(2)))
      .toMap
    Array.tabulate(depth * width)(i => grid.getOrElse(i.toLong, 0L))
  }

  /** The map-side estimate column over a collected grid (plan
    * literal): `min_r grid[r][bucket_r(tok)]`. */
  private[graft] def estimate(
      tokenCol: String, flat: Array[Long], depth: Int, width: Int): Column = {
    // literal flat array in the plan: element_at is 1-based
    val gridLit = array(flat.map(lit(_)): _*)
    (0 until depth).map { r =>
      element_at(gridLit, (lit(r.toLong * width) +
        bucket(r, col(tokenCol), width)).cast("int") + 1)
    }.reduce(least(_, _))
  }

  /** Exposes [[collectGrid]] for probes/incremental callers. */
  private[graft] def gridOf(
      toks: DataFrame, tokenCol: String, depth: Int, width: Int): Array[Long] =
    collectGrid(toks, tokenCol, depth, width)

  private def exactOverGrid(
      toks: DataFrame,
      tokenCol: String,
      flat: Array[Long],
      threshold: Long,
      depth: Int,
      width: Int): DataFrame = {
    val est = estimate(tokenCol, flat, depth, width)
    toks.filter(est >= threshold)
      .groupBy(col(tokenCol).as("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Log₂-histogram quantile sketch — bounded-state percentiles for
    * streaming dashboards and corpus-scale profiling.
    *
    * The 100-TB / streaming problem: exact percentiles need a
    * per-key sort (batch) or unbounded per-key state (streaming). A
    * log₂ histogram needs ≤ 64 counters per key, is mergeable by
    * simple addition (map-side combinable; the SAME aggregation runs
    * under a streaming `groupBy(window, key, bin).count` with
    * bounded state), and answers any quantile within one power-of-two
    * bucket — the right contract for latency/value dashboards.
    *
    * Determinism: the bin of an integer `cents` value is
    * `length(bin(cents))` = ⌊log₂⌋+1 — STRING length of the binary
    * representation, exact in any engine. A float `log2()` would not
    * be: Spark computes log(x)/log(2), which can land on either side
    * of an integer at exact powers of two. The quantile walk compares
    * exact integer products (`cum·100 ≥ q·total`), so the selected
    * bin is bit-reproducible.
    *
    * Contract: values must be ≥ 1 (clamp with greatest(x, 1) at the
    * call site). A negative value's 64-char two's-complement binary
    * string gives bin 64, where the 2^bin−1 upper bound hits
    * engine-divergent shift semantics (Spark wraps the shift count
    * mod 64; DuckDB saturates to 0). */
  def logBin(cents: Column): Column = length(bin(cents))

  /** Per-key quantile bins from one histogram pass: for each
    * percentage q in `qs`, the smallest bin whose cumulative count
    * reaches q% of the key's total, plus that bin's inclusive upper
    * bound in value units (2^bin − 1). Cost: ONE keyed aggregation
    * (≤ 64 rows per key) + windows over those tiny per-key
    * histograms — the corpus-sized input is touched exactly once. */
  def logHistQuantiles(
      df: DataFrame, keyCols: Seq[String], centsCol: String,
      qs: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 100))
    val keys = keyCols.map(col)
    val h = df.select((keys :+ logBin(col(centsCol)).as("bin")): _*)
      .groupBy((keys :+ col("bin")): _*).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(keyCols.map(col): _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCols.map(col): _*)
    val cum = h
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(wTot))
    val aggs = qs.flatMap { q =>
      val b = min(when(col("cum") * 100 >= col("total") * q, col("bin")))
        .as(s"p${q}_bin")
      Seq(b)
    } :+ max("total").as("n")
    val out = cum.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    qs.foldLeft(out) { (d, q) =>
      d.withColumn(s"p${q}_hi_cents",
        expr(s"shiftleft(CAST(1 AS BIGINT), p${q}_bin) - 1"))
    }
  }

  /** Persisted mergeable distinct-count sketches (DataSketches HLL,
    * Spark's native `hll_sketch_agg` family) — the incremental-rollup
    * discipline for 100 TB: sketch each fine grain ONCE (here
    * day×rollup), persist the ~2^lgK-byte binaries, and answer any
    * coarser window by unioning sketches — never rescanning raw data.
    * A month's distinct-user count becomes a read of ≤ 31 KB-sized
    * rows per group; a trailing-90-day dashboard is a 90-row union.
    * The union is associative/commutative, so partial aggregation and
    * arrival order don't change the answer for a FIXED input set —
    * but a merged union is NOT bit-identical to a direct one-pass
    * sketch of the same stream (measured: 5001 vs 5018 on 5k true
    * distinct, both within ±0.4%): callers comparing across rollup
    * paths must compare estimates within the HLL error envelope, not
    * for equality. */
  def hllDailySketches(
      df: DataFrame, grain: Column, rollup: Column, key: Column,
      lgK: Int = 14): DataFrame =
    df.groupBy(grain.as("grain"), rollup.as("rollup"))
      .agg(hll_sketch_agg(key, lit(lgK)).as("sketch"),
        count_distinct(key).as("n_exact_grain"))

  /** Coarse-grain estimates from persisted fine-grain sketches: one
    * tiny shuffle of pre-aggregated sketch rows, no raw-data scan. */
  def hllRollupEstimate(daily: DataFrame): DataFrame =
    daily.groupBy("rollup")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_distinct"))
}
