package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Classifier-evaluation metrics over corpus-scale score tables —
  * the measurement loop for quality filters (t38/t46): a filter
  * whose score can't separate the classes is just deleting data at
  * random, and AUC is the threshold-free way to know.
  *
  * Exact ROC-AUC via the tie-corrected Mann–Whitney rank identity:
  * AUC = (Σ midranks(pos) − n₊(n₊+1)/2) / (n₊·n₋), where tied scores
  * share their group's MIDRANK (average positional rank) — the
  * standard value, equal to P(s₊>s₋) + ½P(s₊=s₋), unbiased for
  * coarse/discrete scores (an id tie-break instead deterministically
  * skews the value whichever way ids correlate with labels). The
  * global rank is t80's distributed-ranking discipline —
  * range-repartition + in-partition sort + `zipWithIndex` — NEVER a
  * single-partition window (the textbook `row_number() OVER (ORDER
  * BY score)` pulls the whole corpus through one task). Midranks
  * need no join-back: positional ranks within a score group are
  * consecutive, so the group's midrank is (min+max)/2 and
  * Σ midranks(pos) folds into one groupBy(score) aggregate. */
object Eval {

  /** Precision/recall/F1 at a threshold sweep — the operating-point
    * table behind choosing a filter cutoff. ONE corpus pass: each
    * threshold is a conditional-sum aggregate column (no row
    * inflation), unpivoted to a row per threshold afterwards. */
  def prCurve(
      scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "prCurve: need at least one threshold")
    val s = scored.select(col(scoreCol).cast("double").as("sc"),
      col(labelCol).cast("boolean").as("pos"))
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(col("sc") >= t && col("pos"), 1L).otherwise(0L))
          .as(s"tp_$i"),
        sum(when(col("sc") >= t && !col("pos"), 1L).otherwise(0L))
          .as(s"fp_$i"),
        sum(when(col("sc") < t && col("pos"), 1L).otherwise(0L))
          .as(s"fn_$i"))
    }
    val wide = s.agg(aggs.head, aggs.tail: _*)
    val rows = explode(array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"tp_$i").as("tp"),
        col(s"fp_$i").as("fp"), col(s"fn_$i").as("fn"))
    }: _*))
    wide.select(rows.as("r"))
      .select(col("r.threshold").as("threshold"), col("r.tp").as("tp"),
        col("r.fp").as("fp"), col("r.fn").as("fn"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)))
      .withColumn("recall", when(col("tp") + col("fn") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6)))
      .withColumn("f1", when(col("tp") * 2 + col("fp") + col("fn") > 0,
        round(col("tp").cast("double") * 2 /
          (col("tp") * 2 + col("fp") + col("fn")), 6)))
  }

  /** @return one row: (n_pos, n_neg, auc) */
  def rocAuc(
      scored: DataFrame, scoreCol: String, labelCol: String,
      idCol: String): DataFrame = {
    val s = scored.select(col(idCol).cast("long").as("id"),
      col(scoreCol).cast("double").as("sc"),
      col(labelCol).cast("boolean").as("pos"))
    val ranked = Ranking.globalRank(s, Seq(col("sc"), col("id")))
    // DECIMAL(38,0) for the rank identity: at true corpus scale
    // n₊·(n₊+1) and Σranks overflow Long (~4.3e9 positives / ~6.1e9
    // rows) and would wrap silently; the final division is the only
    // double step. Doubled midranks (n₊g·(rmin+rmax)) keep the sum
    // integral — the ÷2 folds into the closed form's denominator.
    val perScore = ranked.groupBy("sc").agg(
      min("r").as("rmin"), max("r").as("rmax"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("np_g"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("nn_g"))
    perScore.agg(
        sum(col("np_g").cast("decimal(38,0)") *
          (col("rmin") + col("rmax"))).as("rank_sum2"),
        sum("np_g").as("n_pos"),
        sum("nn_g").as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        // AUC = (2·Σmid − n₊(n₊+1)) / (2·n₊·n₋)
        round((col("rank_sum2") -
          col("n_pos").cast("decimal(38,0)") * (col("n_pos") + 1))
          .cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg")), 6)
          .as("auc"))
  }
}
