package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression TRAINING — the fastText-style
  * quality-classifier trainer behind t38's fixed-weight scorer
  * (train on labeled docs here, drop the learned weights into the
  * same map-only scoring plan). Full-batch gradient descent:
  *
  *   w_j ← w_j + lr · Σ_i round((y_i − σ(w·x_i)) · x_ij, 6) / n
  *
  * Deterministic by the same contract as the k-means fit (v13):
  *   - per-row gradient contributions round to 6 decimals BEFORE the
  *     sum, and the sum runs in DECIMAL (exact, associative) — the
  *     total is independent of partitioning/aggregation order;
  *   - σ(w·x) folds the dot product in ascending feature order
  *     (reproducible double arithmetic) and the weight update rounds
  *     to 6 decimals;
  *   - weights MATERIALIZE between iterations (a dim+1-sized driver
  *     model, like the k-means centroids) — per-iteration cost is
  *     exactly one corpus pass and lineage stays linear in `iters`.
  *
  * Scale shape per iteration: weights ride into the plan as a LITERAL
  * (broadcast-free — they are dim+1 doubles); scoring + gradient is
  * MAP-ONLY; the only exchange carries (feature, partial-decimal-sum)
  * states — dim+1 rows per partition, never the corpus.
  */
object Classifier {

  /** Fit weights over `vecCol: array<double>` (the caller includes
    * the bias as feature 0) against `labelCol` ∈ {0.0, 1.0}.
    * Returns (j, weight) — one row per coefficient. */
  def logregFit(
      features: DataFrame,
      labelCol: String,
      vecCol: String,
      iters: Int = 2,
      lr: Double = 0.5): DataFrame = {
    require(iters >= 1 && lr > 0, "iters and lr must be positive")
    val spark = features.sparkSession
    val dim = features.select(size(col(vecCol))).head().getInt(0)
    val data = features.select(
      col(labelCol).cast("double").as("y"),
      col(vecCol).as("x"))

    var w = Array.fill(dim)(0.0)
    for (_ <- 1 to iters) {
      val wLit = typedLit(w.toSeq)
      // σ(w·x): ordered fold over feature index — reproducible; at
      // w = 0 this is exactly 0.5 in both engines (no exp involved)
      val z = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
        (acc, j) => acc + element_at(wLit, j + 1) * element_at(col("x"), j + 1))
      val sigma = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
      val grads = data
        .withColumn("resid", col("y") - sigma)
        .select(posexplode(col("x")).as(Seq("j", "xj")), col("resid"))
        .withColumn("g", round(col("resid") * col("xj"), 6)
          .cast("decimal(18,6)"))
        .groupBy("j")
        .agg(sum("g").as("gsum"), count(lit(1)).as("n"))
        .collect()
      grads.foreach { r =>
        val j = r.getInt(0)
        val gsum = r.getDecimal(1).doubleValue()
        val n = r.getLong(2)
        w = w.updated(j, round6(w(j) + lr * gsum / n))
      }
    }
    spark.createDataFrame(
      java.util.Arrays.asList(
        w.zipWithIndex.map { case (wj, j) => Row(j, wj) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("j",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
