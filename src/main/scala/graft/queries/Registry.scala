package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query.
  *
  * @param name    stable key used by the driver's correctness gate
  * @param run     Spark implementation; `dir` is a testdata sf directory
  * @param oracle  equivalent DuckDB SQL over the same parquet tables
  *                (None for ops not expressible in ANSI SQL → the driver
  *                records a weaker rows-only check)
  * @param headline included in Bench timing runs
  * @param audit    exact-audit tier: benched in Bench's separate
  *                 `audit_queries` group (its cost is intrinsic to the
  *                 exact formulation — Σf² / all-pairs — and scales with
  *                 corpus duplicate density, so it must not dominate the
  *                 headline number the production tiers are judged on)
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    audit: Boolean = false)

object Tables {
  /** Ensure at least `defaultParallelism` partitions before
    * compute-heavy per-row stages (shingling, hashing, dot products).
    *
    * The driver's testdata is single-row-group parquet, so a scan is
    * irreducibly ONE task — without this, a per-doc pipeline runs on 1
    * of 32 cores. At production scale inputs arrive with ≥ parallelism
    * splits and this is a no-op (the guard avoids a pointless shuffle).
    * Column pruning and filter pushdown pass through Repartition, so
    * the scan stays pruned.
    *
    * Cost note: the `.rdd` probe plans the upstream query once (tens of
    * ms on the simple scans these operators take). The alternative — an
    * unconditional repartition — would shuffle the full input at
    * production scale, which is exactly what the guard exists to
    * prevent; the probe is the cheaper side of that trade everywhere
    * this is used. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** All reads go through here so pushdown/pruning behavior is uniform.
    *
    * `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some
    * fixture generations (which Spark 4 refuses to read natively) and
    * TIMESTAMP(MICROS) in others, so dispatch on the read schema:
    * nanos are read as a long and rebuilt with exact integer division
    * (a double division would lose precision on ~1.7e18
    * nanos-since-epoch values); native timestamps are cast to the
    * session type so downstream ops see one type either way. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}

/** Central registry consumed by SparkEntry / Verify / Bench. */
object Registry {
  def all: Seq[GraftQuery] =
    Relational.all ++ TextOps.all ++ VectorOps.all ++ MultimodalOps.all

  def byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
