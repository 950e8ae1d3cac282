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
  /** Ensure enough partitions before compute-heavy per-row stages
    * (shingling, hashing, dot products) — SIZED BY INPUT BYTES, capped
    * at `defaultParallelism`.
    *
    * The driver's testdata is single-row-group parquet, so a scan is
    * irreducibly ONE task — without this, a per-doc pipeline runs on 1
    * core. The round-13 optimization pass measured the OTHER failure
    * mode of the old fixed `repartition(defaultParallelism)`: at small
    * inputs, 32 concurrent near-empty tasks cost ~100–250 ms EACH on
    * this host (contention, not steal — the same query tier ran 10.4 s
    * at 8 cpus vs 13.1 s at 32 cpus in adjacent clean windows, and a
    * 32-task md5 stage over 1.5 MB of text billed 7.4 s of task time
    * for 0.3 s of wall). Partition count therefore derives from the
    * optimizer's size estimate — one compute task per
    * `graft.spread.targetBytesPerTask` (session conf, default 128 KB
    * of input per task: ~50–300 ms of shingle/hash work on text) — so
    * small inputs get few, full tasks. At production scale the
    * estimate is huge, the cap wins, and this is exactly the old
    * defaultParallelism spread (guide §2: derive partitioning from
    * input size, never a constant tuned for one deployment). Unknown
    * stats estimate as Long.MaxValue → cap, i.e. the conservative old
    * behavior. Column pruning and filter pushdown pass through
    * Repartition, so the scan stays pruned.
    *
    * Cost note: the `.rdd` probe plans the upstream query once (tens of
    * ms on the simple scans these operators take). The alternative — an
    * unconditional repartition — would shuffle the full input at
    * production scale, which is exactly what the guard exists to
    * prevent; the probe is the cheaper side of that trade everywhere
    * this is used. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val targetBytes = math.max(1L,
      df.sparkSession.conf.get("graft.spread.targetBytesPerTask",
        (128L * 1024).toString).toLong)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (bytes / targetBytes + 1).min(BigInt(p)).max(BigInt(1)).toInt
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
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
