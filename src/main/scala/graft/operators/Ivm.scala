package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Incremental view maintenance for inner equi-joins — the classical
  * delta identity that keeps a 100 TB materialized join current
  * without ever re-joining base × base:
  *
  *   Δ(L ⋈ R) = ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR
  *
  * Each ingest cycle touches base tables only against the (small)
  * deltas: with |ΔL|,|ΔR| ≪ |L|,|R| the deltas broadcast, so the two
  * base-side terms are broadcast-hash joins over ONE scan of each
  * base (no shuffle of L or R), and the third term is delta × delta.
  * The maintained view is append-only here (inserts; for
  * updates/deletes compose with [[Cdc.applyChanges]] keyed on the
  * view row identity).
  *
  * The q77 gate proves the identity end-to-end: base join ∪ delta
  * terms ≡ a direct join of the updated tables (the oracle computes
  * the latter; Spark never does). */
object Ivm {

  /** The view delta for inserts (ΔL, ΔR) against bases (L, R). */
  def joinDelta(
      l: DataFrame, dl: DataFrame,
      r: DataFrame, dr: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta requires equi-join keys")
    broadcast(dl).join(r, keys)
      .unionByName(l.join(broadcast(dr), keys))
      .unionByName(dl.join(broadcast(dr), keys))
  }

  /** The maintained view after one cycle: previous view + delta. */
  def applyDelta(view: DataFrame, delta: DataFrame): DataFrame =
    view.unionByName(delta)

  /** Grouped count/sum aggregate delta with RETRACTIONS: the change
    * feed carries a multiplicity (+1 insert, −1 delete), so deletes
    * subtract without ever touching base rows — the streaming-SQL
    * retraction model in batch form. One aggregation of the DELTA
    * only. */
  def countSumDelta(
      delta: DataFrame, keys: Seq[String],
      multCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum}
    delta.groupBy(keys.map(col): _*)
      .agg(sum(col(multCol)).as("dn"),
        sum(col(multCol) * col(valueCol)).as("dsum"))
  }

  /** Merge an aggregate view (keys, n, total) with a
    * [[countSumDelta]] result. Groups whose count reaches zero
    * DISAPPEAR (full retraction), and delta-only groups appear — a
    * full-outer merge of two pre-aggregated (small) tables; the
    * corpus-sized input was touched only by the delta aggregation. */
  def applyCountSumDelta(view: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    view.join(deltaAgg, keys, "full_outer")
      .select(
        keys.map(col) ++ Seq(
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("total"), lit(0L)) +
            coalesce(col("dsum"), lit(0L))).as("total")): _*)
      .filter(col("n") > 0)
  }
}
