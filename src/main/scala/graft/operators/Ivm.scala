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
}
