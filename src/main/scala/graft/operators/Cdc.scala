package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: replay an ordered feed of
  * insert/update/delete events onto a snapshot — the batch form of
  * the lakehouse "apply changes" operation (a Debezium/CDC topic
  * compacted into the next table version; the reference's
  * `ON CONFLICT DO UPDATE` accumulation generalized to deletes and
  * out-of-order arrival).
  *
  * Semantics: per key, only the LATEST change (max `ordCols`) wins —
  * intermediate versions never materialize. `D` removes the key;
  * `I`/`U` both upsert (idempotent replay: I-then-U and U-then-I
  * converge, matching change-feed at-least-once reality). Keys
  * untouched by the feed pass through.
  *
  * Scale shape: one window shuffle keyed on the CHANGE FEED (sized
  * by the delta, not the snapshot) + one anti-join + union on the
  * snapshot — the snapshot is never windowed. With the snapshot
  * bucketed on the key, the anti-join sort-merges exchange-free on
  * the big side (CuratedOutput.writeBucketed's layout contract).
  *
  * Contract: `ordCols` must totally order each key's changes (ties
  * would make the survivor arbitrary — feed a sequence number), and
  * every op must be one of I/U/D — a malformed op RAISES rather than
  * silently acting as a delete (the `op =!= 'D'` formulation this
  * replaced dropped null/unknown ops from the upsert set while still
  * anti-joining their keys out of the snapshot). */
object Cdc {

  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      opCol: String,
      ordCols: Seq[String]): DataFrame = {
    require(ordCols.nonEmpty, "applyChanges: ordCols must be non-empty")
    val w = Window.partitionBy(keyCol)
      .orderBy(ordCols.map(col(_).desc): _*)
    // validate ops up front — as a FILTER on the scan side, not a
    // projection: a projected raise_error is a deterministic
    // expression Catalyst may defer past the rn=1 filter, so
    // malformed ops on non-surviving rows could slip through. A
    // filter predicate below the window is evaluated per input row
    // (predicate pushdown keeps it scan-side), so EVERY row of a
    // poisoned feed fails loudly before any of it is applied.
    val op = upper(col(opCol))
    val checked = changes
      .filter(when(op.isin("I", "U", "D"), lit(true)).otherwise(
        raise_error(concat(
          lit(s"Cdc.applyChanges: op column '$opCol' must be I/U/D, got "),
          coalesce(col(opCol).cast("string"), lit("NULL")))).cast("boolean")))
      .withColumn("__op", op)
    val latest = checked
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val upserts = latest.filter(col("__op") =!= "D")
      .drop((Seq("__op", opCol) ++ ordCols): _*)
    snapshot
      .join(latest.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }
}
