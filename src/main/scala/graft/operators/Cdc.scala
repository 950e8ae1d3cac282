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
    // validate ops up front — scan-side, before the window shuffle,
    // so a poisoned feed fails loudly instead of half-applying
    val op = upper(col(opCol))
    val checked = changes.withColumn("__op",
      when(op.isin("I", "U", "D"), op).otherwise(raise_error(concat(
        lit(s"Cdc.applyChanges: op column '$opCol' must be I/U/D, got "),
        coalesce(col(opCol).cast("string"), lit("NULL"))))))
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
