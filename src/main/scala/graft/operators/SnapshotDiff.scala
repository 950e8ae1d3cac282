package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — "what changed between crawl v1 and v2":
  * added / removed / changed document ids, detected by comparing
  * content digests under a full-outer id join. The audit that gates a
  * retraining run (how much moved?) and drives incremental
  * downstream work (reprocess ONLY `added ∪ changed`, retract
  * `removed` — the [[Ivm]]/[[Cdc]] feeds come straight from this
  * output).
  *
  * Scale shape: digests are computed scan-side (md5 of the content
  * column — 16 bytes move per doc, never the text), then ONE id-keyed
  * full-outer sort-merge join; with both snapshots bucketed on the id
  * (CuratedOutput.writeBucketed) the join is exchange-free.
  * Unchanged rows — the overwhelming majority between adjacent
  * snapshots — are filtered before anything downstream. */
object SnapshotDiff {

  /** @return (id, status ∈ added|removed|changed) — unchanged ids
    *         are absent.
    *
    * Null content digests to a sentinel rather than propagating: a
    * null md5 is indistinguishable from "row absent" in the
    * full-outer join, so a doc present on both sides with null
    * content on one would misreport as added/removed (and null vs
    * null would pass as unchanged only by accident of `=!=`'s null
    * semantics). Presence is keyed on the id alone; content equality
    * on the non-null digest. */
  def diff(
      before: DataFrame, after: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    def digests(df: DataFrame, as: String) = df.select(
      col(idCol).as("id"),
      coalesce(md5(col(contentCol).cast("binary")), lit("<null-content>"))
        .as(as))
    digests(before, "h_before")
      .join(digests(after, "h_after"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_before").isNull, "added")
          .when(col("h_after").isNull, "removed")
          .when(col("h_before") =!= col("h_after"), "changed")
          .as("status"))
      .filter(col("status").isNotNull)
  }
}
