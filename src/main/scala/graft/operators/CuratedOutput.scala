package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Production output stage for curated training data: partitioned,
  * size-controlled parquet.
  *
  * At 100 TB the output layout IS the performance contract for every
  * downstream reader: partition columns give partition pruning
  * (`WHERE lang = 'en'` touches 1/N of files), and per-file row
  * targets prevent both the small-files problem (a file per task per
  * partition value) and unsplittable giants. The repartition by
  * partition columns + a salt bounded by `filesPerPartition` yields at
  * most that many files per partition value, each written by one task.
  */
object CuratedOutput {

  /** @param filesPerPartition max files per partition value — size to
    *        (partition rows / target file rows) for the corpus */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      filesPerPartition: Int = 1,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition >= 1)
    val salted =
      if (filesPerPartition == 1)
        df.repartition(partitionCols.map(col): _*)
      else
        df.repartition(
          (partitionCols.map(col) :+
            pmod(xxhash64(struct(df.columns.map(col): _*)),
              lit(filesPerPartition))): _*)
    salted.write
      .mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed parquet table — the co-located-join layout: two tables
    * bucketed by the same key into the same bucket count join WITHOUT
    * a shuffle on either side (Catalyst recognizes the bucketing as a
    * satisfied `HashPartitioning` and elides both Exchanges —
    * CuratedOutputSpec pins this). At 100 TB this converts every
    * recurring fact-fact join on the bucket key from the dominant
    * shuffle into a local zip of pre-sorted buckets; pay the layout
    * cost once at write time, win on every read.
    *
    * Catalog-table based (`saveAsTable` with an explicit path):
    * bucketing metadata lives in the catalog, which is what makes the
    * read-side optimization possible. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numBuckets >= 1)
    df.write
      .mode(mode)
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }
}
