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
}
