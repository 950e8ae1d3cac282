package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: dump parquet page structure (offset index) of a file
  * written with parquet.page.row.count.limit, to verify the option
  * propagates and pages are small enough for column-index pruning. */
object PageDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft_pagedump")
    spark.range(1000000L).select(xxhash64(col("id")).as("k"))
      .sort("k").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "4096")
      .parquet(s"$dir/t")

    val f = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks
      println(s"file rows=${r.getRecordCount} rowGroups=${blocks.size()}")
      val b0 = blocks.get(0)
      val cc = b0.getColumns.get(0)
      val oi = r.readOffsetIndex(cc)
      println(s"rowGroup0 rows=${b0.getRowCount} pages=${
        if (oi == null) "NO OFFSET INDEX" else oi.getPageCount.toString}")
      val ci = r.readColumnIndex(cc)
      println(s"columnIndex present=${ci != null}")
      if (ci != null) {
        val mins = ci.getMinValues
        val maxs = ci.getMaxValues
        (0 until math.min(5, mins.size())).foreach { i =>
          def l(b: java.nio.ByteBuffer) =
            b.order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(0)
          println(s"  page $i min=${l(mins.get(i))} max=${l(maxs.get(i))}")
        }
      }
    } finally r.close()

    // parquet-level: does ColumnIndexFilter prune an In predicate on
    // this file, independent of Spark's reader integration?
    import org.apache.parquet.filter2.predicate.FilterApi
    val keys = new java.util.HashSet[java.lang.Long]()
    spark.range(0, 1000000L, 10000L).select(xxhash64(col("id")))
      .collect().foreach(r0 => keys.add(r0.getLong(0)))
    val pred = FilterApi.in(FilterApi.longColumn("k"), keys)
    val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
      .withRecordFilter(org.apache.parquet.filter2.compat.FilterCompat.get(pred))
      .build()
    val r2 = new org.apache.parquet.hadoop.ParquetFileReader(in, opts)
    try {
      var total = 0L
      var pages = 0L
      var store = r2.readNextFilteredRowGroup()
      while (store != null) {
        total += store.getRowCount
        store = r2.readNextFilteredRowGroup()
      }
      println(s"filtered rowcount via readNextFilteredRowGroup = $total (of 1000000, keys=${keys.size})")
      val _ = pages
    } finally r2.close()
    spark.stop()
  }
}
