package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pack

/** Scaling probe for the distributed prefix-sum packer and the
  * single-pass RepStats expression: synthetic rows at 1M/10M/50M,
  * wall time per stage. Validates SCALE.md's claims that (a) packBins
  * is two partition-local scans + one range shuffle with O(#partitions)
  * driver state — near-linear in rows; (b) RepStats throughput is a
  * per-row constant (the map stage IS the whole cost).
  * `sbt "runMain graft.tools.PackScaleProbe [maxRows]"` */
object PackScaleProbe {
  def main(args: Array[String]): Unit = {
    val maxRows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  out=$n")
    }

    for (n <- Seq(1000000L, 10000000L, maxRows).distinct.filter(_ <= maxRows)) {
      // unsorted ids, skewed weights (zipf-ish via mod composition)
      val df = spark.range(n)
        .select(
          (col("id") * 2654435761L % n).as("doc_id"),
          (col("id") % 997 + (col("id") % 31) * 64 + 1).as("w"))
      time(f"packBins n=$n%,d") {
        Pack.packBins(df, "doc_id", "w", capacity = 8192L).count()
      }
    }

    // RepStats: 1M synthetic ~80-token docs
    val words = (0 until 500).map(i => s"tok$i")
    val docs = spark.range(1000000L).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 80).map(j =>
        element_at(
          array(words.map(lit): _*),
          (pmod(col("id") * (j + 7) + j, lit(500)) + 1).cast("int"))): _*).as("text"))
      .cache()
    docs.count()
    time("rep_stats 1M x 80tok") {
      docs.select(graft.functions.HashFunctions.rep_stats(col("text")).as("rs"))
        .selectExpr("sum(rs.d_2grams)").collect()(0).getLong(0)
    }
    spark.stop()
  }
}
