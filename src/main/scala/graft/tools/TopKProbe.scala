package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.top_k_rows

/** Measurement probe for the q62 TopKRows claim: per-key top-k via the
  * bounded-heap aggregate vs the row_number window formulation. The
  * aggregate's value is (a) no per-partition sort and (b) partial
  * aggregation — the exchange carries ≤ k rows per (mapper, key)
  * instead of every input row. Prints wall times and the exchange's
  * row reduction so SCALE.md can cite measured numbers.
  * `sbt "runMain graft.tools.TopKProbe [nRows] [nKeys] [k]"` */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nKeys = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic: key ~ xxhash-mod, score ~ another hash
    val df = spark.range(n)
      .select(col("id"),
        pmod(xxhash64(col("id")), lit(nKeys)).as("key"),
        pmod(xxhash64(col("id"), lit(1)), lit(1000000)).as("score"))
      .cache()
    df.count() // materialize

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%8.2f s   ($rows rows)")
    }

    val ord = (col("score") * lit(n) + col("id")).as("ord")

    time("window row_number<=k") {
      val w = Window.partitionBy("key")
        .orderBy(col("score").desc, col("id").asc)
      df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k).count()
    }
    time("top_k_rows aggregate") {
      df.select(col("key"), struct(ord, col("id")).as("s"))
        .groupBy("key").agg(top_k_rows(col("s"), k).as("top"))
        .select(explode(col("top"))).count()
    }
    // shuffle-volume argument: the window exchange moves n rows; the
    // partial aggregate's exchange moves ≤ mappers × keys × k
    val mappers = df.rdd.getNumPartitions
    println(s"window exchange rows:    $n")
    println(s"aggregate exchange rows: ≤ ${mappers.toLong * nKeys * k} " +
      s"($mappers mappers × $nKeys keys × $k)")
    spark.stop()
  }
}
