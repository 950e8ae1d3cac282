package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.Sketch
import graft.queries.Tables

/** Measurement probe for the t62 CMS heavy-hitter claim: the sketch
  * prefilter's value is SHUFFLE VOLUME, not wall-clock on a laptop
  * corpus — the exact aggregate's input shrinks from every token
  * occurrence (vocabulary-sized key space) to candidate occurrences
  * only. This prints both wall times AND the candidate-occurrence /
  * distinct-key reductions so SCALE.md can cite measured numbers.
  * `sbt "runMain graft.tools.SketchProbe <docsParquet> [denom]"` */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/documents.parquet")
    val denom = args.drop(1).headOption.map(_.toLong).getOrElse(500L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the driver's synthetic docs have a ~31-type template vocabulary —
    // no tail to prune. Real web corpora carry a huge singleton tail
    // (Heap's law), which is exactly what the sketch prunes; model it
    // with nTail deterministic unique tokens (arg 3, default 2M).
    val nTail = args.drop(2).headOption.map(_.toLong).getOrElse(2000000L)
    val real = Tables.spread(spark.read.parquet(path))
      .select(explode(tokens(col("text"))).as("token"))
    val toks = real.union(
      spark.range(nTail).select(concat(lit("u"), col("id")).as("token")))
      .cache()
    val total = toks.count()
    val threshold = (total + denom - 1) / denom
    println(s"occurrences=$total threshold=$threshold (1/$denom)")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warmup (codegen + cache materialization already done by count)
    val nNaive = time("naive exact (warm)") {
      toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= threshold).count()
    }
    val width = math.max(256L, 8L * denom).toInt
    val nCms = time("cms prefilter + exact") {
      Sketch.heavyHitters(toks, "token", threshold, depth = 4, width = width)
        .count()
    }
    require(nNaive == nCms, s"lossless contract broken: $nNaive != $nCms")

    // the scale numbers: what reaches the exact aggregate
    val vocab = toks.select("token").distinct().count()
    val grid = Sketch.gridOf(toks, "token", 4, width)
    val candOcc = toks.filter(
      Sketch.estimate("token", grid, 4, width) >= threshold).count()
    val candKeys = toks.filter(
        Sketch.estimate("token", grid, 4, width) >= threshold)
      .select("token").distinct().count()
    println(s"distinct tokens (naive agg key space) = $vocab")
    println(s"heavy hitters = $nNaive")
    println(s"prefilter passes: occurrences $candOcc / $total, " +
      s"agg keys $candKeys / $vocab")
    println(f"key-space reduction = ${vocab.toDouble / math.max(1L, candKeys)}%.0fx")
  }
}
