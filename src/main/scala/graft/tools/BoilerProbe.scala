package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.queries.Tables

/** Boilerplate-corpus probe: every doc shares a boilerplate suffix, so
  * the full inverted index's join volume is Σf² ≈ 43e9 rows
  * (infeasible) while the prefix filter excludes the ubiquitous
  * shingles from the index entirely. Compares prefix-filtered exact
  * Jaccard vs MinHash LSH only — deliberately NOT the full index.
  * `sbt "runMain graft.tools.BoilerProbe <docsParquet>"` */
object BoilerProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/docs_boiler.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.spread(spark.read.parquet(path)).cache()
    println(s"docs=${docs.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  out=$n")
    }
    time("prefix-filter exact (t=0.8)") {
      Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 3, threshold = 0.8).count()
    }
    time("minhash lsh (t=0.8)") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, threshold = 0.8).count()
    }
    spark.stop()
  }
}
