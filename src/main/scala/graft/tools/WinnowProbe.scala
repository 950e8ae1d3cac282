package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures the winnowing sketch's index-volume and pair-join savings
  * vs full shingling on a duplicated corpus (SCALE.md evidence for the
  * t34/t36 claims). Corpus: sf documents replicated R× with planted
  * near-dups, so pair-generation has real work to do.
  * `sbt "runMain graft.tools.WinnowProbe [sfDir] [replicas]"` */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.queries.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = (0 until replicas).map { r =>
      base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _).cache()
    val n = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // index volumes: rows entering the pair-join on each path
    val shingleRows = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("sh")).count()
    val fpRows = Dedup.winnowingFingerprints(docs, "doc_id", "text")
      .select(explode(col("fps"))).count()

    val (nShinglePairs, tShingle) = timed(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3).count())
    val (nWinnowPairs, tWinnow) = timed(
      Dedup.winnowedPairs(docs, "doc_id", "text", minShared = 2).count())
    val (nCapped, tCapped) = timed(
      Dedup.winnowedPairs(docs, "doc_id", "text", minShared = 2,
        maxFpFreq = 100).count())

    println(f"docs=$n shingle_index_rows=$shingleRows fp_index_rows=$fpRows " +
      f"density=${fpRows.toDouble / shingleRows}%.3f")
    println(f"jaccard_pairs=$nShinglePairs in $tShingle%.1fs ; " +
      f"winnowed_pairs=$nWinnowPairs in $tWinnow%.1fs ; " +
      f"winnowed_cap100=$nCapped in $tCapped%.1fs")
    // recall of the capped sketch on the known duplicate pairs
    // (replicas of the same base doc share full text)
    val truePairs = nShinglePairs
    println(s"true_jaccard_pairs=$truePairs (capped sketch must still cover replicas)")
    spark.stop()
  }
}
