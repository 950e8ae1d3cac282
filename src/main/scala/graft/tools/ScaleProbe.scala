package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.queries.Tables

/** Scaling probe for the dedup operators: run t07 (exact inverted
  * index) and t08 (MinHash LSH) on an arbitrary documents parquet and
  * report wall time + output size. Used to validate the growth claims
  * in SCALE.md (exact pair generation grows with candidate-pair count;
  * LSH stays near-linear in corpus size).
  * `sbt "runMain graft.tools.ScaleProbe <docsParquet>"` */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/documents.parquet")
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
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  out=$n")
    }
    // warmup tokenization/codegen
    time("warmup (exact dedup)") {
      Dedup.exactGroups(docs, "doc_id", "text").count()
    }
    time("t07 exact jaccard") {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3).count()
    }
    time("t08 minhash lsh") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, threshold = 0.3).count()
    }

    // optional second arg: embeddings parquet → exact vs LSH cosine pairs
    args.drop(1).headOption.foreach { embPath =>
      val emb = Tables.spread(spark.read.parquet(embPath)).cache()
      println(s"vecs=${emb.count()}")
      time("v02 exact cosine pairs") {
        graft.operators.Similarity
          .cosineDupPairs(emb, "vec_id", "embedding", 0.9).count()
      }
      time("v06 lsh cosine pairs") {
        graft.operators.Similarity
          .lshCosinePairs(emb, "vec_id", "embedding", 0.9, dim = 64).count()
      }
    }
    spark.stop()
  }
}
