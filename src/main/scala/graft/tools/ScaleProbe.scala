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
    time("t09 simhash") {
      Dedup.simhashPairs(docs, "doc_id", "text").count()
    }
    time("t11 prefix-filter (t=0.8)") {
      Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 3, threshold = 0.8).count()
    }
    time("t07 full index (t=0.8)") {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8).count()
    }

    // optional third arg: events parquet → as-of join + window family
    args.drop(2).headOption.foreach { evPath =>
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(evPath)
      val ev0 = (if (raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) else raw)
      val ev = Tables.spread(ev0).cache()
      println(s"events=${ev.count()}")
      time("asof join (union+window)") {
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("p_ts"))
          .agg(max("value").as("p_value"))
        val left = ev.filter(col("event_type") =!= "purchase")
          .select("event_id", "user_id", "ts", "event_type")
        graft.operators.AsofJoin.asofLeft(left, purchases,
          Seq("user_id"), "ts", "p_ts", Seq("p_ts", "p_value")).count()
      }
      time("sliding window agg") {
        ev.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)), sum("value")).count()
      }
      time("session window agg") {
        ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1))).count()
      }
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
