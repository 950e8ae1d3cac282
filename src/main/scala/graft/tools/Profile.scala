package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.queries.Tables

/** Ad-hoc stage profiler for the heavy dedup/similarity plans.
  * Not part of the driver contract; run with
  * `sbt "runMain graft.tools.Profile <sfDir>"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String, reps: Int = 3)(f: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val secs = times.map(_._1).map(t => f"$t%6.2f").mkString(" ")
      println(f"${name}%-40s [$secs] s  rows=${times.last._2}")
    }

    val docs = Tables.spread(Tables.t(spark, dir, "documents")).cache()
    println(s"documents: ${docs.count()}  partitions: ${docs.rdd.getNumPartitions}")

    val sh = docs.select(col("doc_id"), wordShingles(col("text"), 3).as("sh"))
    time("shingles only (noop write)") {
      sh.write.mode("overwrite").format("noop").save(); 0L
    }
    val exploded = sh.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("shingle"))
    time("exploded count") { exploded.count() }

    val capped = exploded
      .withColumn("freq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("freq") <= 100).drop("freq")
    time("capped (window) count") { capped.count() }

    val a = capped.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("shingle"))
    val b = capped.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("shingle"))
    val joined = a.join(b, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
    val sizeOk = joined.filter(
      col("sz_a") * lit(10) >= col("sz_b") * lit(3) &&
      col("sz_b") * lit(10) >= col("sz_a") * lit(3))
    time("join rows (no size filter)") { joined.count() }
    time("join rows (size-ratio filter)") { sizeOk.count() }
    val pairs = sizeOk
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b").agg(count(lit(1)).as("inter"))
    time("t07 full (size filter)") { pairs.count() }

    // t02 text-quality stats (tokens + HOFs)
    val t02 = graft.queries.Registry.byName("t02_text_quality")
    time("t02 text_quality full") {
      t02.run(spark, dir).write.mode("overwrite").format("noop").save(); 0L
    }

    // t08 stages
    val withSig = docs.select(col("doc_id"), wordShingles(col("text"), 3).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 64, 42L))
    time("minhash signatures") {
      withSig.select("doc_id", "sig").write.mode("overwrite").format("noop").save(); 0L
    }
    val bands = 32; val rows = 2
    val bandHashes = array((0 until bands).map { bIdx =>
      xxhash64(lit(bIdx), slice(col("sig"), bIdx * rows + 1, rows))
    }: _*)
    val buckets = withSig.select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bh")))
    time("buckets count") { buckets.count() }
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("lsh candidates") { cand.count() }
    val sets = withSig.select(col("doc_id"), col("sh"))
    val verified = cand
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= 0.3)
    time("t08 verify step") { verified.count() }

    spark.stop()
  }
}
