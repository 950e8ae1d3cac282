package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage breakdown of the winnowed pair join (diagnosis aid
  * for the WinnowProbe measurement). */
object WinnowProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    val docs = (0 until 4).map { r =>
      base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _).cache()
    println("n=" + docs.count())
    def timed[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1fs -> $a")
    }
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text")
    timed("fps count")(fps.count())
    val fpx = fps.select(col("doc_id"), explode(col("fps")).as("fp")).cache()
    timed("fp explode count")(fpx.count())
    timed("fp distinct")(fpx.select("fp").distinct().count())
    timed("max freq")(fpx.groupBy("fp").count().agg(max("count")).collect()(0).toString)
    val a = fpx.select(col("doc_id").as("doc_a"), col("fp"))
    val b = fpx.select(col("doc_id").as("doc_b"), col("fp"))
    timed("join volume")(a.join(b, Seq("fp")).count())
    timed("pair agg")(a.join(b, Seq("fp")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1))).count())
    spark.stop()
  }
}
