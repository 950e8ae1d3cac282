package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the per-batch decode pipeline: times each stage
  * of what processBatch does so optimization targets are measured, not
  * guessed. `sbt "runMain graft.tools.DecodeProbe [nMsgs]"` */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cities = Seq("New York", "Baltimore", "San Francisco", "Austin", "Seattle")
    def evt(i: Long): String =
      s"""{"ip":"10.${i % 256}.1.2","event":"search_event_$i","properties":{"city":"${cities((i % 5).toInt)}","country":"USA"},"timestamp":"2015-12-12T19:11:0${i % 10}.249Z","type":"track","userId":"u${i % 1000}"}"""
    val f = Files.createTempDirectory("probe").resolve("b.jsonl")
    Files.writeString(f, (0L until n).map(evt).mkString("\n"))

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e6}%.0f ms"); r
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val raw = time("read text (1 file)") {
        val d = spark.read.text(f.toString).withColumnRenamed("value", "value")
        d.count(); d
      }
      val bridged = time("rdd bridge + cache + count") {
        val b = spark.createDataFrame(raw.toDF().rdd, raw.schema).cache()
        b.count(); b
      }
      val strings = bridged.select(col("value").cast("string").as("value")).as[String]
      val parsed = time("spark.read.json inference") {
        spark.read.option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(strings)
      }
      time("parsed.cache + count (parse pass)") { parsed.cache().count() }
      time("groupBy agg + collect") {
        parsed.groupBy("properties.city").agg(count(lit(1))).collect()
      }
      time("isEmpty on raw") { raw.isEmpty }
      parsed.unpersist(); bridged.unpersist()
    }
    spark.stop()
  }
}
