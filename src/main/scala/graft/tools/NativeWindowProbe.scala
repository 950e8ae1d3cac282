package graft.tools

import org.apache.spark.sql.SparkSession

/** Throughput probe for the `handlers.NativeWindow` daemon — isolates
  * the knobs behind BENCH's `native_window_msgs_per_sec`:
  * state-partition count (spark.sql.shuffle.partitions at first batch
  * fixes the state layout), files per trigger, and the foreachBatch
  * sink step. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.NativeWindowProbe"
  * Prints msgs/sec per configuration. */
object NativeWindowProbe {

  private val cities =
    Seq("New York", "Baltimore", "San Francisco", "Austin", "Seattle")

  private def clickEventJson(i: Long): String = {
    val city = cities((i % cities.length).toInt)
    s"""{"ip":"10.${i % 256}.${(i / 256) % 256}.${i % 100}","event":"search_event_$i",""" +
      s""""properties":{"city":"$city","country":"USA"},""" +
      s""""timestamp":"2015-12-12T19:11:0${i % 10}.249Z","type":"track","userId":"u${i % 1000}"}"""
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nMsgs = sys.env.getOrElse("SPARK_GRAFT_BENCH_MSGS", "1000000").toLong
    val batchSize = 50000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nFiles = math.max(1, (nMsgs / batchSize).toInt)
    val batchLines = (0L until batchSize.toLong).map(clickEventJson).toArray
    val inDir = java.nio.file.Files.createTempDirectory("graft_nw_probe")
    (0 until nFiles).foreach { f =>
      val sb = new StringBuilder
      batchLines.foreach { l => sb.append(l); sb.append('\n') }
      java.nio.file.Files.writeString(inDir.resolve(f"b$f%05d.jsonl"), sb.toString)
    }

    def run(label: String, statePartitions: Option[Int]): Unit = {
      statePartitions.foreach(n =>
        spark.conf.set("spark.sql.shuffle.partitions", n))
      val conf = graft.engine.Config.fromString(
        s"""pipeline:
           |  batch_size: $batchSize
           |  source:
           |    type: file
           |    file: {path: '$inDir', format: json}
           |  handler:
           |    type: 'handlers.NativeWindow'
           |    window:
           |      time_column: timestamp
           |      keys: [properties.city]
           |      duration: '1 hour'
           |      watermark: '10 minutes'
           |  sink: {type: noop}
           |""".stripMargin)
      val t0 = System.nanoTime()
      val running = graft.streaming.StreamingPipeline.start(spark, conf)
      running.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      running.stop()
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      println(f"PROBE $label%-28s ${nFiles.toLong * batchSize / sec}%10.0f msgs/s  (${sec}%5.1f s, ${sec / nFiles}%5.3f s/trigger)")
    }

    run("baseline warmup", None)
    run("baseline", None)
    run("state_partitions=8", Some(8))
    run("state_partitions=4", Some(4))
    run("state_partitions=1", Some(1))
    spark.stop()
  }
}
