package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.engine._

/** End-to-end Structured Streaming throughput: file source →
  * StreamingPipeline (foreachBatch: JSON decode + handler SQL + sink)
  * with real checkpointing — the full daemon path, as opposed to
  * Bench's direct per-batch loop (which mirrors the reference's own
  * loop harness). `sbt "runMain graft.tools.StreamBench [nMsgs] [perFile]"` */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nMsgs = args.headOption.map(_.toInt).getOrElse(1000000)
    val perFile = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cities = Seq("New York", "Baltimore", "San Francisco", "Austin", "Seattle")
    def evt(i: Long): String = {
      val city = cities((i % cities.length).toInt)
      s"""{"ip":"10.${i % 256}.${(i / 256) % 256}.${i % 100}","event":"search_event_$i",""" +
        s""""properties":{"city":"$city","country":"USA"},""" +
        s""""timestamp":"2015-12-12T19:11:0${i % 10}.249Z","type":"track","userId":"u${i % 1000}"}"""
    }

    val inDir = Files.createTempDirectory("graft_sb_in")
    val nFiles = nMsgs / perFile
    (0 until nFiles).foreach { f =>
      val sb = new StringBuilder
      (0 until perFile).foreach(i => { sb.append(evt(f.toLong * perFile + i)); sb.append('\n') })
      Files.writeString(inDir.resolve(f"b$f%05d.jsonl"), sb.toString)
    }
    println(s"wrote $nFiles files x $perFile msgs")

    val conf = Config.fromString(
      s"""pipeline:
         |  batch_size: $perFile
         |  source:
         |    type: file
         |    file: {path: '$inDir', format: json}
         |  handler:
         |    type: 'handlers.InferredMemBatch'
         |    sql: |
         |      SELECT properties.city as city, count(*) as city_count
         |      FROM batch GROUP BY city ORDER BY city DESC
         |  sink: {type: noop}
         |""".stripMargin)

    val t0 = System.nanoTime()
    val running = graft.streaming.StreamingPipeline.start(spark, conf)
    running.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    running.stop()
    println(f"streaming agg: ${nMsgs / sec}%.0f msgs/sec " +
      f"($sec%.1f s, ${running.batches.get()} batches)")
    spark.stop()
  }
}
