package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Per-stage breakdown of ONE registry query's timed run (after
  * warmup): stage id, name, task count, executor run time, shuffle
  * read/write bytes — the guide §1 "which stage is slow" answer when
  * no UI is available.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StageProbe <sfDir> <query>"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: StageProbe <sfDir> <query> — e.g. " +
          "SPARK_GRAFT_CPUS=32 sbt \"runMain graft.tools.StageProbe " +
          "/root/testdata/sf0.1 t11_dedup_jaccard_prefix\"")
      sys.exit(2)
    }
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Row(id: Int, name: String, tasks: Int, runMs: Long,
        cpuMs: Long, shufR: Long, shufW: Long, inB: Long, wallMs: Long)
    val rows = mutable.ArrayBuffer.empty[Row]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        rows += Row(i.stageId, i.name.takeWhile(_ != '\n').take(70),
          i.numTasks, m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead, wall)
      }
    })

    val q = Registry.byName(name)
    def run(): Unit =
      q.run(spark, dir).write.mode("overwrite").format("noop").save()
    run() // warmup
    Thread.sleep(500)
    rows.clear()
    val t0 = System.nanoTime()
    run()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"== $name timed run: $sec%.3f s, ${rows.size} stages ==")
    println(f"${"id"}%4s ${"tasks"}%5s ${"wallMs"}%7s ${"runMs"}%7s " +
      f"${"cpuMs"}%7s ${"shufR"}%9s ${"shufW"}%9s ${"input"}%9s  name")
    rows.sortBy(_.id).foreach { r =>
      println(f"${r.id}%4d ${r.tasks}%5d ${r.wallMs}%7d ${r.runMs}%7d " +
        f"${r.cpuMs}%7d ${r.shufR}%9d ${r.shufW}%9d ${r.inB}%9d  ${r.name}")
    }
    println(f"total stage wall ${rows.map(_.wallMs).sum / 1e3}%.3f s, " +
      f"run ${rows.map(_.runMs).sum / 1e3}%.3f s, cpu ${rows.map(_.cpuMs).sum / 1e3}%.3f s")
    spark.stop()
  }
}
