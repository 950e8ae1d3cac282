package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Query-tier-only bench for optimization iteration: times the
  * SAME headline+audit registry queries with the SAME methodology as
  * `graft.Bench` (one warmup run, then min of `reps` timed noop-sink
  * materializations) without paying the ~45-minute pipeline tier.
  * Session shape matches Bench: `local[$SPARK_GRAFT_CPUS]`,
  * `spark.sql.shuffle.partitions` = cpus.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.QueryBench <sfDir> [name...]"
  *
  * Each row also carries the timed run's job/stage/task counts and
  * shuffle bytes (guide §1: decide whether time goes to scheduling,
  * shuffle or compute before touching anything). This is an iteration
  * instrument only — the round artifact stays `graft.Bench`'s JSON
  * line.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QB_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        taskMs.addAndGet(m.executorRunTime)
      }
    })
    def resetCounters(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      shufR.set(0); shufW.set(0); taskMs.set(0)
    }

    def materialize(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // host steal around each query so a dirty row is visibly dirty
    def ticks(): (Long, Long) = try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      (f.sum, if (f.length > 7) f(7) else 0L)
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }

    val qs = Registry.all
      .filter(q => q.headline || q.audit)
      .filter(q => names.isEmpty || names.contains(q.name))
    val rows = qs.map { q =>
      spark.sparkContext.setJobDescription(s"warmup:${q.name}")
      materialize(q.run(spark, dir))
      spark.sparkContext.setJobDescription(s"timed:${q.name}")
      val t0 = ticks()
      val timed = (1 to reps).map { i =>
        if (i == reps) { // counters cover exactly the LAST timed run
          Thread.sleep(300) // let queued listener events drain
          resetCounters()
        }
        time(materialize(q.run(spark, dir)))
      }
      Thread.sleep(300)
      val t1 = ticks()
      val steal =
        if (t1._1 - t0._1 <= 0) 0.0
        else 100.0 * (t1._2 - t0._2) / (t1._1 - t0._1)
      val best = timed.min
      spark.sparkContext.setJobDescription(null)
      println(f"${q.name}%-36s ${best}%8.3f s  jobs=${jobs.get}%-3d " +
        f"stages=${stages.get}%-3d tasks=${tasks.get}%-5d " +
        f"taskTime=${taskMs.get / 1e3}%6.2f s  " +
        f"shufW=${shufW.get / 1e6}%8.2f MB  steal=$steal%.2f%%" +
        (if (q.audit) "  [audit]" else ""))
      (q, best)
    }
    val (audit, head) = rows.partition(_._1.audit)
    println(f"headline_total ${head.map(_._2).sum}%8.3f s   " +
      f"audit_total ${audit.map(_._2).sum}%8.3f s   (cpus=$cpus reps=$reps)")
    spark.stop()
  }
}
