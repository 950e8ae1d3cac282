package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Measured shuffle volume per registry operator — the evidence
  * behind SCALE.md's shuffle-shape claims. For each named query,
  * runs the plan to completion (noop sink) and reports the ACTUAL
  * bytes that crossed an exchange plus disk spill, aggregated from
  * stage task metrics:
  *
  *   sbt "runMain graft.tools.ShuffleProbe <sfDir> [queryName...]"
  *
  * Reading the table: `shufW`/`shufR` are exchange write/read bytes —
  * a map-only claim means ~0; a "one keyed shuffle on 16-byte hashes"
  * claim means shufW ≈ rows × key-width, far below the input bytes;
  * spill > 0 at local scale would flag an operator that cannot hold
  * its partitions at 1000× either. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufW = new AtomicLong; val shufR = new AtomicLong
    val spill = new AtomicLong; val inBytes = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          spill.addAndGet(m.diskBytesSpilled)
          inBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def mb(x: Long) = f"${x / 1048576.0}%9.2f"
    println(f"${"query"}%-34s ${"inputMB"}%9s ${"shufW_MB"}%9s ${"shufR_MB"}%9s ${"spillMB"}%9s")
    Registry.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        try {
          // warmup primes codegen AND file listing so the measured run
          // is the steady-state plan. SPARK_GRAFT_PROBE_NO_WARMUP=1
          // skips it for multi-minute exact/audit tiers (t80's full
          // total-order suffix sort at sf1) where shuffle VOLUME, not
          // steady-state wall clock, is the question.
          if (!sys.env.get("SPARK_GRAFT_PROBE_NO_WARMUP").contains("1")) {
            q.run(spark, dir).write.mode("overwrite").format("noop").save()
            Thread.sleep(300) // drain listener bus from the warmup
          }
          shufW.set(0); shufR.set(0); spill.set(0); inBytes.set(0)
          q.run(spark, dir).write.mode("overwrite").format("noop").save()
          Thread.sleep(500) // listener delivery is async
          println(f"${q.name}%-34s ${mb(inBytes.get)} ${mb(shufW.get)} " +
            f"${mb(shufR.get)} ${mb(spill.get)}")
        } catch {
          case e: Exception => println(s"${q.name}: FAILED ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
