package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-level bytes-read meter for admission-daemon state scans,
  * shared by the NearDup/Cosine/Hamming probe tools. Neither task
  * inputMetrics nor Hadoop FS statistics see the vectorized parquet
  * reader's positioned reads on file:// (both reported 0.12 MB for a
  * 6.4 MB full scan), so the measurement is FileSourceScanExec's
  * `filesSize` metric — the bytes selected for read AFTER partition
  * pruning, which is exactly the quantity the bucketed compact layout
  * is supposed to shrink. Only scans rooted under the watched dir
  * count (probe-side reads excluded). AQE materializes stages as
  * CHILDLESS QueryStageExec leaves — `.plan` is recursed or every
  * scan inside a stage is missed. */
final class StateBytesMeter(spark: SparkSession) {
  private val stateBytes = new java.util.concurrent.atomic.AtomicLong
  @volatile private var watched: String = ""

  /** Start (re)counting scans under `dir`. */
  def watch(dir: String): Unit = { watched = dir }

  def bytes(): Long = {
    // the execution-listener bus is async — drain it first
    org.apache.spark.graftx.Listeners
      .waitUntilListenerBusEmpty(spark.sparkContext)
    stateBytes.get()
  }

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other =>
      (other.children ++ other.subqueries).flatMap(scansOf)
  }

  spark.listenerManager.register(
    new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        scansOf(qe.executedPlan).foreach { s =>
          val under = s.relation.location.rootPaths.exists(
            _.toString.contains(watched))
          if (under && watched.nonEmpty) {
            val sz = s.metrics.get("filesSize").map(_.value).getOrElse(0L)
            stateBytes.addAndGet(sz)
            if (sys.env.contains("GRAFT_NDPROBE_DEBUG"))
              println(f"    [scan] $funcName sz=${sz / 1e6}%.3f MB " +
                s"parts=${s.relation.location.rootPaths.head}")
          }
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
}
