package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Dump formatted physical plans for plan-quality review:
  * `sbt "runMain graft.tools.Explain <sfDir> [queryName...]"`.
  * Greps worth running on the output: PushedFilters (pushdown reached
  * the scan), BroadcastHashJoin vs SortMergeJoin (dim joins should
  * broadcast), WholeStageCodegen spans (hot path stays codegen'd). */
object Explain {
  def main(args: Array[String]): Unit = {
    // --executed: run each query (noop sink) first and print the FINAL
    // AQE-reoptimized plan — the only place runtime artifacts like
    // ReusedExchange / AQEShuffleRead are visible (the static plan
    // prints `AdaptiveSparkPlan isFinalPlan=false` with both exchange
    // copies still present)
    val executed = args.contains("--executed")
    val rest = args.filterNot(_ == "--executed")
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.drop(1).toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Registry.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try {
          val df = q.run(spark, dir)
          if (executed) {
            // drive the df's OWN QueryExecution (a noop write would
            // plan a fresh copy and leave this one un-finalized), then
            // print the AQE-final plan — isFinalPlan=true, with
            // ReusedExchange / AQEShuffleRead runtime artifacts
            df.collect()
            println(df.queryExecution.executedPlan.toString)
          } else df.explain("formatted")
        } catch { case e: Exception => println(s"EXPLAIN FAILED: $e") }
      }
    spark.stop()
  }
}
