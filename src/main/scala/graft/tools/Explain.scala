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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Registry.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try q.run(spark, dir).explain("formatted")
        catch { case e: Exception => println(s"EXPLAIN FAILED: $e") }
      }
    spark.stop()
  }
}
