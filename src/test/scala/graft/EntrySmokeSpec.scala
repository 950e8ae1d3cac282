package graft

import org.apache.spark.sql.execution.SparkPlan

/** Smoke + plan-shape assertions on the driver contract at sf0.001. */
class EntrySmokeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs at sf0.001 and yields a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("q03 join uses broadcast hash joins (no shuffle join on dims)") {
    val df = SparkEntry.queries("q03_join_agg_revenue_by_nation")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("q02 filter is pushed to the parquet scan") {
    val df = SparkEntry.queries("q02_filter_project")(spark, dir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan.take(2000))
    assert(scan.contains("event_type"), scan.take(2000))
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("documented registry counts match Registry.all.size (drift guard)") {
    // count drift across README/COVERAGE bit three rounds running; the
    // checked sites live in ONE place (tools.CountSync.sites) and the
    // fix is one command. Failure lists every stale site at once.
    val n = queries.Registry.all.size
    val stale = tools.CountSync.expected(n).filterNot { case (file, s) =>
      java.nio.file.Files.readString(java.nio.file.Paths.get(file)).contains(s)
    }
    assert(stale.isEmpty,
      s"Registry.all.size = $n but these doc sites are stale:\n" +
        stale.map { case (f, s) => s"  $f: expected \"$s\"" }.mkString("\n") +
        "\nFix with: sbt \"runMain graft.tools.CountSync\"")
  }
}
