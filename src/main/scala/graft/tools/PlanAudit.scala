package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Fleet-wide physical-plan audit — the whole-registry generalization
  * of PlanShapeSpec's per-query pins. For EVERY registry query, builds
  * the optimized physical plan (planning only; nothing executes beyond
  * the bounded driver models some operators fit at construction time —
  * centroid collects, metadata-answerable sizing counts)
  * and flags the two shapes that do not survive a 100× scale-up:
  *
  *   - `CartesianProductExec` — an un-broadcast all-pairs join. Never
  *     acceptable: even the exact audit tiers express their all-pairs
  *     semantics through broadcast or keyed joins.
  *   - `BroadcastNestedLoopJoin` — acceptable ONLY when the broadcast
  *     side is a bounded model/probe set (centroids, query batches,
  *     literal dims); flagged here so every occurrence is a conscious,
  *     reviewed decision. The audit prints the query list; SCALE.md
  *     records the rationale for the survivors.
  *
  * Run:  sbt "runMain graft.tools.PlanAudit <sfDir>"
  * Exit: nonzero if any CartesianProduct is found (CI-gateable).
  */
object PlanAudit {

  /** Audit result: queries whose physical plan contains a
    * CartesianProduct / BroadcastNestedLoopJoin / partition-less
    * window, and queries that failed to plan at all. Shared by the CLI
    * main and PlanAuditSpec (the `sbt test` gate — plan regressions
    * fail the build). */
  final case class Audit(
      cartesians: List[String], bnlj: List[String],
      globalWindows: List[String], failed: List[String])

  def audit(spark: SparkSession, dir: String): Audit = {
    var cartesians = List.empty[String]
    var bnlj = List.empty[String]
    var globalWindows = List.empty[String]
    var failed = List.empty[String]
    Registry.all.foreach { q =>
      try {
        val qe = q.run(spark, dir).queryExecution
        val plan = qe.executedPlan.toString
        if (plan.contains("CartesianProduct")) cartesians ::= q.name
        if (plan.contains("BroadcastNestedLoopJoin")) bnlj ::= q.name
        // partition-less WindowExec / WindowGroupLimitExec: "Moving
        // all data to a single partition" — the third shape that dies
        // at 100×. Detected on the tree (partitionSpec.isEmpty), not
        // the plan string, and through subquery plans too; acceptable
        // ONLY on provably bounded inputs (a pre-aggregated table, a
        // k-row model), so every survivor is pinned + reviewed like
        // the BNLJ list.
        // swept on the OPTIMIZED LOGICAL plan: the physical layers
        // both break the tree walk — sparkPlan still carries
        // UNPLANNED logical subqueries (collectWithSubqueries casts
        // them to SparkPlan and throws), and executedPlan under AQE
        // is a childless AdaptiveSparkPlanExec wrapper (the collect
        // sees nothing inside). Logical Window nodes carry the same
        // partitionSpec and every physical WindowExec descends from
        // one, so the logical sweep is the complete, stable signal.
        val gw = qe.optimizedPlan.collectWithSubqueries {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w.nodeName
          case w: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
              if w.partitionSpec.isEmpty => w.nodeName
        }
        if (gw.nonEmpty) globalWindows ::= q.name
      } catch {
        case e: Exception => failed ::= s"${q.name}: ${e.getMessage}"
      }
    }
    Audit(cartesians, bnlj, globalWindows, failed)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val Audit(cartesians, bnlj, globalWindows, failed) = audit(spark, dir)
    println(s"audited ${Registry.all.size} plans")
    println(s"CartesianProduct (${cartesians.size}): " +
      cartesians.sorted.mkString(", "))
    println(s"BroadcastNestedLoopJoin (${bnlj.size}): " +
      bnlj.sorted.mkString(", "))
    println(s"Partition-less Window (${globalWindows.size}): " +
      globalWindows.sorted.mkString(", "))
    if (failed.nonEmpty)
      println(s"FAILED to plan (${failed.size}):\n  " +
        failed.sorted.mkString("\n  "))
    spark.stop()
    if (cartesians.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
