package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph traversal as a driver-side loop over declarative
  * joins — the general recursive-query execution shape for graphs too
  * big for a single recursion (lineage/entity graphs, link graphs,
  * citation networks over a 100 TB corpus).
  *
  * Spark 4 parses `WITH RECURSIVE` (q46 uses it for scalar series),
  * but a graph closure wants the semi-naive discipline made explicit:
  *
  *  - **Frontier-only expansion**: each hop joins ONLY the rows
  *    discovered last round against the edge table — never the full
  *    reached set — so hop k's shuffle is O(frontier_k × degree), the
  *    delta, not O(reached) (naive evaluation re-derives everything
  *    every round).
  *  - **Lineage truncation**: every hop `localCheckpoint()`s its
  *    result. Without it the plan tree doubles per iteration and the
  *    optimizer re-plans an exponentially growing DAG (the classic
  *    iterative-Spark failure: hop 20 spends minutes in Catalyst, or
  *    a recomputed branch re-reads the corpus). Checkpointed blocks
  *    replicate to executor storage; at cluster scale use
  *    `checkpoint()` on a DFS dir for fault tolerance instead.
  *  - **Early exit**: the loop stops when a frontier empties, so
  *    `maxHops` is a bound, not a fixed cost.
  *
  * Per hop: one shuffle join (frontier × edges, keyed on src — edges
  * can be pre-bucketed by src to make every hop exchange-free on the
  * edge side) + one anti-join against the visited set. */
object Graph {

  /** Minimum hop distance (≤ `maxHops`) from any seed node, BFS over
    * a directed edge list (feed reversed edges too for undirected).
    * Output: (node, hops) — seeds at 0; unreachable nodes absent. */
  def khopDistances(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, "khopDistances: maxHops must be >= 0")
    // pay the edge exchange ONCE: the cached relation's hash
    // partitioning on src satisfies every hop's join requirement, so
    // only the (small) frontier moves per iteration — without this
    // the full edge table re-shuffles maxHops times
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .persist()
    try {
      var reached = seeds.select(col(seedCol).cast("long").as("node"))
        .distinct()
        .withColumn("hops", lit(0))
        .localCheckpoint()
      var frontier = reached
      var hop = 0
      while (hop < maxHops && !frontier.isEmpty) {
        hop += 1
        val next = frontier
          .join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(reached.select("node"), Seq("node"), "left_anti")
          .withColumn("hops", lit(hop))
          .localCheckpoint()
        reached = reached.unionByName(next).localCheckpoint()
        frontier = next
      }
      reached
    } finally e.unpersist(blocking = false)
  }
}
