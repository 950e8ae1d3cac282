package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  //   1 → 2 → 3 → 4 → 5 (chain), 10 → 11 (disconnected), 2 → 1 (cycle back)
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (2L, 1L)
  ).toDF("src", "dst")

  private def run(seeds: Seq[Long], maxHops: Int) =
    Graph.khopDistances(edges, "src", "dst",
        seeds.toDF("node"), "node", maxHops)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap

  test("BFS computes min hop distances and ignores the cycle") {
    assert(run(Seq(1L), 4) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("maxHops bounds the expansion; 0 returns seeds only") {
    assert(run(Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(run(Seq(1L), 0) == Map(1L -> 0))
  }

  test("disconnected nodes never appear; loop exits early on empty frontier") {
    // maxHops far beyond the diameter — the empty-frontier exit must
    // stop the loop (this would spin 50 rounds otherwise)
    assert(run(Seq(10L), 50) == Map(10L -> 0, 11L -> 1))
  }

  test("multi-seed takes the minimum distance over seeds") {
    assert(run(Seq(1L, 4L), 4) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 1))
  }
}
