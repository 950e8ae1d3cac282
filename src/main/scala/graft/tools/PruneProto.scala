package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway prototype: does Spark 4.1's vectorized parquet reader
  * page-prune a large pushed In-set over a SORTED file? Measures scan
  * "number of output rows" (rows actually decoded = post-page-pruning)
  * for sorted vs unsorted layouts and In-set sizes vs the pushdown
  * threshold. */
object PruneProto {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 4000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_pruneproto")
    // key = xxhash64-ish scattered longs; sorted layout
    val df = spark.range(n).select(xxhash64(col("id")).as("k"), col("id").as("v"))
    df.sort("k").coalesce(4)
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "4096")
      .parquet(s"$dir/sorted")
    df.coalesce(4).write.mode("overwrite")
      .option("parquet.page.row.count.limit", "4096")
      .parquet(s"$dir/unsorted")

    // probe keys: real keys scattered across the range
    def mkKeys(k: Int): Seq[Long] = spark.range(0, n, n / k)
      .select(xxhash64(col("id"))).collect().map(_.getLong(0)).toSeq

    def scanRows(path: String, keys: Seq[Long]): (Long, Long, Double) = {
      // default inFilterThreshold=10: any realistic key set routes to
      // parquet's NATIVE set-based In (Operators$In), not the OR chain
      val d = spark.read.parquet(path).filter(col("k").isInCollection(keys))
      val t0 = System.nanoTime()
      val out = d.collect().length.toLong
      val sec = (System.nanoTime() - t0) / 1e9
      // read scan metrics from THIS df's executed plan (a .count()
      // would run a different QueryExecution whose metrics we can't see)
      val qe = d.queryExecution
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => (other.children ++ other.subqueries).flatMap(scans)
      }
      val sc = scans(qe.executedPlan)
      if (sys.env.contains("GRAFT_PROTO_EXPLAIN"))
        sc.foreach(s => println("  pushed: " + s.metadata.get("PushedFilters")))
      val decoded = sc.map(_.metrics("numOutputRows").value).sum
      (out, decoded, sec)
    }

    for (layout <- Seq("sorted", "unsorted"); nk <- Seq(100, 2000, 32000)) {
      val (out, dec, sec) = scanRows(s"$dir/$layout", mkKeys(nk))
      println(f"$layout%-9s keys=$nk%-7d matched=$out%6d decodedRows=$dec%10d  ${sec}%6.2f s")
    }
    spark.stop()
  }
}
