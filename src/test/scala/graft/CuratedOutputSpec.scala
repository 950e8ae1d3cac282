package graft

import java.nio.file.Files

import graft.operators.CuratedOutput
import graft.queries.Tables

/** Partitioned-output contract: layout, file counts, and lossless
  * readback with partition pruning. */
class CuratedOutputSpec extends SparkTestBase {

  test("writePartitioned lays out by partition value with bounded file counts") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = Files.createTempDirectory("graft_curated").toString

    CuratedOutput.writePartitioned(docs, out, Seq("lang"), filesPerPartition = 2)

    // layout: one directory per lang value
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    val langs = docs.select("lang").distinct()
      .collect().map(r => s"lang=${r.getString(0)}").sorted
    assert(langDirs.toSeq == langs.toSeq)

    // at most filesPerPartition parquet files per partition value
    langDirs.foreach { d =>
      val n = new java.io.File(out, d).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= 2, s"$d has $n files")
    }

    // lossless readback
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())

    // partition pruning: a lang filter reads only that directory
    val plan = back.filter(back("lang") === "en").queryExecution
      .executedPlan.toString
    assert(!plan.contains("lang=de") || plan.contains("PartitionFilters"))
    val en = back.filter(back("lang") === "en").count()
    val enExpected = docs.filter(docs("lang") === "en").count()
    assert(en == enExpected)
  }

  test("writeBucketed: same-key bucketed tables join with no shuffle on either side") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val base = Files.createTempDirectory("graft_bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      CuratedOutput.writeBucketed(orders, "b_orders",
        base.resolve("orders").toString, "o_orderkey", 8)
      CuratedOutput.writeBucketed(lineitem, "b_lineitem",
        base.resolve("lineitem").toString, "l_orderkey", 8)

      val joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      // disable broadcast so the join would OTHERWISE shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"),
          s"bucketed co-located join must not shuffle:\n$plan")
        // and it computes the right thing
        val expected = lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey")).count()
        assert(joined.count() == expected)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact at runtime") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
    val out = Files.createTempDirectory("graft_dpp").toString
    CuratedOutput.writePartitioned(docs, out, Seq("lang"), filesPerPartition = 1)
    val fact = spark.read.parquet(out)
    // a dimension whose FILTERED key set is only known at runtime —
    // the case static partition pruning cannot handle
    import spark.implicits._
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("en", 1), ("de", 0), ("zh", 0))
      .toDF("lang", "keep").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1048576")
    // stats-based benefit estimation vetoes DPP on toy-sized tables;
    // the heuristic path demonstrates the plan shape production gets
    // on real partitioned volumes
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = fact.join(dim, Seq("lang")).filter(col("keep") === 1)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"partitioned scan must carry a dynamicpruning subquery:\n$plan")
      val expected = docs.filter(col("lang") === "en").count()
      assert(q.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }
}
