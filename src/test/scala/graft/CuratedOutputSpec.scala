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
}
