package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the lambda-tree recompute cost the round-4 quality-rule
  * restructure removes: the same C4 line-filter signals spelled (a)
  * naively — `filter(lines, kept)` repeated once per output column in
  * one projection (lambda subtrees are excluded from Spark's
  * subexpression elimination, so each reference re-scans the lines) —
  * vs (b) the shipped shape: one bound struct in its own projection,
  * extracted downstream. Also times t42's dup-gram fraction with and
  * without binding the token array (the m·n re-tokenization hazard).
  */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    // replicate to 8× and inject newlines so the line rules do real work
    val docs = (0 until 8).map { r =>
      base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), " (\\w+ \\w+ \\w+ \\w+ \\w+ \\w+ \\w+) ", " $1.\n")
          .as("text"))
    }.reduce(_ unionByName _).cache()
    println(s"docs: ${docs.count()}")
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1fs ($a rows)")
    }
    val keptLine: Column => Column = l => {
      val lo = lower(l)
      (l.like("%.") || l.like("%!") || l.like("%?") || l.like("%\"")) &&
        size(split(trim(l), " ")) >= 5 &&
        !lo.contains("javascript") && !lo.contains("lorem ipsum") &&
        !l.contains("{") && !l.contains("}")
    }

    // (a) naive: four filter() references in ONE projection
    val lines = split(col("text"), "\n")
    val naive = docs.select(
      col("doc_id"),
      size(lines).as("n_lines"),
      size(filter(lines, keptLine)).as("n_kept"),
      when(size(filter(lines, keptLine)) > 0,
        md5(array_join(filter(lines, keptLine), "\n"))).as("cleaned_md5"),
      (size(filter(lines, keptLine)) > 0).as("keep"))
    timed("c4 naive (4x filter in one projection)")(
      naive.filter(col("keep")).count())

    // (b) shipped: bound struct + extraction projection
    timed("c4 shipped (bound struct)")(
      graft.operators.QualityRules.c4LineFilter(docs, "doc_id", "text")
        .filter(col("keep")).count())

    // t42 core with vs without binding toks before ngramList
    import graft.functions.TextFunctions.{bound, tokens, ngramList}
    def frac(sg: Column, m: Column): Column =
      aggregate(sequence(lit(1), m), lit(0L), (acc, i) => acc + when(
        (i > 1 && element_at(sg, i) === element_at(sg, i - 1)) ||
          (i < m && element_at(sg, i) === element_at(sg, i + 1)),
        length(element_at(sg, i)).cast("long")).otherwise(0L))
    val unbound = bound(array_sort(ngramList(tokens(col("text")), 5))) { sg =>
      bound(size(sg).cast("int")) { m => when(m === 0, 0L).otherwise(frac(sg, m)) }
    }
    timed("t42 grams over UNBOUND tokens")(
      docs.select(unbound.as("d")).agg(sum("d")).collect().head.getLong(0))
    val boundToks = bound(tokens(col("text"))) { toks =>
      bound(array_sort(ngramList(toks, 5))) { sg =>
        bound(size(sg).cast("int")) { m => when(m === 0, 0L).otherwise(frac(sg, m)) }
      }
    }
    timed("t42 grams over BOUND tokens")(
      docs.select(boundToks.as("d")).agg(sum("d")).collect().head.getLong(0))
    spark.stop()
  }
}
