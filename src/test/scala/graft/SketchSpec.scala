package graft

import org.apache.spark.sql.functions._
import graft.operators.{Html, Sketch}

class SketchSpec extends SparkTestBase {
  import spark.implicits._

  // Zipf-ish stream: token "w<k>" appears ~N/k times — a handful of
  // heavy tokens over a long singleton tail, the CMS target shape.
  private def mkStream = {
    val occurrences = (1 to 40).flatMap { k =>
      Seq.fill(200 / k)(s"w$k")
    } ++ (1 to 300).map(i => s"tail_$i")
    occurrences.toDF("token")
  }

  test("heavyHitters ≡ naive exact answer (CMS prefilter is lossless)") {
    val df = mkStream
    val threshold = 20L
    val got = Sketch.heavyHitters(df, "token", threshold)
      .as[(String, Long)].collect().toSeq
    val want = df.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col("token"))
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("heavyHittersRelative sizes its threshold from the sketch itself") {
    val df = mkStream
    val total = df.count()
    val denom = 50L
    val threshold = (total + denom - 1) / denom
    val got = Sketch.heavyHittersRelative(df, "token", denom)
      .as[(String, Long)].collect().toSeq
    val want = df.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col("token"))
      .as[(String, Long)].collect().toSeq
    assert(got == want)
  }

  test("CMS estimate never under-counts (prefilter keeps every true hitter)") {
    val df = mkStream
    // grid row 0 must sum to the stream length (the sizing contract)
    val grid = Sketch.cmsCounts(df, "token", depth = 4, width = 64)
    val row0 = grid.filter(col("r") === 0).agg(sum("c")).as[Long].head()
    assert(row0 == df.count())
    // each row's total equals the stream length too
    val perRow = grid.groupBy("r").agg(sum("c").as("s")).as[(Int, Long)]
      .collect().toMap
    assert(perRow.values.toSet == Set(df.count()))
  }

  test("CMS grids are mergeable: cell-wise sum of batch grids ≡ full-stream grid") {
    // the sketch's superpower for incremental/streaming corpora: grids
    // are linear, so per-batch sketches merged cell-wise give EXACTLY
    // the full-corpus sketch — history never re-scans
    val full = mkStream
    val batches = Seq(
      full.limit(300),
      full.offset(300).limit(400),
      full.offset(700))
    def gridMap(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsCounts(df, "token", depth = 4, width = 64)
        .as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => (r, b) -> c }.toMap
    val merged = batches.map(gridMap)
      .reduce { (a, b) =>
        (a.keySet ++ b.keySet).map(k =>
          k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      }
    assert(merged == gridMap(full))
  }

  test("html extractText strips markup, code, comments; decodes entities once") {
    val html =
      """<html><head><script type="text/javascript">var x = 1 < 2;</script>
        |<style>p { color: red; }</style></head>
        |<body><!-- hidden -->
        |<h1>Title</h1><p>Hello &amp; goodbye &lt;world&gt;.</p>
        |<p>&quot;quoted&quot; and &#39;single&#39; and &amp;lt; stays.</p>
        |</body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(Html.extractText(col("h")).as("t")).as[String].head()
    assert(out ==
      """Title Hello & goodbye <world>. "quoted" and 'single' and &lt; stays.""")
  }

  test("html extractText is whitespace-squeezing and tag-boundary word-safe") {
    val out = Seq("<p>a</p><p>b</p>").toDF("h")
      .select(Html.extractText(col("h")).as("t")).as[String].head()
    assert(out == "a b")
  }
}
