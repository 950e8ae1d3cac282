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

  test("logHistQuantiles: bins are exact, quantile walk hits the right bin") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),      // bins 1, 2, 2
      ("a", 100L), ("a", 1000L),            // bins 7, 10
      ("b", 7L), ("b", 8L))                 // bins 3, 4
      .toDF("k", "cents")
    val out = graft.operators.Sketch
      .logHistQuantiles(df, Seq("k"), "cents", qs = Seq(50, 95))
      .collect().map(r => (r.getString(0),
        r.getInt(1), r.getInt(2), r.getLong(3))).toSeq.sortBy(_._1)
    // key a: 5 values in bins [1,2,2,7,10] → p50 = 3rd value (bin 2),
    // p95 needs cum ≥ 4.75 → the 5th value (bin 10)
    // key b: p50 = 1st of 2 (bin 3), p95 = 2nd (bin 4)
    assert(out == Seq(("a", 2, 10, 5L), ("b", 3, 4, 2L)))
  }

  test("logHistQuantiles: power-of-two boundaries bin exactly (no float log2)") {
    val df = Seq(("k", 1L), ("k", 2L), ("k", 4L), ("k", 1024L), ("k", 1023L))
      .toDF("k", "cents")
    val bins = df.select(graft.operators.Sketch.logBin(col("cents")).as("b"))
      .as[Int].collect().toSeq
    assert(bins == Seq(1, 2, 3, 11, 10)) // 2^k opens bin k+1, 2^k−1 closes bin k
  }

  test("log-histogram streaming aggregation equals the batch histogram") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val data = (1 to 500).map(i => ("k" + (i % 3), (i * 7 % 997 + 1).toLong))
    val batch = data.toDF("k", "cents")
      .select(col("k"), graft.operators.Sketch.logBin(col("cents")).as("bin"))
      .groupBy("k", "bin").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("k", "cents")
      .select(col("k"), graft.operators.Sketch.logBin(col("cents")).as("bin"))
      .groupBy("k", "bin").count()
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("loghist_stream").start()
    try {
      // two batches: the histogram must accumulate across them
      mem.addData(data.take(200): _*); q.processAllAvailable()
      mem.addData(data.drop(200): _*); q.processAllAvailable()
      val streamed = spark.table("loghist_stream")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  // ~40 days × 3 groups, user ids overlapping across days so the
  // rollup distinct < sum of daily distincts (the case where a naive
  // sum-of-counts rollup is WRONG and sketches earn their keep)
  private def mkEvents = (1 to 4000).map { i =>
    (i % 40, s"g${i % 3}", s"user_${i % 700}")
  }.toDF("day", "grp", "user")

  test("hll sketches survive parquet persistence: rollup from disk == in-plan rollup") {
    val daily = Sketch.hllDailySketches(mkEvents,
      col("day"), col("grp"), col("user"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    daily.write.mode("overwrite").parquet(dir)
    val inPlan = Sketch.hllRollupEstimate(daily)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val fromDisk = Sketch.hllRollupEstimate(spark.read.parquet(dir))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(inPlan == fromDisk,
      s"persisted sketches must merge identically: $inPlan vs $fromDisk")
  }

  test("hll rollup estimate lands within the error envelope of the exact distinct") {
    val events = mkEvents
    val est = Sketch.hllRollupEstimate(Sketch.hllDailySketches(events,
        col("day"), col("grp"), col("user")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = events.groupBy("grp")
      .agg(countDistinct("user").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= math.max(1L, (n * 0.05).toLong),
        s"group $g: est ${est(g)} vs exact $n")
    }
    // daily distincts overlap across days — the rollup must NOT be
    // their sum (that's the bug mergeable sketches exist to prevent)
    val naiveSum = Sketch.hllDailySketches(events,
        col("day"), col("grp"), col("user"))
      .groupBy("rollup").agg(sum("n_exact_grain").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (g, n) => assert(naiveSum(g) > n) }
  }

  test("streaming windowed distinct-count runs on HLL state (bounded, watermark close)") {
    // count(DISTINCT) is unsupported in streaming aggregation and an
    // exact set would grow with cardinality; the sketch aggregate is
    // the bounded-state route — same q72 machinery, live
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Timestamp, String)]
    val out = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user, 12))").as("approx_users"))
      .select(col("window.start").as("ws"), col("approx_users"))
    val q = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // 300 events over 100 distinct users, split across two batches
      val users = (1 to 300).map(i => ts("2024-01-01 10:05:00") -> s"u${i % 100}")
      mem.addData(users.take(150): _*); q.processAllAvailable()
      mem.addData(users.drop(150): _*); q.processAllAvailable()
      mem.addData(ts("2024-01-01 12:00:00") -> "z"); q.processAllAvailable()
      val rows = spark.table("hll_stream").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(rows.length == 1)
      val est = rows(0)._2
      assert(math.abs(est - 100) <= 5, s"estimate $est for 100 true distinct")
    } finally q.stop()
  }
}
