package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.top_k_rows

/** The bounded-heap per-key top-k aggregate must produce exactly the
  * window formulation's answer — on multi-partition input, through
  * partial/final merge and serialize/deserialize (exercised by the
  * exchange), independent of row order. */
class TopKRowsSpec extends SparkTestBase {
  import spark.implicits._

  private def mkRows(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (s"k${rnd.nextInt(7)}", i.toLong, rnd.nextInt(1000).toLong)
    }
  }

  test("top_k_rows equals the window row_number formulation") {
    val df = mkRows(11, 5000).toDF("key", "id", "score")
      .repartition(16) // force partial aggregation + merge across tasks
    // composite total order: score desc, id asc
    val ord = (col("score") * 1000000L - col("id")).as("ord")
    val viaAgg = df
      .select(col("key"), struct(ord, col("id"), col("score")).as("s"))
      .groupBy("key").agg(top_k_rows(col("s"), 5).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("key"), (col("pos") + 1).as("rank"),
        col("r.id").as("id"), col("r.score").as("score"))
    val w = Window.partitionBy("key")
      .orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("key", "rank", "id", "score")
    val a = viaAgg.collect().map(r => (r.getString(0), r.getInt(1),
      r.getLong(2), r.getLong(3))).toSet
    val b = viaWindow.collect().map(r => (r.getString(0), r.getInt(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(a == b, s"agg-vs-window diff: ${(a diff b) ++ (b diff a)}")
  }

  test("groups smaller than k return all rows; result order is rank order") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L))
      .toDF("key", "id", "score")
    val out = df
      .select(col("key"),
        struct((col("score") * 1000000L - col("id")).as("ord"),
          col("id"), col("score")).as("s"))
      .groupBy("key").agg(top_k_rows(col("s"), 5).as("top"))
      .select(col("key"), col("top.id").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(2L, 1L)) // score 20 before 10
    assert(out("b") == Seq(3L))
  }

  test("leading Long fields compare lexicographically (no arithmetic key packing needed)") {
    // score ties are common; the composite (score desc, id asc) is
    // expressed as two ordering fields — struct(score, -id, …) — and
    // must match the window formulation even when ids are far past
    // any packed-key spacing (billions) and scores collide heavily.
    val df = mkRows(17, 4000).map { case (k, id, score) =>
      (k, 7_000_000_000L + id * 999_983L, score % 7) // 7 distinct scores → mass ties
    }.toDF("key", "id", "score").repartition(16)
    val viaAgg = df
      .select(col("key"),
        struct(col("score").as("ord"), (-col("id")).as("ord2"),
          col("id"), col("score").as("sc")).as("s"))
      .groupBy("key").agg(top_k_rows(col("s"), 5).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("key"), (col("pos") + 1).as("rank"),
        col("r.id").as("id"), col("r.sc").as("score"))
    val w = Window.partitionBy("key")
      .orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("key", "rank", "id", "score")
    val a = viaAgg.collect().map(r => (r.getString(0), r.getInt(1),
      r.getLong(2), r.getLong(3))).toSet
    val b = viaWindow.collect().map(r => (r.getString(0), r.getInt(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(a == b, s"multi-ord agg-vs-window diff: ${(a diff b) ++ (b diff a)}")
  }

  test("null ordering keys lose to every real key") {
    val df = Seq(("a", Some(5L), 1L), ("a", None, 2L), ("a", Some(1L), 3L))
      .toDF("key", "score", "id")
    val out = df
      .select(col("key"), struct(col("score").as("ord"), col("id")).as("s"))
      .groupBy("key").agg(top_k_rows(col("s"), 2).as("top"))
      .select(col("top.id").as("ids"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(1L, 3L), s"null must sort last: $out")
  }

  test("top_k_rows is callable from SQL via the extensions registry") {
    graft.GraftExtensions.ensureRegistered(spark)
    mkRows(12, 500).toDF("key", "id", "score")
      .createOrReplaceTempView("tk_sql_input")
    val rows = spark.sql(
      """SELECT key, top_k_rows(struct(score * 1000000 - id AS ord, id), 3)
           AS top
         FROM tk_sql_input GROUP BY key""").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Any](1).size <= 3))
  }

  test("plan partially aggregates (map-side top-k before the exchange)") {
    val df = mkRows(13, 1000).toDF("key", "id", "score").repartition(8)
    val plan = df
      .select(col("key"),
        struct((col("score") * 1000000L - col("id")).as("ord"),
          col("id")).as("s"))
      .groupBy("key").agg(top_k_rows(col("s"), 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k_rows") || plan.contains("partial"),
      s"must partially aggregate map-side:\n$plan")
  }

  test("top_k_rows runs under streaming aggregation with bounded state") {
    // The point of a partially-aggregating top-k in streaming: per-key
    // state is the k-row heap buffer, not the full row history. Two
    // micro-batches must accumulate (batch-2 rows can displace batch-1
    // rows in the heap) and match the batch answer over the union.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = (1 to 40).map(i => ("k" + (i % 2), (i * 37 % 100).toLong, i))
    val b2 = (41 to 80).map(i => ("k" + (i % 2), (i * 37 % 100).toLong, i))

    def shaped(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key"),
        struct(col("ord"), col("payload")).as("s"))
      .groupBy("key").agg(top_k_rows(col("s"), 3).as("top"))

    val batch = shaped((b1 ++ b2).toDF("key", "ord", "payload"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1).toList).toMap

    val mem = MemoryStream[(String, Long, Int)]
    val q = shaped(mem.toDF().toDF("key", "ord", "payload"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("topk_stream").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("topk_stream")
        .collect().map(r => r.getString(0) -> r.getSeq[Any](1).toList).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
