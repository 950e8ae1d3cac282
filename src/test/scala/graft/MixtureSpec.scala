package graft

import graft.operators.Mixture

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  // 3 sources × 30 docs each, ids interleaved so in-source rank ≠ id order
  private def mkDocs = (1 to 90).map { i =>
    (i.toLong, Seq("en", "de", "zh")(i % 3))
  }.toDF("doc_id", "src")

  test("interleave serves sources proportionally to their weights") {
    val sched = Mixture.interleave(mkDocs, "src", "doc_id",
        weights = Map("en" -> 3.0, "zh" -> 0.5))
      .orderBy("mix_pos", "src", "src_rank")
    // the first 15 positions: en at k/3, de at k/1, zh at k/0.5 →
    // en appears ~3× as often as de, de ~2× as often as zh
    val head = sched.limit(15).collect().map(_.getString(1)).toSeq
    val counts = head.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("en") >= 9, s"en under-served: $counts")
    assert(counts.getOrElse("zh", 0) <= 2, s"zh over-served: $counts")
    assert(counts("en") > counts("de") && counts("de") > counts.getOrElse("zh", 0))
  }

  test("schedule is deterministic and a total order (no position collisions after tiebreak)") {
    val a = Mixture.interleave(mkDocs, "src", "doc_id", Map("en" -> 2.0))
      .orderBy("mix_pos", "src", "src_rank").collect().map(_.toSeq)
    val b = Mixture.interleave(mkDocs, "src", "doc_id", Map("en" -> 2.0))
      .orderBy("mix_pos", "src", "src_rank").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // every doc appears exactly once
    assert(a.map(_.head).distinct.length == 90)
  }

  test("rejects non-positive weights") {
    intercept[IllegalArgumentException] {
      Mixture.interleave(mkDocs, "src", "doc_id", Map("en" -> 0.0))
    }
  }

  test("temperatureWeights: T=1 is proportional, high T flattens, rate caps at 1") {
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (1 to 10).map(i => (100L + i, "small"))).toDF("doc_id", "src")
    val t1 = Mixture.temperatureWeights(docs, "src", 1.0, 50L)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(t1("big")._1 == t1("big")._2 && t1("small")._1 == t1("small")._2,
      "T=1 must leave shares proportional")
    val t100 = Mixture.temperatureWeights(docs, "src", 100.0, 50L)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(math.abs(t100("big")._1 - 0.5) < 0.01 && math.abs(t100("small")._1 - 0.5) < 0.01,
      s"high T must flatten toward uniform: $t100")
    // uniform share 0.5 of 50 docs = 25 wanted from a 10-doc source → capped
    assert(t100("small")._2 == 1.0, s"oversubscribed source must cap at 1.0: $t100")
  }

  private def mkWeighted = (1 to 200).map { i =>
    // one heavy item per stratum (weight 10000 vs 1) — A-ES must
    // essentially always select it
    val w = if (i % 100 == 7) 10000.0 else 1.0
    (i.toLong, if (i % 2 == 0) "a" else "b", w)
  }.toDF("doc_id", "src", "w")

  test("weightedReservoir matches the window/row_number formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = mkWeighted
    val fast = Mixture.weightedReservoir(df, "doc_id", "src", col("w"), k = 7)
      .orderBy("stratum", "rank").collect().map(_.toSeq).toSeq
    val u = (expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)")
      .cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val qkey = round(log(u) / col("w") * lit(1e10)).cast("long")
    val slow = df
      .withColumn("key6", round(log(u) / col("w"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(qkey.desc, col("doc_id").asc)))
      .filter(col("rank") <= 7)
      .select(col("src"), col("rank"), col("doc_id"), col("key6"))
      .orderBy("src", "rank").collect().map(_.toSeq).toSeq
    assert(fast == slow)
  }

  test("weightedReservoir stays correct for ids past the old packed-key spacing (>= 1e6)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // ids in the billions: the retired cents-style packing
    // (qkey*1e6 - id) would bleed id into the key component here and
    // flip ranks between adjacent quantized keys
    val df = (1 to 120).map { i =>
      (5_000_000_000L + i * 777_123L, if (i % 2 == 0) "a" else "b", 1.0 + (i % 9))
    }.toDF("doc_id", "src", "w")
    val fast = Mixture.weightedReservoir(df, "doc_id", "src", col("w"), k = 6)
      .orderBy("stratum", "rank").collect().map(_.toSeq).toSeq
    val u = (expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)")
      .cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val qkey = round(log(u) / col("w") * lit(1e10)).cast("long")
    val slow = df
      .withColumn("key6", round(log(u) / col("w"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(qkey.desc, col("doc_id").asc)))
      .filter(col("rank") <= 6)
      .select(col("src"), col("rank"), col("doc_id"), col("key6"))
      .orderBy("src", "rank").collect().map(_.toSeq).toSeq
    assert(fast == slow)
  }

  test("weightedReservoir fails fast on weights small enough to overflow the quantized key") {
    val df = (1 to 10).map(i => (i.toLong, "a", 1e-9)).toDF("doc_id", "src", "w")
    val e = intercept[Exception] {
      Mixture.weightedReservoir(df, "doc_id", "src",
        org.apache.spark.sql.functions.col("w"), k = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("weight must be non-null")), e.toString)
  }

  test("weightedReservoir favors heavy weights and samples without replacement") {
    val picked = Mixture.weightedReservoir(
        mkWeighted, "doc_id", "src", org.apache.spark.sql.functions.col("w"),
        k = 5)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    // without replacement: no id twice
    assert(picked.map(_._2).distinct.length == picked.length)
    assert(picked.length == 10) // 5 per stratum
    // the weight-10000 item of each stratum (ids 7 and 107... 7 is odd → "b",
    // 107 odd → "b"; both heavies land in "b") must be selected
    val heavies = Seq(7L, 107L)
    heavies.foreach { id =>
      assert(picked.contains(("b", id)), s"heavy item $id not selected: $picked")
    }
  }

  test("weightedReservoir rejects non-positive k") {
    intercept[IllegalArgumentException] {
      Mixture.weightedReservoir(mkWeighted, "doc_id", "src",
        org.apache.spark.sql.functions.col("w"), k = 0)
    }
  }
}
