package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join must be result-identical to the plain join. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  private def mkSkewed = {
    // hot key 0 dominates (90%), keys 1..9 share the tail
    val fact = (0 until 2000).map { i =>
      val k = if (i % 10 != 0) 0L else (i / 10 % 9 + 1).toLong
      (i.toLong, k, i * 1.5)
    }.toDF("row_id", "k", "v")
    val dim = (0L until 10L).map(k => (k, s"name_$k")).toDF("k", "k_name")
    (fact, dim)
  }

  test("saltedJoin inner equals plain inner join") {
    val (fact, dim) = mkSkewed
    val plain = fact.join(dim, Seq("k")).select("row_id", "k", "v", "k_name")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), numSalts = 8)
      .select("row_id", "k", "v", "k_name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin left keeps unmatched fact rows exactly once") {
    val (fact, dim) = mkSkewed
    val dimMissing = dim.filter(col("k") =!= 0) // drop the hot key
    val plain = fact.join(dimMissing, Seq("k"), "left")
      .select("row_id", "k", "v", "k_name")
    val salted = Skew.saltedJoin(fact, dimMissing, Seq("k"), 8, "left")
      .select("row_id", "k", "v", "k_name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("keyHistogram surfaces the hot key first") {
    val (fact, _) = mkSkewed
    val top = Skew.keyHistogram(fact, "k", 3).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getLong(1) == 1800L)
  }
}
