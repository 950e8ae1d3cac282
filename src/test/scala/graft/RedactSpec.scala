package graft

import org.apache.spark.sql.functions._
import graft.operators.Redact

class RedactSpec extends SparkTestBase {
  import spark.implicits._

  private def run(texts: String*) =
    texts.toDF("text").select(
      Redact.redactValidCards(col("text")).as("r"),
      Redact.validCardCount(col("text")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq

  test("Luhn-valid cards redact; checksum-invalid 16-digit runs survive") {
    val got = run(
      "pay 4532015112830366 now",              // valid
      "order 4532015112830367 shipped",        // last digit corrupted
      "cards 4532015112830366 and 5425233430109903", // two valid
      "no digits here")
    assert(got(0) == (("pay <CC> now", 1)))
    assert(got(1) == (("order 4532015112830367 shipped", 0)))
    assert(got(2) == (("cards <CC> and <CC>", 2)))
    assert(got(3) == (("no digits here", 0)))
  }

  test("word boundaries: 17-digit runs are not candidates; duplicates all redact") {
    val got = run(
      "45320151128303667 is seventeen digits",
      "twice 4532015112830366 then 4532015112830366 again")
    assert(got(0)._2 == 0)
    assert(got(0)._1.contains("45320151128303667"))
    assert(got(1) == (("twice <CC> then <CC> again", 2)))
  }

  test("luhnValid16 agrees with a reference implementation on random digits") {
    def ref(s: String): Boolean = {
      val tot = s.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 0) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      tot % 10 == 0
    }
    val rnd = new scala.util.Random(3)
    val cands = (1 to 200).map(_ => (1 to 16).map(_ => rnd.nextInt(10)).mkString)
    val got = cands.toDF("c")
      .select(col("c"), Redact.luhnValid16(col("c")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cands.foreach { c => assert(got(c) == ref(c), s"mismatch on $c") }
  }
}
