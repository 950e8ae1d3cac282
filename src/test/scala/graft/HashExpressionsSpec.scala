package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFunctions._
import graft.functions.TextFunctions._

class HashExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("rolling_hash64 matches reference implementation and handles null") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + b)
    val df = Seq("hello world", "", "héllo ✓", null)
      .toDF("s")
      .select(rolling_hash64(col("s")).as("h"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0).contains(ref("hello world")))
    assert(got(1).contains(0L))
    assert(got(2).contains(ref("héllo ✓")))
    assert(got(3).isEmpty)
  }

  test("rolling_hash64: interpreted eval equals codegen result") {
    val data = Seq("a", "abc", "the quick brown fox", "ü ü ü")
    val viaDf = data.toDF("s")
      .select(rolling_hash64(col("s"))).collect().map(_.getLong(0))
    val viaEval = data.map(s =>
      graft.functions.RollingHash64(
        org.apache.spark.sql.catalyst.expressions.Literal(s)).eval(null))
    assert(viaDf.toSeq == viaEval.map(_.asInstanceOf[Long]))
  }

  test("simhash64: identical token sets → identical hash; near sets → small hamming") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a // identical
    val c = a.replace("kappa", "lambda") // one token changed
    val df = Seq(a, b, c).toDF("t")
      .select(simhash64(tokenHashes(tokens(col("t")))).as("h"))
    val Array(ha, hb, hc) = df.collect().map(_.getLong(0))
    assert(ha == hb)
    assert(java.lang.Long.bitCount(ha ^ hc) <= 16, "near-dup should be close in hamming")
  }

  test("vec_dot matches scala dot product on float arrays") {
    val x = Array(1.0f, 2.0f, 3.0f)
    val y = Array(0.5f, -1.0f, 2.0f)
    val expected = x.zip(y).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val got = Seq((x, y)).toDF("x", "y")
      .select(vec_dot(col("x"), col("y")).as("d")).collect()(0).getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("rep_stats matches the builtins composition it replaces") {
    val texts = Seq(
      "the cat sat on the mat the cat sat",
      "a b a b a b a b",
      "one",
      "x Y x y X y",          // case-folds to 2 distinct tokens
      "")
    val got = texts.toDF("text")
      .select(rep_stats(col("text")).as("rs"))
      .selectExpr("rs.n_tokens", "rs.d_tokens", "rs.n_2grams", "rs.d_2grams",
        "rs.n_3grams", "rs.d_3grams")
      .collect().map(r => (0 to 5).map(r.getLong).toSeq)
    // oracle: the (slow) builtins composition over the same definitions
    val oracle = texts.toDF("text").select(
        size(tokens(col("text"))).cast("long"),
        size(array_distinct(tokens(col("text")))).cast("long"),
        size(ngramList(tokens(col("text")), 2)).cast("long"),
        size(array_distinct(ngramList(tokens(col("text")), 2))).cast("long"),
        size(ngramList(tokens(col("text")), 3)).cast("long"),
        size(array_distinct(ngramList(tokens(col("text")), 3))).cast("long"))
      .collect().map(r => (0 to 5).map(r.getLong).toSeq)
    assert(got.toSeq == oracle.toSeq)
  }

  test("nfc_normalize composes decomposed unicode; identity on NFC text; null-safe") {
    val composed = "caf" + "\u00e9"   // e-acute as one codepoint
    val decomposed = "cafe" + "\u0301" // e + combining acute
    val df = Seq(composed, decomposed, "plain ascii", null)
      .toDF("s").select(nfc_normalize(col("s")).as("n"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(got(0).contains(composed))
    assert(got(1).contains(composed), "decomposed form must compose to NFC")
    assert(got(2).contains("plain ascii"))
    assert(got(3).isEmpty)
    // interpreted eval (no codegen) agrees with the codegen'd path
    val interp = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
      .eval(null).toString
    assert(interp == composed)
  }

  private def chunksOf(s: String): Seq[(Int, Int, String)] = {
    val ends = Seq(s).toDF("t")
      .select(cdc_chunks(col("t"), 6, 16).as("e"))
      .collect()(0).getSeq[Int](0)
    ends.scanLeft(0)((_, e) => e).zip(ends).map { case (st, e) =>
      (st + 1, e, s.substring(st, e))
    }
  }

  test("cdc_chunks: ends are increasing, cover the text, ~2^6 expected length") {
    val rnd = new scala.util.Random(17)
    val text = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val ch = chunksOf(text)
    assert(ch.map(_._2) == ch.map(_._2).sorted.distinct)
    assert(ch.last._2 == text.length)
    assert(ch.map(_._3).mkString == text)
    val avg = text.length.toDouble / ch.length
    assert(avg > 16 && avg < 256, s"avg chunk $avg")
  }

  test("cdc_chunks: a tail edit leaves every earlier chunk digest unchanged") {
    val rnd = new scala.util.Random(23)
    val base = (1 to 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base + " trailing edit appended here"
    val (a, b) = (chunksOf(base).map(_._3), chunksOf(edited).map(_._3))
    // all but the last base chunk survive the edit byte-for-byte —
    // the property fixed-size windows cannot have
    assert(a.dropRight(1) == b.take(a.length - 1),
      s"${a.length} vs ${b.length} chunks")
  }

  test("cdc_chunks: a HEAD edit re-syncs after a bounded neighborhood") {
    val rnd = new scala.util.Random(29)
    val base = (1 to 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "inserted-prefix " + base
    val (a, b) = (chunksOf(base).map(_._3).toSet, chunksOf(edited).map(_._3).toSet)
    // boundaries are content-local: the vast majority of chunks are
    // shared even though every offset shifted
    val shared = (a & b).size.toDouble / a.size
    assert(shared > 0.8, s"shared=$shared (${a.size} base chunks)")
  }

  test("cdc_chunks edge cases: empty, shorter than window, no cut points") {
    assert(chunksOf("").isEmpty)
    val tiny = chunksOf("abc")
    assert(tiny == Seq((1, 3, "abc")))
  }
}
