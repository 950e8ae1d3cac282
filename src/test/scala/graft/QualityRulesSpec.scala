package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityRules

/** Crafted-fixture semantics for the Gopher / C4 quality-rule
  * operators — the line-level rules (bullets, ellipses, boilerplate
  * markers) that the synthetic single-line gate corpus cannot vary. */
class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val longGood =
    ("the quick brown fox jumps over the lazy dog and then " * 6).trim

  test("gopherSignals: word-count bounds, symbol ratio, stop-word rules") {
    val docs = Seq(
      // 60 words, clean prose with stop words → keep
      (1L, longGood),
      // too short (< 50 words)
      (2L, "the fox and that dog have been away with the others"),
      // symbol-heavy: hash marks past 10% of words
      (3L, longGood + " " + ("#" * 20)),
      // no Gopher stop words at all
      (4L, ("lorem dolor amet consectetur adipiscing elit sed eiusmod " * 8).trim)
    ).toDF("doc_id", "text")
    val out = QualityRules.gopherSignals(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[Int]("n_stop_hits"))).toMap
    assert(out(1L)._1, "clean prose must pass")
    assert(out(1L)._2 >= 2)
    assert(!out(2L)._1, "under min word count")
    assert(!out(3L)._1, "symbol ratio above 0.1")
    assert(!out(4L)._1, "fewer than 2 stop words")
  }

  test("gopherSignals: bullet and ellipsis line fractions") {
    val bullets = (1 to 10).map(i => s"- bullet item number $i").mkString("\n")
    val ellipses = (1 to 10).map(i => s"truncated line number $i ...").mkString("\n")
    val docs = Seq(
      (1L, longGood + "\n- one bullet line here"), // 1 of 2 lines → 0.5 ≤ 0.9
      (2L, bullets),                               // 100% bullet lines
      (3L, ellipses)                               // 100% ellipsis lines
    ).toDF("doc_id", "text")
    val out = QualityRules.gopherSignals(docs, "doc_id", "text", minWords = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"),
          r.getAs[Double]("frac_bullet_lines"),
          r.getAs[Double]("frac_ellipsis_lines"))).toMap
    assert(out(1L)._2 == 0.5)
    assert(out(1L)._1)
    assert(out(2L)._2 == 1.0 && !out(2L)._1, "all-bullet doc dropped")
    assert(out(3L)._3 == 1.0 && !out(3L)._1, "all-ellipsis doc dropped")
  }

  test("c4LineFilter keeps sentence-like lines, drops boilerplate") {
    val text = Seq(
      "This is a perfectly normal sentence with enough words.", // keep
      "Short line.",                                  // < 5 words
      "this line has plenty of words but no terminal punctuation", // no punct
      "Enable JavaScript to view the full site today.",  // marker
      "Lorem ipsum dolor sit amet consectetur elit.",    // marker
      "function f() { return the braces of code; }",     // braces
      "Is this a real question with many words?",        // keep (?)
      "He said \"this quoted line also has enough words\"" // keep (")
    ).mkString("\n")
    val out = QualityRules.c4LineFilter(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Int]("n_lines") == 8)
    assert(out.getAs[Int]("n_kept") == 3)
    assert(out.getAs[Boolean]("keep"))
    // cleaned hash = md5 of exactly the surviving lines re-joined
    val expected = Seq(
      "This is a perfectly normal sentence with enough words.",
      "Is this a real question with many words?",
      "He said \"this quoted line also has enough words\"").mkString("\n")
    assert(out.getAs[String]("cleaned_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest(expected.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("c4LineFilter: document with zero surviving lines is flagged keep=false") {
    val out = QualityRules.c4LineFilter(
        Seq((1L, "no punctuation here at all\nalso not here")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().head
    assert(out.getAs[Int]("n_kept") == 0)
    assert(!out.getAs[Boolean]("keep"))
    // no cleaned text → NULL hash (not md5('')): the one empty-list
    // representation SQL engines agree about
    assert(out.isNullAt(out.fieldIndex("cleaned_md5")))
  }
}
