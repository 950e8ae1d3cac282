package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("Kneser-Ney surprisal matches the hand-computed closed form") {
    // corpus "a b" / "c b" / "a d": all bigram counts 1; d = 0.75
    //   P(b|a) = 0.25/2 + 0.75·2/2 · (2/3) = 0.625
    //   P(b|c) = 0.25/1 + 0.75·1/1 · (2/3) = 0.75
    //   P(d|a) = 0.25/2 + 0.75·2/2 · (1/3) = 0.375
    val dir = java.nio.file.Files.createTempDirectory("graft_kn").toString
    Seq((1L, "a b", "en", "s", 3L), (2L, "c b", "en", "s", 3L),
        (3L, "a d", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = graft.queries.Registry.all
      .find(_.name == "t99_kneser_ney_surprisal").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def s(p: Double) = math.round(-math.log(p) * 1e4) / 1e4
    assert(got == Seq((1L, 1L, s(0.625)), (2L, 1L, s(0.75)), (3L, 1L, s(0.375))),
      got.toString)
  }

  test("langId identifies stopword-marked languages and CJK") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it is a good day for walking in to the park"),
      ("de", "der hund und die katze sind nicht mit dem auto zu schnell auf der straße"),
      ("fr", "le chat est dans la maison et les enfants sont pour une promenade sur le pont au matin"),
      ("es", "el perro y los gatos son una familia en la casa con para siempre por ahora"),
      ("zh", "今天 天气 很好 我们 一起 去 公园 散步 吧"),
      ("und", "xxyyzz qqqrrr ssstt uuuvv"))
    val got = samples.toDF("expected", "text")
      .select(col("expected"), langId(col("text")).as("pred"))
      .collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"expected ${r.getString(0)} got ${r.getString(1)}")
    }
  }

  test("wordShingles produces n-grams and whole-text fallback for short docs") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(wordShingles(col("t"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0).toSet)
    assert(rows(0) == Set("a b c", "b c d"))
    assert(rows(1) == Set("a b"))
  }

  test("quality metrics are sane") {
    val df = Seq("the the the the").toDF("t").select(
      stopwordRatio(tokens(col("t"))).as("sw"),
      distinctRatio(tokens(col("t"))).as("dr"),
      avgTokenLen(tokens(col("t"))).as("al"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.25)
    assert(r.getDouble(2) == 3.0)
  }

  test("bpeTokenCount counts alpha runs, digit runs, and symbols") {
    val got = Seq("hello world42, foo-bar!").toDF("t")
      .select(bpeTokenCount(col("t")).cast("long")).collect()(0).getLong(0)
    // hello, world, 42, ',', foo, '-', bar, '!'
    assert(got == 8L)
  }
}
