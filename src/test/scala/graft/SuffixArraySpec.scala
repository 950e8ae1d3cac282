package graft

import graft.operators.SuffixArray

/** Prefix-doubling suffix ranks ≡ a brute-force suffix sort, including
  * ties (identical documents), prefix-of-longer suffixes, single-char
  * and empty documents. */
class SuffixArraySpec extends SparkTestBase {
  import spark.implicits._

  private def bruteRanks(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sufs = for {
      (id, t) <- docs if t.nonEmpty
      off <- 0 until t.length
    } yield ((id, off.toLong), t.substring(off))
    // dense rank over distinct suffix CONTENT, lexicographic
    val order = sufs.map(_._2).distinct.sorted.zipWithIndex.toMap
    sufs.map { case (k, s) => k -> order(s).toLong }.toMap
  }

  private def got(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    SuffixArray.suffixRanks(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("ranks equal brute-force lexicographic suffix sort") {
    val docs = Seq(
      (1L, "banana"), (2L, "bananas"), (3L, "abracadabra"),
      (4L, "x"), (5L, ""), (6L, "aaaa"))
    assert(got(docs) == bruteRanks(docs))
  }

  test("identical documents share ranks (ties survive convergence)") {
    val docs = Seq((1L, "dup dup"), (2L, "dup dup"), (3L, "other"))
    val g = got(docs)
    val b = bruteRanks(docs)
    assert(g == b)
    // every suffix of doc 1 ties its twin in doc 2
    (0L until 7L).foreach { off =>
      assert(g((1L, off)) == g((2L, off)), s"off=$off")
    }
  }

  test("suffixes never cross document boundaries") {
    // if suffixes crossed, doc 1's tail "b"+doc2 text would out-rank "b"
    val docs = Seq((1L, "ab"), (2L, "aa"))
    val g = got(docs)
    val b = bruteRanks(docs)
    assert(g == b)
    // order: "a"(2,1) < "aa"(2,0) < "ab"(1,0) < "b"(1,1)
    assert(g((2L, 1L)) == 0L && g((2L, 0L)) == 1L &&
      g((1L, 0L)) == 2L && g((1L, 1L)) == 3L)
  }
}
