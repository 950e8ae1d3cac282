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

  private def bruteSpans(docs: Seq[(Long, String)],
      minLen: Int): Set[(Long, Long, Long)] = {
    val grams = for {
      (id, t) <- docs
      off <- 0 to t.length - minLen
    } yield ((id, off.toLong), t.substring(off, off + minLen))
    val counts = grams.groupBy(_._2).map { case (g, v) => g -> v.size }
    val marked = grams.filter(g => counts(g._2) >= 2).map(_._1)
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2).sorted }
    marked.flatMap { case (id, offs) =>
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      offs.foreach { o =>
        if (spans.nonEmpty && o <= spans.last._2)
          spans(spans.length - 1) = (spans.last._1, o + minLen)
        else spans += ((o, o + minLen))
      }
      spans.map(s => (id, s._1, s._2))
    }.toSet
  }

  test("exactDupSpans equals brute-force gram marking + island merge") {
    // doc 1/2 share "shared phrase one" (17 chars); doc 1 repeats
    // "echo echo " internally; doc 3 is clean
    val docs = Seq(
      (1L, "AA shared phrase one BB echo echo echo echo CC"),
      (2L, "xx shared phrase one yy"),
      (3L, "completely unrelated text here"))
    val g = SuffixArray.exactDupSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", minLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = bruteSpans(docs, 8)
    assert(g == want, s"got=$g want=$want")
    assert(g.exists(_._1 == 1L) && g.exists(_._1 == 2L))
    assert(!g.exists(_._1 == 3L), "clean doc must have no spans")
  }

  test("exactDupSpans: no duplicates → empty output") {
    val docs = Seq((1L, "abcdefgh"), (2L, "ijklmnop"))
    assert(SuffixArray.exactDupSpans(
      docs.toDF("doc_id", "text"), "doc_id", "text", minLen = 4).count() == 0)
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
