package graft

import graft.operators.Eval

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Double, Boolean)]): (Long, Long, Double) = {
    val r = Eval.rocAuc(rows.toDF("id", "score", "label"),
      "score", "label", "id").collect()(0)
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("perfect separation gives 1.0, inverted gives 0.0") {
    val perfect = (1 to 50).map(i =>
      (i.toLong, i.toDouble, i > 25))
    assert(auc(perfect) == ((25L, 25L, 1.0)))
    val inverted = perfect.map { case (id, s, l) => (id, -s, l) }
    assert(auc(inverted)._3 == 0.0)
  }

  test("hand-computed small case") {
    // scores: pos {3, 1}, neg {2, 0} → pairs won by pos: (3>2),(3>0),(1>0)
    // = 3 of 4 → AUC 0.75
    val rows = Seq((1L, 3.0, true), (2L, 1.0, true),
      (3L, 2.0, false), (4L, 0.0, false))
    assert(auc(rows)._3 == 0.75)
  }

  test("tied scores get midranks — the standard tie-corrected Mann-Whitney value") {
    // pos scores {2, 1}, neg scores {2, 0}: pos2-vs-neg2 is a tie
    // (counts 1/2), pos2>neg0, pos1<neg2, pos1>neg0 →
    // (0.5 + 1 + 0 + 1) / 4 = 0.625. An id tie-break would report
    // 0.75 or 0.5 depending on which side of the tie the ids land.
    val rows = Seq((1L, 2.0, true), (2L, 1.0, true),
      (3L, 2.0, false), (4L, 0.0, false))
    assert(auc(rows)._3 == 0.625)
    // flipping which ids carry the tied scores must not move the value
    val swapped = Seq((3L, 2.0, true), (4L, 1.0, true),
      (1L, 2.0, false), (2L, 0.0, false))
    assert(auc(swapped)._3 == 0.625)
  }

  test("all-tied scores give exactly 0.5") {
    val rows = (1 to 40).map(i => (i.toLong, 7.0, i % 2 == 0))
    assert(auc(rows)._3 == 0.5)
  }

  test("result is invariant to input partitioning and row order") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 2000).map { i =>
      val pos = i % 3 == 0
      (i.toLong, rnd.nextGaussian() + (if (pos) 0.8 else 0.0), pos)
    }
    val base = auc(rows)
    val shuffled = auc(rnd.shuffle(rows))
    assert(base == shuffled)
    val repart = Eval.rocAuc(
      rows.toDF("id", "score", "label").repartition(17),
      "score", "label", "id").collect()(0)
    assert((repart.getLong(0), repart.getLong(1), repart.getDouble(2)) == base)
    // a separated-by-0.8-sigma scorer sits in a sane AUC band
    assert(base._3 > 0.6 && base._3 < 0.85, base.toString)
  }
}
