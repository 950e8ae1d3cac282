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
