package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // separable task: y = 1 iff feature 1 is high
  private def planted = (0 until 200).map { i =>
    val hi = i % 2 == 0
    (if (hi) 1.0 else 0.0,
      Seq(1.0, if (hi) 0.9 else 0.1, 0.5))
  }.toDF("y", "x")

  test("logregFit learns the separating direction on planted data") {
    val w = Classifier.logregFit(planted, "y", "x", iters = 10, lr = 1.0)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(w(1) > 0.5, s"discriminative weight must grow positive: $w")
    assert(math.abs(w(2)) < w(1),
      s"non-informative feature must stay smaller: $w")
    // the learned model must actually separate the classes
    def sigma(x: Seq[Double]) =
      1.0 / (1.0 + math.exp(-x.zipWithIndex.map { case (v, j) => v * w(j) }.sum))
    val (pos, neg) = (sigma(Seq(1.0, 0.9, 0.5)), sigma(Seq(1.0, 0.1, 0.5)))
    assert(pos > 0.6 && neg < 0.45 && pos - neg > 0.2,
      s"model must separate the classes: pos=$pos neg=$neg")
  }

  test("logregFit is invariant to input partitioning (deterministic)") {
    val a = Classifier.logregFit(planted.repartition(1), "y", "x", iters = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Classifier.logregFit(planted.repartition(13), "y", "x", iters = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
