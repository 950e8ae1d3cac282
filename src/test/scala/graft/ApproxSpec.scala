package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** q19's HLL sketch has no value-exact oracle (engines' sketches
  * differ); pin its accuracy against the exact count instead. */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct (rsd=0.01, as q19 uses) within 3% of exact") {
    val li = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
    val got = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.03, s"${r.getString(0)}: approx=$approx exact=$exact err=$relErr")
    }
  }
}
