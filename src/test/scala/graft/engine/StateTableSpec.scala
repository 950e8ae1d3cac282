package graft.engine

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Direct StateTable coverage, in particular the distributed spill
  * path (local → DataFrame switch past localLimit), which the golden
  * config tests never reach. */
class StateTableSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("count", IntegerType),
    StructField("tag", StringType)))

  private def upsertSets =
    Seq(SqlDialect.Additive("count"), SqlDialect.Replace("tag"))

  test("upsert accumulates additively and replaces across the spill boundary") {
    val t = new StateTable(spark, "st_spill", schema,
      uniqueKeys = Seq("k"), localLimit = 2)
    // batch 1: local mode (2 keys)
    t.upsert(Seq(("a", 1, "t1"), ("b", 2, "t1")).toDF("k", "count", "tag"),
      upsertSets)
    // batch 2: 4 keys total → crosses localLimit → one-way spill
    t.upsert(Seq(("a", 10, "t2"), ("c", 3, "t2"), ("d", 4, "t2"))
      .toDF("k", "count", "tag"), upsertSets)
    // batch 3: distributed-mode upsert
    t.upsert(Seq(("b", 20, "t3"), ("d", 40, "t3")).toDF("k", "count", "tag"),
      upsertSets)

    val rows = spark.table("st_spill")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(
      ("a", 11, "t2"), ("b", 22, "t3"), ("c", 3, "t2"), ("d", 44, "t3")))
  }

  test("deleteWhere and truncate work in distributed mode") {
    val t = new StateTable(spark, "st_spill2", schema,
      uniqueKeys = Seq("k"), localLimit = 1)
    t.upsert(Seq(("a", 1, "x"), ("b", 2, "x"), ("c", 3, "x"))
      .toDF("k", "count", "tag"), upsertSets)
    t.deleteWhere("count >= 3")
    assert(spark.table("st_spill2").collect().map(_.getString(0)).sorted.toSeq
      == Seq("a", "b"))
    t.truncate()
    assert(spark.table("st_spill2").count() == 0)
  }

  test("insert without unique keys appends; with keys upserts by key") {
    val t = new StateTable(spark, "st_plain", schema,
      uniqueKeys = Seq(), localLimit = 100)
    t.insert(Seq(("a", 1, "x"), ("a", 1, "x")).toDF("k", "count", "tag"))
    assert(spark.table("st_plain").count() == 2)
  }
}
