package graft.engine

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

import scala.jdk.CollectionConverters._

/** Every shipped example config must parse/validate, and the batch-
  * invokable ones must produce the expected rows from the shipped
  * fixture (the reference's `config validate` + `dev invoke` story). */
class ExamplesSpec extends SparkTestBase {

  private val examplesDir = Paths.get("examples")
  private val fixture = "examples/fixtures/click_events.jsonl"

  test("all example configs parse, schema-validate, and model-validate") {
    val ymls = Files.list(examplesDir).iterator().asScala
      .filter(_.toString.endsWith(".yml")).toSeq
    assert(ymls.size >= 12)
    ymls.foreach { p =>
      val raw = Files.readString(p)
      val errs = ConfigSchema.validate(Config.parseTree(raw))
      assert(errs.isEmpty, s"$p: ${errs.mkString("; ")}")
      val conf = Config.fromString(raw)
      assert(conf.pipeline.handler.sql.nonEmpty, s"$p: empty handler sql")
      assert(conf.pipeline.source.kind.nonEmpty, s"$p: missing source type")
    }
  }

  test("basic.agg.mem example: per-city counts") {
    val got = Invoke.invoke(spark, "examples/basic.agg.mem.yml", fixture)
      .toJSON.collect().toSeq
    assert(got == Seq(
      """{"city":"New York","city_count":2}""",
      """{"city":"Baltimore","city_count":1}"""))
  }

  test("enrich example: struct literal + static column, all rows kept") {
    val got = Invoke.invoke(spark, "examples/enrich.yml", fixture).collect()
    assert(got.length == 3)
    val first = Invoke.invoke(spark, "examples/enrich.yml", fixture)
      .selectExpr("nested_city.something", "extra").collect().map(_.toString).toSet
    assert(first == Set("[New York,static_column]", "[Baltimore,static_column]"))
  }

  test("csv.mem.join example: dedup lookup joins state names") {
    val got = Invoke.invoke(spark, "examples/csv.mem.join.yml", fixture)
      .toJSON.collect().toSeq
    assert(got == Seq(
      """{"city":"Baltimore","state_full":"Maryland"}""",
      """{"city":"New York","state_full":"New York"}""",
      """{"city":"New York","state_full":"New York"}"""))
  }

  test("tumbling.window example: upsert accumulates, manager drains") {
    val got = Invoke.invoke(spark, "examples/tumbling.window.yml", fixture,
        flushWindow = true)
      .toJSON.collect().toSeq
    assert(got == Seq(
      """{"bucket":"2015-12-12T19:00:00","city":"Baltimore","count":1}""",
      """{"bucket":"2015-12-12T19:00:00","city":"New York","count":2}"""))
  }

  test("udf example: parse_domain groups by registered domain") {
    val got = Invoke.invoke(spark, "examples/udf.yml", fixture)
      .toJSON.collect().toSeq
    assert(got == Seq(
      """{"domain":"example.co.uk","n":1}""",
      """{"domain":"example.com","n":1}""",
      """{"domain":"example.org","n":1}"""))
  }
}
