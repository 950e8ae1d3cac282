package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** The `example` CLI output must stay a VALID config: it round-trips
  * through the same structural validation + parse the `validate`
  * subcommand runs, and declares every major section. */
class CliExampleSpec extends AnyFunSuite {

  test("example yaml passes schema validation and parses") {
    ConfigSchema.validateString(SqlFlowCli.exampleYaml)
    val conf = Config.fromString(SqlFlowCli.exampleYaml)
    assert(conf.pipeline.source.kind == "kafka")
    assert(conf.pipeline.sink.kind == "kafka")
    assert(conf.pipeline.handler.sql.nonEmpty)
    assert(conf.commands.nonEmpty && conf.udfs.nonEmpty && conf.tables.nonEmpty)
    assert(conf.pipeline.onError.policy.equalsIgnoreCase("dlq"))
  }

  test("validate accepts the shipped non-SQL handler configs (window/admission blocks instead of sql)") {
    // the old validate required handler.sql and REJECTED every shipped
    // daemon example; run the real subcommand (no Spark session on
    // this path) over each
    Seq("examples/neardup.filter.yml", "examples/cosinedup.filter.yml",
      "examples/hammingdup.filter.yml", "examples/native.window.yml")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .foreach { p =>
        SqlFlowCli.main(Array("validate", p)) // exits nonzero on failure
      }
  }

  test("compact-state rejects wrong arity before touching any session") {
    val err = intercept[IllegalArgumentException] {
      SqlFlowCli.main(Array("compact-state", "/tmp/x", "text"))
    }
    assert(err.getMessage.contains("usage: compact-state"), err.getMessage)
  }
}
