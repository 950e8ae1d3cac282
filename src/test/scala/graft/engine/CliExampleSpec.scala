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
}
