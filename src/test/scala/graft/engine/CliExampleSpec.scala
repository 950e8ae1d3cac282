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
    // this path) over each. dispatch returns a status instead of
    // calling sys.exit, so a regression fails THIS test rather than
    // terminating the sbt test JVM (round-9 advisor finding).
    Seq("examples/neardup.filter.yml", "examples/cosinedup.filter.yml",
      "examples/hammingdup.filter.yml", "examples/native.window.yml",
      "examples/image.dedup.hamming.yml",
      "examples/embedding.dedup.simhash.yml")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .foreach { p =>
        assert(SqlFlowCli.dispatch(Array("validate", p)) == 0, p)
      }
  }

  test("validate returns nonzero (without exiting the JVM) on a broken config") {
    val p = java.nio.file.Files.createTempFile("graft_badcfg", ".yml")
    java.nio.file.Files.writeString(p, "pipeline:\n  source: {type: nope}\n")
    try assert(SqlFlowCli.dispatch(Array("validate", p.toString)) == 1)
    finally java.nio.file.Files.deleteIfExists(p)
  }

  test("compact-state rejects wrong arity before touching any session") {
    val err = intercept[IllegalArgumentException] {
      SqlFlowCli.main(Array("compact-state", "/tmp/x", "text"))
    }
    assert(err.getMessage.contains("usage: compact-state"), err.getMessage)
  }
}
