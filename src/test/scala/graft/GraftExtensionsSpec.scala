package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must be callable from SQL text when the
  * extension is installed (spark.sql.extensions=graft.GraftExtensions). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // force a NEW session so the extensions config applies (getOrCreate
    // would return the shared extension-less test session), then restore
    // the shared session as default for other suites
    val base = SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions rather than the config string: spark.sql.extensions
    // is read from the SparkContext conf at CONTEXT creation, and the
    // suite JVM's context already exists (the config path is exercised
    // by SqlFlowCli, whose JVM starts fresh)
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("native expressions resolve from SQL text") {
    // isolated session builder may reuse SparkTestBase's context but the
    // extensions apply to this session's function registry
    val row = spark.sql(
      """SELECT
        |  word_shingles('The cat  sat on the mat', 3) AS sh,
        |  lang_id('the cat of the hat is that it') AS lang,
        |  rolling_hash64('abc') AS rh,
        |  vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot,
        |  text_stats('a b a').n_distinct AS nd,
        |  size(minhash_sig(array('x', 'y'), 8, 42L)) AS sig_len,
        |  size(hyperplane_bands(array(1.0F, 0.5F), 2, 4, 8, 7L)) AS nbands,
        |  simhash64(array(xxhash64('a'), xxhash64('b'))) AS simh,
        |  nfc_normalize('café') AS nfc
        |""".stripMargin).head()

    assert(row.getSeq[String](0) ==
      Seq("the cat sat", "cat sat on", "sat on the", "on the mat"))
    assert(row.getString(1) == "en")
    assert(row.getLong(2) == ('a' * 31L * 31 + 'b' * 31 + 'c'))
    assert(row.getDouble(3) == 11.0)
    assert(row.getLong(4) == 2L)
    assert(row.getInt(5) == 8)
    assert(row.getInt(6) == 4)
    assert(row.getString(8) == "café")
  }

  test("html_extract runs the full strip/decode chain from SQL text") {
    val row = spark.sql(
      """SELECT html_extract(
        |  '<html><script>var x = 1;</script><p>A &amp; B</p><p>c</p></html>')
        |  AS t""".stripMargin).head()
    assert(row.getString(0) == "A & B c")
  }

  test("duck_extract dispatches on struct vs JSON-string input") {
    val row = spark.sql(
      """SELECT
        |  duck_extract(named_struct('city', 'Austin', 'n', 7), 'city') AS s1,
        |  duck_extract(named_struct('city', 'Austin', 'n', 7), 'n') AS s2,
        |  duck_extract('{"city":"Austin","n":7}', 'city') AS j1,
        |  duck_extract(named_struct('a', named_struct('b', 'x')), 'a') AS nested
        |""".stripMargin).head()
    assert(row.getString(0) == "Austin")
    assert(row.getString(1) == "7") // ->> returns text: primitives cast
    assert(row.getString(2) == "Austin")
    assert(row.getStruct(3).getString(0) == "x") // structs stay chainable
  }
}
