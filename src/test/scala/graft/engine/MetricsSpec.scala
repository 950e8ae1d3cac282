package graft.engine

import java.net.URI

import graft.SparkTestBase

/** /metrics Prometheus exposition + /debug?sql= live-query endpoint. */
class MetricsSpec extends SparkTestBase {

  private def get(url: String): (Int, String) = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = scala.io.Source.fromInputStream(is).mkString
    (code, body)
  }

  test("metrics counters render in Prometheus text format") {
    val m = new GraftMetrics
    m.recordBatch(100, 0.5)
    m.recordBatch(50, 0.25)
    m.recordError()
    m.recordFlush(7)
    val srv = new MetricsServer(spark, m, 0)
    srv.start()
    try {
      val (code, body) = get(s"http://localhost:${srv.boundPort}/metrics")
      assert(code == 200)
      assert(body.contains("sqlflow_message_count 150"))
      assert(body.contains("sqlflow_error_count 1"))
      assert(body.contains("sqlflow_sink_flush_rows 7"))
      assert(body.contains("sqlflow_batch_count 2"))
      assert(body.contains("sqlflow_batch_seconds_total 0.75"))
    } finally srv.stop()
  }

  test("debug endpoint runs SQL on the live session") {
    val srv = new MetricsServer(spark, new GraftMetrics, 0)
    srv.start()
    try {
      val (code, body) = get(
        s"http://localhost:${srv.boundPort}/debug?sql=" +
          java.net.URLEncoder.encode("SELECT 1 + 1 AS two", "UTF-8"))
      assert(code == 200)
      assert(body.trim == """{"two":2}""")

      val (badCode, badBody) = get(
        s"http://localhost:${srv.boundPort}/debug?sql=" +
          java.net.URLEncoder.encode("SELECT FROM WHERE", "UTF-8"))
      assert(badCode == 400)
      assert(badBody.contains("error"))

      val (missCode, _) = get(s"http://localhost:${srv.boundPort}/debug")
      assert(missCode == 400)
    } finally srv.stop()
  }
}
