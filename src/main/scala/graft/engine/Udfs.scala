package graft.engine

import org.apache.spark.sql.SparkSession

/** Scala-native UDF registry, replacing the reference's import-a-
  * -Python-function-by-path mechanism (`pipeline.py:302-308`,
  * `udf.yml`). Built-in implementations cover the UDFs the reference
  * ships; arbitrary Scala UDFs load reflectively from any object
  * extending [[UdfModule]]. */
trait UdfModule {
  def register(spark: SparkSession, functionName: String): Unit
}

object Udfs {

  /** Engine-internal SQL functions the dialect shim rewrites to.
    * Registered imperatively so any session that runs handler SQL has
    * them, extensions-configured or not (idempotent). */
  def ensureEngineFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("duck_extract"),
      new ExpressionInfo("graft", "duck_extract", "duck_extract(col, 'key')"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "duck_extract(col, 'key')")
        graft.functions.DuckArrowExtract(args.head, args(1))
      })
  }

  def register(spark: SparkSession, conf: UdfConf): Unit =
    builtins.get(conf.importPath) match {
      case Some(fn) => fn(spark, conf.functionName)
      case None => // reflective load: import_path names an object extending UdfModule
        val clazz = Class.forName(conf.importPath + "$")
        clazz.getField("MODULE$").get(null) match {
          case m: UdfModule => m.register(spark, conf.functionName)
          case other => throw new IllegalArgumentException(
            s"${conf.importPath} is not a UdfModule (got ${other.getClass})")
        }
    }

  private val builtins: Map[String, (SparkSession, String) => Unit] = Map(
    "sqlflow.udf.url.parse_domain" -> ((s, n) => s.udf.register(n, parseDomain _)),
    "graft.udf.parse_domain" -> ((s, n) => s.udf.register(n, parseDomain _)),
    "graft.udf.ip_to_long" -> ((s, n) => s.udf.register(n, ipToLong _)))

  // Multi-label public suffixes for registered-domain extraction — a
  // compact stand-in for the public-suffix list used by the reference's
  // tldextract UDF (`sqlflow/udf/url.py:6-8`).
  private val multiSuffixes = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.hk", "com.tw", "co.kr")

  /** Registered domain of a URL: "https://a.b.google.com/x" → "google.com". */
  def parseDomain(url: String): String = {
    if (url == null) return null
    var host = url
    val schemeIdx = host.indexOf("://")
    if (schemeIdx >= 0) host = host.substring(schemeIdx + 3)
    host = host.takeWhile(c => c != '/' && c != '?' && c != '#')
    val atIdx = host.indexOf('@')
    if (atIdx >= 0) host = host.substring(atIdx + 1)
    host = host.takeWhile(_ != ':')
    val labels = host.split("\\.").filter(_.nonEmpty)
    if (labels.length <= 2) return labels.mkString(".")
    val lastTwo = labels.takeRight(2).mkString(".")
    if (multiSuffixes.contains(lastTwo)) labels.takeRight(3).mkString(".")
    else lastTwo
  }

  /** IPv4 dotted-quad → long, the comparable form for the reference's
    * `ip::inet BETWEEN start_ip AND end_ip` range join
    * (attach-geoip.yml:36). */
  def ipToLong(ip: String): java.lang.Long = {
    if (ip == null) return null
    val parts = ip.trim.split("\\.")
    if (parts.length != 4) return null
    try {
      var acc = 0L
      parts.foreach { p =>
        val v = p.toInt
        if (v < 0 || v > 255) return null
        acc = acc * 256 + v
      }
      java.lang.Long.valueOf(acc)
    } catch { case _: NumberFormatException => null }
  }
}
