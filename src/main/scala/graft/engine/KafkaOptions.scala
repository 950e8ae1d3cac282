package graft.engine

/** Maps the reference's librdkafka-style security settings
  * (`kafka.sasl-tls.yml:6-20`, config.py KafkaSSLConfig/KafkaSASLConfig)
  * onto the Spark Kafka connector's `kafka.*` option namespace, which
  * passes through to the JVM Kafka client:
  *
  *  - `security_protocol`       → `kafka.security.protocol`
  *  - `sasl.mechanism/username/password`
  *        → `kafka.sasl.mechanism` + a `kafka.sasl.jaas.config` login
  *          module line (Plain vs Scram chosen from the mechanism)
  *  - `ssl.ca_location`         → PEM truststore location
  *  - `ssl.certificate_location` + `ssl.key_location`
  *        → inline PEM keystore (`ssl.keystore.certificate.chain` /
  *          `ssl.keystore.key`, KIP-651): the JVM client's
  *          location-based PEM keystore wants cert+key concatenated in
  *          ONE file, but librdkafka configs keep them separate — the
  *          inline form is the faithful translation
  *  - `ssl.key_password`        → `kafka.ssl.key.password`
  *  - `ssl.endpoint_identification_algorithm: none`
  *        → empty `kafka.ssl.endpoint.identification.algorithm`
  *
  * Pure mapping (no broker needed) so it is unit-testable in this
  * environment; the connector jar applies them at runtime.
  */
object KafkaOptions {

  def securityOptions(
      securityProtocol: Option[String],
      ssl: Option[KafkaSslConf],
      sasl: Option[KafkaSaslConf]): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    securityProtocol.foreach(p => b += "kafka.security.protocol" -> p)
    sasl.foreach { s =>
      b += "kafka.sasl.mechanism" -> s.mechanism
      val module = s.mechanism.toUpperCase match {
        case "PLAIN" => "org.apache.kafka.common.security.plain.PlainLoginModule"
        case m if m.startsWith("SCRAM") =>
          "org.apache.kafka.common.security.scram.ScramLoginModule"
        case other => throw new IllegalArgumentException(
          s"unsupported sasl mechanism: $other")
      }
      b += "kafka.sasl.jaas.config" ->
        s"""$module required username="${s.username}" password="${s.password}";"""
    }
    ssl.foreach { s =>
      s.caLocation.foreach { ca =>
        b += "kafka.ssl.truststore.type" -> "PEM"
        b += "kafka.ssl.truststore.location" -> ca
      }
      (s.certificateLocation, s.keyLocation) match {
        case (Some(cert), Some(key)) =>
          b += "kafka.ssl.keystore.type" -> "PEM"
          b += "kafka.ssl.keystore.certificate.chain" -> readPem(cert)
          b += "kafka.ssl.keystore.key" -> readPem(key)
        case (None, None) => ()
        case _ => throw new IllegalArgumentException(
          "ssl certificate_location and key_location must be set together")
      }
      s.keyPassword.foreach(p => b += "kafka.ssl.key.password" -> p)
      s.endpointIdentificationAlgorithm.foreach { a =>
        b += "kafka.ssl.endpoint.identification.algorithm" ->
          (if (a.equalsIgnoreCase("none")) "" else a)
      }
    }
    b.result()
  }

  private def readPem(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8).trim
}
