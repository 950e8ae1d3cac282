package graft.engine

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** YAML pipeline-config model, mirroring the reference's surface
  * (sql-flow `sqlflow/config.py:13-192`: Conf(pipeline, tables, udfs,
  * commands); pipeline = batch_size / flush_interval_seconds / source /
  * handler / sink / on_error). Field names follow the reference YAML so
  * its shipped configs parse unchanged.
  */
/** librdkafka-style TLS settings (`kafka.sasl-tls.yml:10-15`,
  * reference config.py KafkaSSLConfig). */
final case class KafkaSslConf(
    caLocation: Option[String],
    certificateLocation: Option[String],
    keyLocation: Option[String],
    keyPassword: Option[String],
    endpointIdentificationAlgorithm: Option[String])
final case class KafkaSaslConf(
    mechanism: String, username: String, password: String)

final case class KafkaSourceConf(
    brokers: Seq[String], groupId: String, autoOffsetReset: String,
    topics: Seq[String],
    securityProtocol: Option[String] = None,
    ssl: Option[KafkaSslConf] = None,
    sasl: Option[KafkaSaslConf] = None)
final case class WebsocketSourceConf(uri: String)
final case class WebhookSourceConf(
    port: Int, signingSecret: Option[String], signatureHeader: String)
/** Extension (not in reference): file/dir source for dev + tests. */
final case class FileSourceConf(path: String, format: String)
/** Extension: the embedded graftqueue broker (Kafka-shaped partitioned
  * log over TCP) — the in-sandbox stand-in that lets the Kafka
  * consume-loop contract be integration-tested end-to-end (see
  * docs/adr/0001-kafka-connector.md). */
final case class QueueSourceConf(
    brokers: String, topic: String, autoOffsetReset: String = "earliest")
final case class QueueSinkConf(brokers: String, topic: String)

final case class SourceConf(
    kind: String,
    kafka: Option[KafkaSourceConf] = None,
    websocket: Option[WebsocketSourceConf] = None,
    webhook: Option[WebhookSourceConf] = None,
    file: Option[FileSourceConf] = None,
    queue: Option[QueueSourceConf] = None)

/** Declarative tumbling-window handler (`handlers.NativeWindow`): the
  * Spark-native watermarked streaming aggregation, YAML-reachable as an
  * alternative to the state-table + poll-thread compat path. Emission
  * is event-time append-mode (once per closed window) instead of the
  * reference's processing-time poll — the documented semantic upgrade
  * (streaming/NativeWindow.scala). */
final case class NativeWindowConf(
    timeColumn: String,
    keys: Seq[String],
    duration: String,
    watermark: String,
    /** `tumbling` (default), `sliding`, or `session`. Session windows
      * are per-key activity bursts separated by ≥ `duration` of
      * silence (the duration doubles as the session gap), Spark's
      * native `session_window` with engine-managed session merging.
      * Sliding windows advance by [[slide]] and overlap when
      * slide < duration. */
    kind: String = "tumbling",
    /** Hop interval for `kind: sliding` (required there, meaningless
      * otherwise — the schema rejects a mismatch). */
    slide: Option[String] = None,
    /** Columns to additively SUM per window alongside the count — the
      * reference ADR's declared windowing scope ("Additive
      * aggregations (COUNT, SUM)"). Emitted as `sum_<leaf>`. */
    sums: Seq[String] = Seq(),
    /** `append` (default): emit each window once, on watermark close —
      * replay-stable. `update`: re-emit a window's current aggregate
      * every trigger it changes in — the reference manager's
      * re-emission behavior for late rows; sink must tolerate upserts. */
    mode: String = "append",
    /** Event-identity columns. Non-empty → duplicate events (source
      * replays, at-least-once redelivery) within the watermark horizon
      * are dropped BEFORE aggregation: exactly-once effect per event
      * with state bounded by distinct ids per horizon
      * (dropDuplicatesWithinWatermark). */
    dedupKeys: Seq[String] = Seq(),
    /** State-store partition count for the streaming aggregation
      * (applied as `spark.sql.shuffle.partitions` when the daemon
      * starts; the state layout is FIXED at the first batch, so set it
      * once per checkpoint). Size to state volume ÷ executor count:
      * every trigger pays one store commit per partition, so
      * over-partitioning a small-keyspace window (the default 32/200
      * on a 5-key daemon) spends most of each trigger on empty store
      * commits — measured 2× throughput moving 32→8 on the bench
      * workload (tools/NativeWindowProbe). Unset = session default. */
    statePartitions: Option[Int] = None,
    /** State-store backend for the daemon's stateful operators:
      * `"rocksdb"` → RocksDB provider (state lives off-heap/on-disk
      * per executor — open-key cardinality is no longer bounded by
      * executor heap, the 100×-scale default), `"hdfs"` → the
      * default in-JVM-heap HDFS-backed provider. Applied as
      * `spark.sql.streaming.stateStore.providerClass` when the
      * daemon starts; like state_partitions it is FIXED at the first
      * batch of a checkpoint (switching backends needs a fresh
      * checkpoint dir). Unset = session default (hdfs). */
    stateStore: Option[String] = None)

/** Streaming near-dup admission handler (`handlers.NearDupFilter`):
  * the `Dedup.streamingNearDupFilter` discipline declared in YAML.
  * Every micro-batch is deduped within itself (MinHash-LSH pairs,
  * min-id canonical survives) and probed against the PERSISTED band
  * index of everything previously admitted; survivors flow to the
  * sink and are then committed to the index under `state_dir`
  * (parquet artifacts on HDFS/S3 — state is disk, never executor
  * memory). `id_column` must be numeric, `text_column` a top-level
  * JSON string field. */
final case class NearDupConf(
    idColumn: String,
    textColumn: String,
    stateDir: String,
    ngram: Int = 3,
    threshold: Double = 0.7,
    numHashes: Int = 64,
    bands: Int = 32,
    seed: Long = 42L,
    /** Shuffle-partition count for the daemon's per-trigger joins
      * (band self-join, candidate verify, probe) — snapshotted into
      * the query's cloned session at start, exactly like the window
      * daemon's `state_partitions`. Size to the per-TRIGGER batch,
      * not the cluster: a 50k-doc trigger on 8 partitions beats 32
      * (the joins are small; task-scheduling floor dominates).
      * Unset = session default. */
    shufflePartitions: Option[Int] = None,
    /** Fold the state's per-trigger bid partitions into a bucketed
      * compact version every k triggers (replay-safe floor `bid - 1`;
      * `Dedup.compactNearDupState`). This is what keeps per-trigger
      * probe IO batch-proportional on a long-lived stream — without
      * it the band/text scans grow with the admitted corpus. Unset =
      * never compact (short-lived or externally-maintained state). */
    compactEveryNTriggers: Option[Int] = None)

/** Streaming embedding near-dup admission handler
  * (`handlers.CosineDupFilter`): `CosineDedup.streamingCosineDupFilter`
  * declared in YAML — the NearDupFilter discipline for embedding
  * streams. `id_column` must be numeric, `vec_column` a top-level JSON
  * array of numbers (decoded to float32, the embedding storage type).
  * `dim` is the embedding dimensionality (hyperplane count input). */
final case class CosineDupConf(
    idColumn: String,
    vecColumn: String,
    stateDir: String,
    dim: Int,
    threshold: Double = 0.95,
    bands: Int = 16,
    rowsPerBand: Int = 12,
    seed: Long = 42L,
    shufflePartitions: Option[Int] = None,
    compactEveryNTriggers: Option[Int] = None,
    /** Corpus size the banding must hold at. When declared, config
      * validation REFUSES a `rows_per_band` whose signature space
      * saturates at this corpus (probe candidates growing with the
      * corpus, not the batch — the silent round-10 bench
      * misconfiguration), unless `on_undersized: warn` accepts it;
      * the daemon logs the computed dials + the converged
      * `CosineDedup.sizeBanding` plan at startup either way. */
    expectedCorpus: Option[Long] = None,
    /** `error` (default): refuse an undersized banding at config
      * load. `warn`: start anyway, logging the dials loudly. */
    onUndersized: String = "error")

/** Optional in-daemon fingerprinting for [[HammingDupConf]]: messages
  * carry RAW CONTENT instead of precomputed hash words, and the daemon
  * derives the two 64-bit words itself — `kind: ahash`/`phash` decode
  * base64 PNG bytes (`Multimodal.imageAHash64`/`imagePHash64`);
  * `kind: simhash` takes an EMBEDDING array (requires `dim`) and packs
  * the signs of 128 seeded hyperplane projections — the exact-copy
  * front door for embedding streams (positively-scaled copies flip
  * zero bits; expected flips between vectors at cosine t are
  * 128·acos(t)/π, so `max_hamming` 3 admits only near-identical
  * vectors while staying pigeonhole-exact). Undecodable content nulls
  * out and the row is dropped (the handler's IGNORE decode
  * contract). */
final case class FingerprintConf(contentColumn: String, kind: String,
    dim: Option[Int] = None)

/** Streaming perceptual-fingerprint admission handler
  * (`handlers.HammingDupFilter`): `HammingDedup.streamingHammingDupFilter`
  * declared in YAML — media fingerprints (two 64-bit hash words, the
  * layout every aHash/pHash/audio/keyframe signature emits) are
  * admitted unless within `max_hamming` bits of anything already
  * admitted. Recall is exact for `max_hamming` ≤ 15 (pigeonhole over
  * the fixed 16-chunk banding). With a `fingerprint` block the stream
  * carries the media bytes themselves and the daemon hashes them
  * in-flight (PNG → aHash/pHash → admission, end to end). */
final case class HammingDupConf(
    idColumn: String,
    w0Column: String,
    w1Column: String,
    stateDir: String,
    maxHamming: Int = 3,
    shufflePartitions: Option[Int] = None,
    compactEveryNTriggers: Option[Int] = None,
    fingerprint: Option[FingerprintConf] = None)

final case class HandlerConf(kind: String, sql: String, table: Option[String],
    window: Option[NativeWindowConf] = None,
    nearDup: Option[NearDupConf] = None,
    cosineDup: Option[CosineDupConf] = None,
    hammingDup: Option[HammingDupConf] = None)

final case class KafkaSinkConf(
    brokers: Seq[String], topic: String,
    securityProtocol: Option[String] = None,
    ssl: Option[KafkaSslConf] = None,
    sasl: Option[KafkaSaslConf] = None)
final case class SqlSubstitution(varName: String, kind: String)
final case class SqlCommandSinkConf(sql: String, substitutions: Seq[SqlSubstitution])
final case class IcebergSinkConf(catalogName: String, tableName: String)
final case class ClickhouseSinkConf(dsn: String, table: String)

final case class SinkConf(
    kind: String,
    kafka: Option[KafkaSinkConf] = None,
    sqlcommand: Option[SqlCommandSinkConf] = None,
    iceberg: Option[IcebergSinkConf] = None,
    clickhouse: Option[ClickhouseSinkConf] = None,
    queue: Option[QueueSinkConf] = None)

final case class ErrorPolicyConf(policy: String, dlq: Option[SinkConf])

final case class TumblingWindowConf(
    collectClosedWindowsSql: String,
    deleteClosedWindowsSql: String,
    pollIntervalSeconds: Int)
final case class TableManagerConf(
    tumblingWindow: Option[TumblingWindowConf], sink: Option[SinkConf])
final case class TableConf(name: String, sql: String, manager: Option[TableManagerConf])

final case class UdfConf(functionName: String, importPath: String)
final case class CommandConf(name: String, sql: String)

final case class PipelineConf(
    batchSize: Int,
    flushIntervalSeconds: Option[Int],
    source: SourceConf,
    handler: HandlerConf,
    sink: SinkConf,
    onError: ErrorPolicyConf,
    /** State-store backend (`rocksdb` | `hdfs`) for EVERY stateful
      * operator the started daemon plans — generalizes the
      * NativeWindow-only `window.state_store` knob to all streaming
      * starts (the window-level value, when present, overrides this).
      * Applied per-query at start via [[graft.streaming.StateStores]];
      * fixed at the first batch of a checkpoint. */
    stateStore: Option[String] = None)

final case class Conf(
    pipeline: PipelineConf,
    commands: Seq[CommandConf],
    tables: Seq[TableConf],
    udfs: Seq[UdfConf])

object Config {
  private val mapper = new ObjectMapper(new YAMLFactory())

  /** Render the reference's Jinja-style `{{ var|default('x') }}`
    * placeholders (`config.py:194-211`): variables resolve from
    * `overrides` first, then the process environment. */
  def renderTemplate(raw: String, overrides: Map[String, String]): String = {
    val pat = """\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\|\s*default\(\s*(?:'([^']*)'|"([^"]*)"|([^)\s]+))\s*\))?\s*\}\}""".r
    pat.replaceAllIn(raw, m => {
      val name = m.group(1)
      val default = Option(m.group(2)).orElse(Option(m.group(3))).orElse(Option(m.group(4)))
      val v = overrides.get(name).orElse(sys.env.get(name)).orElse(default)
      java.util.regex.Matcher.quoteReplacement(
        v.getOrElse(throw new IllegalArgumentException(
          s"config template variable '$name' has no value and no default")))
    })
  }

  def fromFile(path: String, overrides: Map[String, String] = Map()): Conf =
    fromString(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8),
      overrides)

  /** Rendered YAML tree, for structural validation (ConfigSchema). */
  def parseTree(raw: String, overrides: Map[String, String] = Map()): JsonNode =
    mapper.readTree(renderTemplate(raw, overrides))

  def fromString(raw: String, overrides: Map[String, String] = Map()): Conf = {
    val root = parseTree(raw, overrides)
    Conf(
      pipeline = parsePipeline(root.path("pipeline")),
      commands = root.path("commands").elements().asScala.map { c =>
        CommandConf(c.path("name").asText(""), c.path("sql").asText())
      }.toSeq,
      tables = root.path("tables").path("sql").elements().asScala.map(parseTable).toSeq,
      udfs = root.path("udfs").elements().asScala.map { u =>
        UdfConf(u.path("function_name").asText(), u.path("import_path").asText())
      }.toSeq)
  }

  private def optText(n: JsonNode, field: String): Option[String] =
    if (n.has(field) && !n.path(field).isNull) Some(n.path(field).asText()) else None

  private def parseSsl(k: JsonNode): Option[KafkaSslConf] =
    if (k.has("ssl")) {
      val s = k.path("ssl")
      Some(KafkaSslConf(
        caLocation = optText(s, "ca_location"),
        certificateLocation = optText(s, "certificate_location"),
        keyLocation = optText(s, "key_location"),
        keyPassword = optText(s, "key_password"),
        endpointIdentificationAlgorithm =
          optText(s, "endpoint_identification_algorithm")))
    } else None

  private def parseSasl(k: JsonNode): Option[KafkaSaslConf] =
    if (k.has("sasl")) {
      val s = k.path("sasl")
      Some(KafkaSaslConf(
        mechanism = s.path("mechanism").asText(""),
        username = s.path("username").asText(""),
        password = s.path("password").asText("")))
    } else None

  private def strSeq(n: JsonNode): Seq[String] =
    if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
    else if (n.isMissingNode || n.isNull) Seq()
    else Seq(n.asText())

  private def parsePipeline(p: JsonNode): PipelineConf = {
    if (p.isMissingNode) throw new IllegalArgumentException("config has no `pipeline` section")
    PipelineConf(
      batchSize = p.path("batch_size").asInt(1),
      flushIntervalSeconds =
        if (p.has("flush_interval_seconds")) Some(p.path("flush_interval_seconds").asInt())
        else None,
      source = parseSource(p.path("source")),
      handler = {
        val h = p.path("handler")
        HandlerConf(
          kind = h.path("type").asText(""),
          sql = h.path("sql").asText(""),
          table = if (h.has("table")) Some(h.path("table").asText()) else None,
          window = if (h.has("window")) {
            val w = h.path("window")
            import scala.jdk.CollectionConverters._
            Some(NativeWindowConf(
              timeColumn = w.path("time_column").asText(),
              keys = w.path("keys").elements().asScala.map(_.asText()).toSeq,
              duration = w.path("duration").asText(),
              watermark = w.path("watermark").asText("0 seconds"),
              kind = w.path("kind").asText("tumbling"),
              slide = if (w.has("slide")) Some(w.path("slide").asText())
              else None,
              sums = if (w.has("sums"))
                w.path("sums").elements().asScala.map(_.asText()).toSeq
              else Seq(),
              mode = w.path("mode").asText("append"),
              dedupKeys = if (w.has("dedup_keys"))
                w.path("dedup_keys").elements().asScala.map(_.asText()).toSeq
              else Seq(),
              statePartitions = if (w.has("state_partitions"))
                Some(w.path("state_partitions").asInt()) else None,
              stateStore = if (w.has("state_store"))
                Some(w.path("state_store").asText()) else None))
          } else None,
          nearDup = if (h.has("near_dup")) {
            val nd = h.path("near_dup")
            def req(k: String): String = {
              if (!nd.has(k)) throw new IllegalArgumentException(
                s"near_dup requires `$k`")
              nd.path(k).asText()
            }
            Some(NearDupConf(
              idColumn = req("id_column"),
              textColumn = req("text_column"),
              stateDir = req("state_dir"),
              ngram = nd.path("ngram").asInt(3),
              threshold = nd.path("threshold").asDouble(0.7),
              numHashes = nd.path("num_hashes").asInt(64),
              bands = nd.path("bands").asInt(32),
              seed = nd.path("seed").asLong(42L),
              shufflePartitions = if (nd.has("shuffle_partitions"))
                Some(nd.path("shuffle_partitions").asInt()) else None,
              compactEveryNTriggers = if (nd.has("compact_every_n_triggers"))
                Some(nd.path("compact_every_n_triggers").asInt()) else None))
          } else None,
          cosineDup = if (h.has("cosine_dup")) {
            val cd = h.path("cosine_dup")
            def req(k: String): String = {
              if (!cd.has(k)) throw new IllegalArgumentException(
                s"cosine_dup requires `$k`")
              cd.path(k).asText()
            }
            Some(CosineDupConf(
              idColumn = req("id_column"),
              vecColumn = req("vec_column"),
              stateDir = req("state_dir"),
              dim = { req("dim"); cd.path("dim").asInt() },
              threshold = cd.path("threshold").asDouble(0.95),
              bands = cd.path("bands").asInt(16),
              rowsPerBand = cd.path("rows_per_band").asInt(12),
              seed = cd.path("seed").asLong(42L),
              shufflePartitions = if (cd.has("shuffle_partitions"))
                Some(cd.path("shuffle_partitions").asInt()) else None,
              compactEveryNTriggers = if (cd.has("compact_every_n_triggers"))
                Some(cd.path("compact_every_n_triggers").asInt()) else None,
              expectedCorpus = if (cd.has("expected_corpus"))
                Some(cd.path("expected_corpus").asLong()) else None,
              onUndersized = cd.path("on_undersized").asText("error")))
          } else None,
          hammingDup = if (h.has("hamming_dup")) {
            val hd = h.path("hamming_dup")
            def req(k: String): String = {
              if (!hd.has(k)) throw new IllegalArgumentException(
                s"hamming_dup requires `$k`")
              hd.path(k).asText()
            }
            val fp = if (hd.has("fingerprint")) {
              val f = hd.path("fingerprint")
              def freq(k: String): String = {
                if (!f.has(k)) throw new IllegalArgumentException(
                  s"hamming_dup.fingerprint requires `$k`")
                f.path(k).asText()
              }
              Some(FingerprintConf(freq("content_column"), freq("kind"),
                dim = if (f.has("dim")) Some(f.path("dim").asInt())
                  else None))
            } else None
            // with in-daemon fingerprinting the hash-word columns are
            // DERIVED (imageAHash64/imagePHash64 emit w0/w1), so the
            // column keys default instead of being required
            Some(HammingDupConf(
              idColumn = req("id_column"),
              w0Column = if (fp.isDefined && !hd.has("w0_column")) "w0"
                else req("w0_column"),
              w1Column = if (fp.isDefined && !hd.has("w1_column")) "w1"
                else req("w1_column"),
              stateDir = req("state_dir"),
              maxHamming = hd.path("max_hamming").asInt(3),
              shufflePartitions = if (hd.has("shuffle_partitions"))
                Some(hd.path("shuffle_partitions").asInt()) else None,
              compactEveryNTriggers = if (hd.has("compact_every_n_triggers"))
                Some(hd.path("compact_every_n_triggers").asInt()) else None,
              fingerprint = fp))
          } else None)
      },
      sink = parseSink(p.path("sink")),
      onError = {
        val e = p.path("on_error")
        ErrorPolicyConf(
          policy = e.path("policy").asText("RAISE").toUpperCase,
          dlq = if (e.has("dlq")) Some(parseSink(e.path("dlq"))) else None)
      },
      stateStore =
        if (p.has("state_store")) Some(p.path("state_store").asText())
        else None)
  }

  private def parseSource(s: JsonNode): SourceConf = {
    val kind = s.path("type").asText("")
    SourceConf(
      kind = kind,
      kafka = if (s.has("kafka")) {
        val k = s.path("kafka")
        Some(KafkaSourceConf(
          brokers = strSeq(k.path("brokers")),
          groupId = k.path("group_id").asText(""),
          autoOffsetReset = k.path("auto_offset_reset").asText("earliest"),
          topics = strSeq(k.path("topics")),
          securityProtocol = optText(k, "security_protocol"),
          ssl = parseSsl(k),
          sasl = parseSasl(k)))
      } else None,
      websocket = if (s.has("websocket"))
        Some(WebsocketSourceConf(s.path("websocket").path("uri").asText())) else None,
      webhook = if (s.has("webhook")) {
        val w = s.path("webhook")
        // two shapes: flat (signing_secret/signature_header) and the
        // github.motherduck.yml form (signature_type: hmac + nested
        // hmac: {header, sig_key, secret})
        val hmac = w.path("hmac")
        Some(WebhookSourceConf(
          port = w.path("port").asInt(8080),
          signingSecret =
            if (w.has("signing_secret")) Some(w.path("signing_secret").asText())
            else if (hmac.has("secret")) Some(hmac.path("secret").asText())
            else None,
          signatureHeader =
            if (w.has("signature_header")) w.path("signature_header").asText()
            else hmac.path("header").asText("X-Hub-Signature-256")))
      } else None,
      file = if (s.has("file")) {
        val f = s.path("file")
        Some(FileSourceConf(f.path("path").asText(), f.path("format").asText("json")))
      } else None,
      queue = if (s.has("queue")) {
        val q = s.path("queue")
        Some(QueueSourceConf(
          brokers = q.path("brokers").asText(),
          topic = q.path("topic").asText(),
          autoOffsetReset = q.path("auto_offset_reset").asText("earliest")))
      } else None)
  }

  def parseSink(s: JsonNode): SinkConf = {
    SinkConf(
      kind = s.path("type").asText("noop"),
      kafka = if (s.has("kafka")) {
        val k = s.path("kafka")
        Some(KafkaSinkConf(strSeq(k.path("brokers")), k.path("topic").asText(),
          securityProtocol = optText(k, "security_protocol"),
          ssl = parseSsl(k), sasl = parseSasl(k)))
      } else None,
      sqlcommand = if (s.has("sqlcommand")) {
        val c = s.path("sqlcommand")
        Some(SqlCommandSinkConf(
          sql = c.path("sql").asText(),
          substitutions = c.path("substitutions").elements().asScala.map { sub =>
            SqlSubstitution(sub.path("var").asText(), sub.path("type").asText())
          }.toSeq))
      } else None,
      iceberg = if (s.has("iceberg")) {
        val i = s.path("iceberg")
        Some(IcebergSinkConf(i.path("catalog_name").asText(), i.path("table_name").asText()))
      } else None,
      clickhouse = if (s.has("clickhouse")) {
        val c = s.path("clickhouse")
        Some(ClickhouseSinkConf(c.path("dsn").asText(), c.path("table").asText()))
      } else None,
      queue = if (s.has("queue")) {
        val q = s.path("queue")
        Some(QueueSinkConf(q.path("brokers").asText(), q.path("topic").asText()))
      } else None)
  }

  private def parseTable(t: JsonNode): TableConf = {
    TableConf(
      name = t.path("name").asText(),
      sql = t.path("sql").asText(),
      manager = if (t.has("manager")) {
        val m = t.path("manager")
        Some(TableManagerConf(
          tumblingWindow = if (m.has("tumbling_window")) {
            val w = m.path("tumbling_window")
            Some(TumblingWindowConf(
              collectClosedWindowsSql = w.path("collect_closed_windows_sql").asText(),
              deleteClosedWindowsSql = w.path("delete_closed_windows_sql").asText(),
              pollIntervalSeconds = w.path("poll_interval_seconds").asInt(10)))
          } else None,
          sink = if (m.has("sink")) Some(parseSink(m.path("sink"))) else None))
      } else None)
  }
}
