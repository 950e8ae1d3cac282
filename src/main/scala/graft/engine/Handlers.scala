package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch handlers (`sqlflow/handlers.py`). A handler turns one
  * micro-batch DataFrame into a result DataFrame by running the
  * user's SQL. */
trait Handler {
  /** Run the user SQL over the micro-batch; returns the result table. */
  def invoke(spark: SparkSession, batch: DataFrame): DataFrame
  /** Reset per-batch state (reference `handler.init()`, pipeline.py:290). */
  def reset(): Unit = ()
}

/** InferredMemBatch (`handlers.py:88-133`): the micro-batch (schema
  * inferred at read) is exposed to SQL as table `batch`. The reference's
  * InferredDiskBatch exists only to bound memory — Spark spills, so one
  * handler covers both (SURVEY §1.3).
  *
  * Handler SQL may be a script of `;`-separated statements (the
  * reference hands the whole blob to DuckDB —
  * kafka.motherduck.idempotent.yml wraps temp-table + two inserts in a
  * transaction). Supported statement forms:
  *
  *  - `BEGIN TRANSACTION` / `COMMIT` / `ROLLBACK` — no-ops (each
  *    micro-batch is already the atomicity unit here)
  *  - `CREATE OR REPLACE TEMPORARY TABLE x AS SELECT …` — materialized
  *    once (localCheckpoint) and registered, matching DuckDB's eager
  *    temp table, so later statements don't recompute it
  *  - `INSERT … ON CONFLICT` → state-table upsert (unqualified) or
  *    attached-catalog-table merge (qualified)
  *  - anything else → Spark SQL (incl. `INSERT INTO db.t SELECT …`)
  *
  * The result is the last SELECT-producing statement's frame. */
final class InferredBatchHandler(sql: String, tables: Map[String, StateTable])
    extends Handler {

  private val tempTablePat =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?TEMP(?:ORARY)?\s+TABLE\s+(\w+)\s+AS\s+(.+)$""".r

  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    batch.createOrReplaceTempView("batch")
    var result: DataFrame = null
    StateTable.splitStatements(sql).foreach { stmt =>
      val up = stmt.trim.toUpperCase
      if (up.startsWith("BEGIN") || up.startsWith("COMMIT") ||
          up.startsWith("ROLLBACK")) ()
      else SqlDialect.parseUpsert(stmt) match {
        case Some(spec) if spec.table.contains('.') =>
          result = Attachments.upsertCatalog(spark, spec)
        case Some(spec) =>
          val table = tables.getOrElse(spec.table, throw new IllegalArgumentException(
            s"upsert target table ${spec.table} is not declared in `tables`"))
          val delta = spark.sql(SqlDialect.translate(spec.selectSql))
          result = table.upsert(delta, spec.sets)
        case None => stmt match {
          case tempTablePat(name, select) =>
            spark.sql(SqlDialect.translate(select)).localCheckpoint(true)
              .createOrReplaceTempView(name)
          case _ =>
            result = spark.sql(SqlDialect.translate(stmt))
        }
      }
    }
    if (result == null) spark.emptyDataFrame else result
  }
}

/** StructuredBatch (`handlers.py:136-188`): the target table is
  * pre-created by DDL; each batch is validated against its schema
  * (unknown columns / uncastable types raise — the reference's
  * ArrowInvalid taxonomy, tests/handlers/test_structured_batch.py:27-55),
  * inserted, and the user SQL runs against the TABLE, not `batch`.
  *
  * A qualified `table: db.t` (kafka.structured.disk.yml) targets an
  * ATTACHed catalog table instead of an in-session state table; rows
  * persist in the attached store across batches, exactly like the
  * reference's on-disk DuckDB file. */
final class StructuredBatchHandler(
    sql: String, tableName: String, tables: Map[String, StateTable])
    extends Handler {

  private val qualified = tableName.contains('.')
  private val table: StateTable =
    if (qualified) null
    else tables.getOrElse(tableName, throw new IllegalArgumentException(
      s"structured handler table $tableName is not declared (commands/tables DDL)"))

  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    val schema = if (qualified) spark.table(tableName).schema else table.schema
    val declared = schema.fieldNames.toSet
    // kafka_* metadata is ENGINE-attached (processBatch), not user
    // payload: drop it unless the table declares it — only true payload
    // columns outside the schema are a validation error
    val extra = batch.schema.fieldNames
      .filterNot(declared.contains)
      .filterNot(_.startsWith("kafka_"))
    if (extra.nonEmpty)
      throw new IllegalArgumentException(
        s"batch columns ${extra.mkString(",")} not in table $tableName schema " +
          s"(${schema.fieldNames.mkString(",")})")
    // missing columns become nulls; present ones must cast (ANSI: bad casts raise)
    val aligned = batch.select(schema.fields.map { f =>
      import org.apache.spark.sql.functions._
      (if (batch.schema.fieldNames.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    if (qualified) aligned.write.insertInto(tableName)
    else table.insert(aligned)
    spark.sql(SqlDialect.translate(sql))
  }

  /** The in-session buffer drains after each flush; an attached table
    * is durable storage and persists (reference disk semantics). */
  override def reset(): Unit = if (!qualified) table.truncate()
}

/** `handlers.NativeWindow` in BATCH mode (dev invoke / golden tests):
  * the same tumbling projection as the streaming path, but batch
  * aggregation emits every window (there is no watermark to wait on).
  * The streaming daemon routes this handler to a real watermarked
  * streaming aggregation instead (StreamingPipeline.start). */
final class NativeWindowBatchHandler(w: NativeWindowConf) extends Handler {
  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // keys may be nested paths (properties.city) — project to their
    // leaf names so the output schema matches the streaming path
    val projected = batch.select(
      col(w.timeColumn).cast("timestamp").as(leaf(w.timeColumn)) +:
        (w.keys.map(k => col(k).as(leaf(k))) ++
          w.sums.map(c => col(c).cast("double").as(leaf(c))) ++
          w.dedupKeys.filterNot(d => d == w.timeColumn ||
              w.keys.contains(d) || w.sums.contains(d))
            .map(d => col(d).as(leaf(d)))): _*)
    // batch analogue of the streaming dedup_keys contract: replayed
    // event identities collapse before aggregation (the whole batch is
    // one "horizon"), so dev-invoke numbers match the daemon's
    val deduped =
      if (w.dedupKeys.isEmpty) projected
      else projected.dropDuplicates(w.dedupKeys.map(leaf).distinct)
    // same kind dispatch as the streaming daemon, so dev-invoke and
    // the daemon agree on every window shape (batch aggregation has no
    // watermark to wait on — every window/session emits)
    w.kind match {
      case "sliding" => graft.streaming.NativeWindow.sliding(
        deduped, leaf(w.timeColumn), w.keys.map(leaf),
        w.duration, slide = w.slide.get, w.watermark,
        aggs = NativeWindowBatchHandler.aggsFor(w))
      case "session" => graft.streaming.NativeWindow.session(
        deduped, leaf(w.timeColumn), w.keys.map(leaf),
        gap = w.duration, w.watermark,
        aggs = NativeWindowBatchHandler.aggsFor(w))
      case _ => graft.streaming.NativeWindow.tumbling(
        deduped, leaf(w.timeColumn), w.keys.map(leaf), w.duration, w.watermark,
        aggs = NativeWindowBatchHandler.aggsFor(w))
    }
  }

  private def leaf(path: String): String = path.split('.').last
}

object NativeWindowBatchHandler {
  /** count(*) plus the ADR's additive SUMs, shared by the batch and
    * streaming paths so both emit the same schema. */
  def aggsFor(w: NativeWindowConf): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    count(lit(1)).as("count") +:
      w.sums.map { c =>
        val l = c.split('.').last
        sum(col(l)).as(s"sum_$l")
      }
  }
}

/** `handlers.NearDupFilter` in BATCH mode (dev invoke): one admission
  * pass of the batch against the CURRENT persisted state under
  * `state_dir` — within-batch canonicalization plus the cross-batch
  * probe, WITHOUT committing (bid = Long.MaxValue sees all committed
  * state; nothing is written). The preview of "what would this crawl
  * admit right now". The streaming daemon routes this handler to the
  * continuous filter-then-commit loop instead
  * (StreamingPipeline.startNearDupFilter). */
final class NearDupBatchHandler(nd: NearDupConf) extends Handler {
  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // try_cast, not cast: the preview's decode contract is IGNORE
    // (drop undecodable rows); an ANSI cast would throw on the first
    // malformed id instead
    val projected = batch.select(
      expr(s"try_cast(`${nd.idColumn}` AS BIGINT)").as(nd.idColumn),
      col(nd.textColumn).cast("string").as(nd.textColumn))
      .filter(col(nd.idColumn).isNotNull && col(nd.textColumn).isNotNull)
    graft.operators.Dedup.nearDupFilterBatch(projected,
      nd.idColumn, nd.textColumn, nd.stateDir, Long.MaxValue,
      nd.ngram, nd.threshold, nd.numHashes, nd.bands, nd.seed)
  }
}

/** `handlers.CosineDupFilter` in BATCH mode (dev invoke): one
  * admission pass of the batch's embeddings against the CURRENT
  * persisted state — [[NearDupBatchHandler]]'s preview contract in
  * cosine space (bid = Long.MaxValue sees all committed state, nothing
  * is written). The streaming daemon routes this handler to the
  * continuous filter-then-commit loop
  * (StreamingPipeline.startCosineDupFilter). */
final class CosineDupBatchHandler(cd: CosineDupConf) extends Handler {
  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val projected = batch.select(
      expr(s"try_cast(`${cd.idColumn}` AS BIGINT)").as(cd.idColumn),
      expr(s"try_cast(`${cd.vecColumn}` AS ARRAY<FLOAT>)").as(cd.vecColumn))
      .filter(col(cd.idColumn).isNotNull && col(cd.vecColumn).isNotNull)
    graft.operators.CosineDedup.cosineDupFilterBatch(projected,
      cd.idColumn, cd.vecColumn, cd.stateDir, Long.MaxValue,
      cd.threshold, cd.dim, cd.bands, cd.rowsPerBand, cd.seed)
  }
}

/** `handlers.HammingDupFilter` in BATCH mode (dev invoke): one
  * admission pass of the batch's fingerprints against the CURRENT
  * persisted state — preview semantics (bid = Long.MaxValue, nothing
  * written), streaming routes to the continuous loop. With a
  * `fingerprint` block the batch carries media bytes (base64) and the
  * words are derived in-handler, same as the daemon. */
final class HammingDupBatchHandler(hd: HammingDupConf) extends Handler {
  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val projected = hd.fingerprint match {
      case Some(_) => HammingFingerprint.words(
        batch.select(
          expr(s"try_cast(`${hd.idColumn}` AS BIGINT)").as(hd.idColumn),
          col(hd.fingerprint.get.contentColumn)), hd)
      case None => batch.select(
        expr(s"try_cast(`${hd.idColumn}` AS BIGINT)").as(hd.idColumn),
        expr(s"try_cast(`${hd.w0Column}` AS BIGINT)").as(hd.w0Column),
        expr(s"try_cast(`${hd.w1Column}` AS BIGINT)").as(hd.w1Column))
        .filter(col(hd.idColumn).isNotNull && col(hd.w0Column).isNotNull &&
          col(hd.w1Column).isNotNull)
    }
    graft.operators.HammingDedup.hammingDupFilterBatch(projected,
      hd.idColumn, hd.w0Column, hd.w1Column, hd.stateDir, Long.MaxValue,
      hd.maxHamming, HammingFingerprint.stamp(hd))
  }
}

/** Shared content → hash-words stage of the fingerprinting Hamming
  * daemon (streaming) and its dev-invoke preview: base64 media bytes →
  * `Multimodal.imageAHash64`/`imagePHash64`, or an embedding array →
  * packed 128-bit SimHash (`kind: simhash`) → (id, w0, w1). Rows whose
  * id is missing or whose content doesn't decode null out and are
  * DROPPED — the handler's IGNORE decode contract. */
private[graft] object HammingFingerprint {
  // the simhash recipe constants, defined ONCE so the derivation and
  // the persisted-state stamp cannot drift: 128 sign bits = 4 bands ×
  // 32 rows under this seed, packed two bands per 64-bit word
  val SimhashSeed = 42L
  val SimhashBands = 4
  val SimhashRowsPerBand = 32

  /** The fingerprint-recipe identity persisted into the Hamming state
    * (column metadata on the band index, next to the chunk count) and
    * required to match at probe time: words derived under a different
    * kind, dim, seed, or band layout share no bits with the admitted
    * ones — without the stamp, changing `dim` on an existing state_dir
    * silently admits every duplicate (round-10 advisor finding). */
  def stamp(hd: HammingDupConf): Option[String] = hd.fingerprint.map { f =>
    f.kind match {
      case "simhash" =>
        s"simhash:dim=${f.dim.getOrElse(0)}:seed=$SimhashSeed:" +
          s"bands=${SimhashBands}x$SimhashRowsPerBand"
      case k => k
    }
  }

  def words(df: org.apache.spark.sql.DataFrame,
      hd: HammingDupConf): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val f = hd.fingerprint.getOrElse(throw new IllegalArgumentException(
      "fingerprint block required"))
    val keyed = df
      .filter(col(hd.idColumn).isNotNull && col(f.contentColumn).isNotNull)
    val hashed = f.kind match {
      case "ahash" | "phash" =>
        val media = keyed.select(
          col(hd.idColumn).cast("long").as("media_id"),
          unbase64(col(f.contentColumn).cast("string")).as("content"))
        if (f.kind == "ahash") graft.operators.Multimodal.imageAHash64(media)
        else graft.operators.Multimodal.imagePHash64(media)
      case "simhash" =>
        // 128-bit SimHash of the embedding: signs of 128 seeded
        // hyperplane projections (4 bands × 32 bits, packed two bands
        // per 64-bit word). Signs are scale-invariant, so a positively
        // scaled copy flips ZERO bits; vectors at cosine t flip
        // ~128·acos(t)/π in expectation. `dim` (and the implicit seed)
        // must stay constant for the lifetime of a state_dir — words
        // derived under different params share no bits.
        val dim = f.dim.getOrElse(throw new IllegalArgumentException(
          "hamming_dup.fingerprint kind 'simhash' requires `dim`"))
        // the daemon's typed JSON decode carries nested values as
        // strings — parse those with from_json (malformed → null →
        // dropped, the IGNORE contract); already-typed arrays cast
        val embRaw = keyed.schema(f.contentColumn).dataType match {
          case org.apache.spark.sql.types.StringType =>
            from_json(col(f.contentColumn),
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.FloatType))
          case _ => col(f.contentColumn).cast("array<float>")
        }
        // a vector whose length != dim is undecodable content, not a
        // shorter signature: HyperplaneBands would silently truncate /
        // zero-pad it (prefix-sharing vectors would collide), so null
        // it out → dropped, per the handler's IGNORE decode contract
        val emb = when(size(embRaw) === dim, embRaw)
        val bands = graft.functions.HashFunctions.hyperplane_bands(
          emb, dim, bands = SimhashBands, rowsPerBand = SimhashRowsPerBand,
          seed = SimhashSeed)
        def pack(hi: org.apache.spark.sql.Column,
            lo: org.apache.spark.sql.Column) =
          shiftleft(hi, 32).bitwiseOR(lo)
        keyed.select(col(hd.idColumn).cast("long").as("media_id"),
            bands.as("__sh"))
          .filter(col("media_id").isNotNull && col("__sh").isNotNull)
          .select(col("media_id"),
            pack(element_at(col("__sh"), 1),
              element_at(col("__sh"), 2)).as("w0"),
            pack(element_at(col("__sh"), 3),
              element_at(col("__sh"), 4)).as("w1"))
      case other => throw new IllegalArgumentException(
        s"unknown fingerprint kind '$other' (ahash|phash|simhash)")
    }
    hashed.select(col("media_id").as(hd.idColumn),
        col("w0").as(hd.w0Column), col("w1").as(hd.w1Column))
      .filter(col(hd.w0Column).isNotNull && col(hd.w1Column).isNotNull)
  }
}

object Handlers {
  def build(conf: HandlerConf, tables: Map[String, StateTable]): Handler =
    conf.kind match {
      case "handlers.InferredMemBatch" | "handlers.InferredDiskBatch" | "" =>
        new InferredBatchHandler(conf.sql, tables)
      case "handlers.StructuredBatch" =>
        new StructuredBatchHandler(conf.sql,
          conf.table.getOrElse(throw new IllegalArgumentException(
            "StructuredBatch handler requires `table`")),
          tables)
      case "handlers.NativeWindow" =>
        new NativeWindowBatchHandler(conf.window.getOrElse(
          throw new IllegalArgumentException(
            "NativeWindow handler requires `window`")))
      case "handlers.NearDupFilter" =>
        new NearDupBatchHandler(conf.nearDup.getOrElse(
          throw new IllegalArgumentException(
            "NearDupFilter handler requires `near_dup`")))
      case "handlers.CosineDupFilter" =>
        new CosineDupBatchHandler(conf.cosineDup.getOrElse(
          throw new IllegalArgumentException(
            "CosineDupFilter handler requires `cosine_dup`")))
      case "handlers.HammingDupFilter" =>
        new HammingDupBatchHandler(conf.hammingDup.getOrElse(
          throw new IllegalArgumentException(
            "HammingDupFilter handler requires `hamming_dup`")))
      case other => throw new IllegalArgumentException(s"unknown handler type: $other")
    }
}
