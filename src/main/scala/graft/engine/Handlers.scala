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
  * If the SQL is an `INSERT ... ON CONFLICT` upsert, the SELECT runs
  * over `batch` and the result merges into the managed state table —
  * the reference's cross-batch accumulation pattern
  * (tumbling.window.yml:48-58). */
final class InferredBatchHandler(sql: String, tables: Map[String, StateTable])
    extends Handler {

  private val upsert = SqlDialect.parseUpsert(sql)

  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    batch.createOrReplaceTempView("batch")
    upsert match {
      case Some(spec) =>
        val table = tables.getOrElse(spec.table, throw new IllegalArgumentException(
          s"upsert target table ${spec.table} is not declared in `tables`"))
        val delta = spark.sql(SqlDialect.translate(spec.selectSql))
        table.upsert(delta, spec.sets)
      case None =>
        spark.sql(SqlDialect.translate(sql))
    }
  }
}

/** StructuredBatch (`handlers.py:136-188`): the target table is
  * pre-created by DDL; each batch is validated against its schema
  * (unknown columns / uncastable types raise — the reference's
  * ArrowInvalid taxonomy, tests/handlers/test_structured_batch.py:27-55),
  * inserted, and the user SQL runs against the TABLE, not `batch`. */
final class StructuredBatchHandler(
    sql: String, tableName: String, tables: Map[String, StateTable])
    extends Handler {

  private val table = tables.getOrElse(tableName,
    throw new IllegalArgumentException(
      s"structured handler table $tableName is not declared (commands/tables DDL)"))

  override def invoke(spark: SparkSession, batch: DataFrame): DataFrame = {
    val declared = table.schema.fieldNames.toSet
    val extra = batch.schema.fieldNames.filterNot(declared.contains)
    if (extra.nonEmpty)
      throw new IllegalArgumentException(
        s"batch columns ${extra.mkString(",")} not in table $tableName schema " +
          s"(${table.schema.fieldNames.mkString(",")})")
    // missing columns become nulls; present ones must cast (ANSI: bad casts raise)
    val aligned = table.schema.fields.foldLeft(batch) { (df, f) =>
      if (batch.schema.fieldNames.contains(f.name)) df
      else df.withColumn(f.name, org.apache.spark.sql.functions.lit(null).cast(f.dataType))
    }
    table.insert(aligned)
    spark.sql(SqlDialect.translate(sql))
  }

  /** The buffer table drains after each flush. */
  override def reset(): Unit = table.truncate()
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
      case other => throw new IllegalArgumentException(s"unknown handler type: $other")
    }
}
