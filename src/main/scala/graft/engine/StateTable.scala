package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A managed (state) table — the Spark analogue of the reference's
  * DuckDB tables created via `tables.sql` DDL and mutated by
  * `INSERT ... ON CONFLICT` upserts (`sqlflow/config.py:114-129`,
  * `managers/window.py`). State lives as a DataFrame checkpointed per
  * mutation (localCheckpoint cuts lineage so thousands of micro-batch
  * upserts don't grow the plan). On a cluster the same contract maps to
  * a Delta/Iceberg table with MERGE; the in-memory form keeps the
  * engine dependency-free and the state keyed small (one row per open
  * (bucket, key) window — the ADR's "state grows with #open windows,
  * not #messages" invariant holds: upsert re-aggregates by key). */
final class StateTable(
    spark: SparkSession,
    val name: String,
    val schema: StructType,
    val uniqueKeys: Seq[String]) {

  @volatile private var state: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  registerView()

  def df: DataFrame = state

  def registerView(): Unit = state.createOrReplaceTempView(name)

  private def conform(rows: DataFrame): DataFrame = {
    val cols = schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    rows.select(cols.toIndexedSeq: _*)
  }

  /** Plain INSERT (StructuredBatch buffer semantics). */
  def insert(rows: DataFrame): Unit = mutate(state.unionByName(conform(rows)))

  /** `INSERT ... ON CONFLICT (keys) DO UPDATE SET ...` semantics:
    * additive columns accumulate, replace columns take the incoming
    * value, untouched non-key columns keep the existing value. */
  def upsert(rows: DataFrame, sets: Seq[SqlDialect.SetClause]): Unit = {
    require(uniqueKeys.nonEmpty,
      s"table $name has no unique index; ON CONFLICT requires one")
    val incoming = conform(rows)
    val additive = sets.collect { case SqlDialect.Additive(c) => c }.toSet
    val replace = sets.collect { case SqlDialect.Replace(c) => c }.toSet
    // tag so "replace" semantics can prefer the newest value
    val old = state.withColumn("__gen", lit(0))
    val neu = incoming.withColumn("__gen", lit(1))
    val aggs = schema.fields.filterNot(f => uniqueKeys.contains(f.name)).map { f =>
      if (additive.contains(f.name))
        sum(col(f.name)).cast(f.dataType).as(f.name)
      else if (replace.contains(f.name))
        max_by(col(f.name), col("__gen")).as(f.name)
      else
        max_by(col(f.name), negate(col("__gen"))).as(f.name) // keep existing
    }
    val merged = old.unionByName(neu)
      .groupBy(uniqueKeys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .select(schema.fields.map(f => col(f.name)).toIndexedSeq: _*)
    mutate(merged)
  }

  /** DELETE FROM name WHERE cond — keeps rows NOT matching cond. */
  def deleteWhere(condSparkSql: String): Unit =
    mutate(state.filter(not(expr(condSparkSql))))

  def truncate(): Unit =
    mutate(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))

  // Checkpoint every few mutations instead of each one: a full
  // localCheckpoint per micro-batch dominates upsert cost at high
  // batch rates; a short lazy lineage (≤4 unions/groupBys over the
  // small state) re-computes cheaply in between and is collapsed at
  // the next checkpoint.
  private var mutationsSinceCheckpoint = 0

  private def mutate(next: DataFrame): Unit = {
    mutationsSinceCheckpoint += 1
    if (mutationsSinceCheckpoint >= 4) {
      state = next.localCheckpoint(true)
      mutationsSinceCheckpoint = 0
    } else {
      state = next
    }
    registerView()
  }
}

object StateTable {
  /** Parse the reference's DuckDB DDL blobs: one or more statements —
    * `CREATE TABLE t (col TYPE, ...);` and optional
    * `CREATE UNIQUE INDEX i ON t (k1, k2);` (tumbling.window.yml:5-10).
    * Supports nested STRUCT(...) columns (kafka.structured.mem.yml). */
  def fromDdl(spark: SparkSession, ddl: String): StateTable = {
    val stmts = splitStatements(ddl)
    val createPat = """(?is)CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*""".r
    val indexPat = """(?is)CREATE\s+UNIQUE\s+INDEX\s+\w+\s+ON\s+(\w+)\s*\(([^)]*)\)\s*""".r
    var name: String = null
    var schema: StructType = null
    var keys: Seq[String] = Seq()
    stmts.foreach {
      case createPat(n, cols) => name = n; schema = parseColumns(cols)
      case indexPat(_, ks) => keys = ks.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      case other if other.trim.isEmpty =>
      case other => throw new IllegalArgumentException(s"unsupported table DDL: $other")
    }
    require(name != null, s"no CREATE TABLE found in: $ddl")
    new StateTable(spark, name, schema, keys)
  }

  private[engine] def splitStatements(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var q = false; var start = 0
    for (i <- 0 until sql.length) {
      val c = sql.charAt(i)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ';' if depth == 0 => out += sql.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += sql.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var start = 0
    for (i <- 0 until s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private[engine] def parseColumns(colDefs: String): StructType =
    StructType(splitTopLevel(colDefs).map { d =>
      val sp = d.indexOf(' ')
      require(sp > 0, s"malformed column def: $d")
      val colName = d.substring(0, sp).trim
      StructField(colName, parseType(d.substring(sp + 1).trim), nullable = true)
    })

  private[engine] def parseType(t: String): DataType = {
    val up = t.trim.toUpperCase
    if (up.startsWith("STRUCT(")) {
      val inner = t.trim.substring("STRUCT(".length, t.trim.length - 1)
      parseColumns(inner)
    } else up.replaceAll("\\s+NOT\\s+NULL", "") match {
      case "VARCHAR" | "TEXT" | "STRING" => StringType
      case "INT" | "INTEGER" | "INT4" | "SERIAL" => IntegerType
      case "BIGINT" | "INT8" => LongType
      case "TIMESTAMPTZ" | "TIMESTAMP" => TimestampType
      case "DOUBLE" | "FLOAT8" | "REAL" | "FLOAT" => DoubleType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "DATE" => DateType
      case other => throw new IllegalArgumentException(s"unsupported DDL type: $other")
    }
  }
}
