package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A managed (state) table — the Spark analogue of the reference's
  * DuckDB tables created via `tables.sql` DDL and mutated by
  * `INSERT ... ON CONFLICT` upserts (`sqlflow/config.py:114-129`,
  * `managers/window.py`).
  *
  * Two storage modes:
  *
  *  - '''Local (fast path).''' While the table holds ≤ `localLimit`
  *    rows it lives on the driver as a keyed hash map and is exposed to
  *    SQL as a `LocalRelation` view: scans cost no Spark job, joins
  *    against it broadcast naturally, and a micro-batch upsert is a
  *    driver-side map merge of the (already GROUP-BY'd, therefore tiny)
  *    delta. This matches the reference's asymptotics — the ADR's
  *    "state grows with #open windows, not #messages" invariant means
  *    window state is keyed small by construction.
  *
  *  - '''Distributed (scale path).''' Past `localLimit` the table
  *    switches permanently to a DataFrame whose lineage is cut by
  *    periodic `localCheckpoint`; upserts become union + re-aggregate
  *    by the unique key. This is the path for state that outgrows one
  *    node (e.g. a dedup registry keyed by content hash at 100 TB);
  *    on a real cluster the same contract maps to Delta/Iceberg MERGE.
  */
final class StateTable(
    spark: SparkSession,
    val name: String,
    val schema: StructType,
    val uniqueKeys: Seq[String],
    localLimit: Int = 500000) {

  private val keyIdx: Array[Int] = uniqueKeys.map(schema.fieldIndex).toArray
  private val fieldIdx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  // Local mode: keyed map when a unique index exists, insertion-ordered.
  // (Tables without a unique index just append.)
  private val local = mutable.LinkedHashMap[Seq[Any], Row]()
  private val localUnkeyed = mutable.ArrayBuffer[Row]()

  // Distributed mode: non-null once spilled; one-way switch.
  @volatile private var dist: DataFrame = _

  registerView()

  def df: DataFrame =
    if (dist != null) dist
    else {
      val l = new java.util.ArrayList[Row](localSize)
      localRowsIter.foreach(l.add)
      spark.createDataFrame(l, schema)
    }

  def registerView(): Unit = df.createOrReplaceTempView(name)

  private def localRowsIter: Iterator[Row] =
    if (uniqueKeys.nonEmpty) local.valuesIterator else localUnkeyed.iterator

  private def localSize: Int =
    if (uniqueKeys.nonEmpty) local.size else localUnkeyed.size

  private def conform(rows: DataFrame): DataFrame = {
    val cols = schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    rows.select(cols.toIndexedSeq: _*)
  }

  /** Plain INSERT (StructuredBatch buffer semantics). */
  def insert(rows: DataFrame): Unit = {
    val incoming = conform(rows)
    if (dist != null) { mutateDist(dist.unionByName(incoming)); return }
    incoming.collect().foreach { r =>
      if (uniqueKeys.nonEmpty) local.put(keyOf(r), r)
      else localUnkeyed += r
    }
    afterLocalMutation()
  }

  /** `INSERT ... ON CONFLICT (keys) DO UPDATE SET ...` semantics:
    * additive columns accumulate, replace columns take the incoming
    * value, untouched non-key columns keep the existing value.
    *
    * Returns the delta, already materialized in local mode (a
    * LocalRelation over the rows collected for the merge — callers that
    * also sink the handler result don't recompute the aggregation). */
  def upsert(rows: DataFrame, sets: Seq[SqlDialect.SetClause]): DataFrame = {
    require(uniqueKeys.nonEmpty,
      s"table $name has no unique index; ON CONFLICT requires one")
    val assigns = sets.collect { case a: SqlDialect.Assign => a.col }
    require(assigns.isEmpty,
      s"state table $name supports additive/replace SET clauses only; " +
        s"arbitrary assignments (${assigns.mkString(", ")} = <expr>) need an " +
        "attached catalog table (Attachments.upsertCatalog)")
    val incoming = conform(rows)
    if (dist != null) {
      // materialize the delta ONCE and upsert from the materialized
      // plan, so the returned frame is the same stable rows that were
      // merged (the local path's contract) — not a re-computable plan
      // that could diverge if a caller sinks it after the merge
      val snap = incoming.localCheckpoint(true)
      upsertDist(snap, sets)
      return snap
    }
    val additive = sets.collect { case SqlDialect.Additive(c) => fieldIdx(c) }.toSet
    val replace = sets.collect { case SqlDialect.Replace(c) => fieldIdx(c) }.toSet
    val collected = incoming.collect()
    collected.foreach { r =>
      val k = keyOf(r)
      local.get(k) match {
        case None => local.put(k, r)
        case Some(old) =>
          val merged = new Array[Any](schema.length)
          var i = 0
          while (i < schema.length) {
            merged(i) =
              if (additive.contains(i)) addValues(old.get(i), r.get(i), schema(i).dataType)
              else if (replace.contains(i)) r.get(i)
              else old.get(i)
            i += 1
          }
          keyIdx.foreach(j => merged(j) = r.get(j))
          local.put(k, Row.fromSeq(merged.toIndexedSeq))
      }
    }
    afterLocalMutation()
    val l = new java.util.ArrayList[Row](collected.length)
    collected.foreach(l.add)
    spark.createDataFrame(l, StructType(schema.fields))
  }

  /** DELETE FROM name WHERE cond — keeps rows NOT matching cond.
    * Local mode evaluates the predicate through a LocalTableScan
    * (driver-only, no shuffle); runs per manager poll, not per batch. */
  def deleteWhere(condSparkSql: String): Unit = {
    if (dist != null) { mutateDist(dist.filter(not(expr(condSparkSql)))); return }
    val kept = df.filter(not(expr(condSparkSql))).collect()
    if (uniqueKeys.nonEmpty) {
      local.clear()
      kept.foreach(r => local.put(keyOf(r), r))
    } else {
      localUnkeyed.clear()
      localUnkeyed ++= kept
    }
    afterLocalMutation()
  }

  def truncate(): Unit = {
    if (dist != null) {
      mutateDist(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
    } else {
      local.clear(); localUnkeyed.clear()
      afterLocalMutation()
    }
  }

  private def keyOf(r: Row): Seq[Any] = keyIdx.toIndexedSeq.map(r.get)

  private def addValues(a: Any, b: Any, dt: DataType): Any =
    if (a == null) b
    else if (b == null) a
    else dt match {
      case IntegerType => a.asInstanceOf[Int] + b.asInstanceOf[Int]
      case LongType => a.asInstanceOf[Long] + b.asInstanceOf[Long]
      case DoubleType => a.asInstanceOf[Double] + b.asInstanceOf[Double]
      case FloatType => a.asInstanceOf[Float] + b.asInstanceOf[Float]
      case ShortType => (a.asInstanceOf[Short] + b.asInstanceOf[Short]).toShort
      case _: DecimalType =>
        a.asInstanceOf[java.math.BigDecimal].add(b.asInstanceOf[java.math.BigDecimal])
      case other =>
        throw new IllegalArgumentException(s"cannot accumulate type $other")
    }

  private def afterLocalMutation(): Unit = {
    if (localSize > localLimit) spillToDistributed()
    registerView()
  }

  /** One-way switch local → distributed once state outgrows the driver. */
  private def spillToDistributed(): Unit = {
    dist = df.repartition(spark.sessionState.conf.numShufflePartitions)
      .localCheckpoint(true)
    local.clear(); localUnkeyed.clear()
  }

  // ---- distributed-mode mutation (scale path) ----------------------

  private def upsertDist(incoming: DataFrame, sets: Seq[SqlDialect.SetClause]): Unit = {
    val additive = sets.collect { case SqlDialect.Additive(c) => c }.toSet
    val replace = sets.collect { case SqlDialect.Replace(c) => c }.toSet
    // tag so "replace" semantics can prefer the newest value
    val old = dist.withColumn("__gen", lit(0))
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
    mutateDist(merged)
  }

  // Checkpoint every few mutations instead of each one: a full
  // localCheckpoint per micro-batch dominates upsert cost at high
  // batch rates; a short lazy lineage (≤4 unions/groupBys over the
  // state) re-computes cheaply in between and is collapsed at the
  // next checkpoint.
  private var mutationsSinceCheckpoint = 0

  private def mutateDist(next: DataFrame): Unit = {
    mutationsSinceCheckpoint += 1
    if (mutationsSinceCheckpoint >= 4) {
      dist = next.localCheckpoint(true)
      mutationsSinceCheckpoint = 0
    } else {
      dist = next
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
