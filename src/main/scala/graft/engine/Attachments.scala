package graft.engine

import java.sql.DriverManager

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `ATTACH` — external databases as Spark catalog namespaces.
  *
  * The reference attaches external DuckDB-reachable databases into its
  * SQL namespace (`dev/config/examples/kafka.postgres.join.yml:1-9`,
  * `kafka.structured.disk.yml:1-4`, `kafka.motherduck.yml:1-4`,
  * `kafka.ducklake.yml:1-10`, `attach-geoip.yml:8-11`) and handler SQL
  * then references `alias.table`. The Spark-native equivalent is a
  * DATABASE in the session catalog whose tables are external-source
  * tables, so Catalyst plans joins/inserts against them like any other
  * relation (JDBC scans get filter pushdown via the JDBC source;
  * parquet-backed attaches get the full parquet pushdown/pruning path).
  *
  * Attach kinds, dispatched on the URI:
  *
  *  - `postgresql://u:p@host:port/db` / `mysql://…` / raw `jdbc:…` →
  *    a JDBC attach: every table visible through JDBC metadata is
  *    registered as `alias.t USING jdbc`. On a real cluster the
  *    vendor driver jar must be on the executor classpath (tested here
  *    against the in-process Derby driver that ships with Spark).
  *  - a filesystem path (the reference's `.db`/`.duckdb` file) → a
  *    directory-backed database: every `<dir>/<t>` or `<dir>/<t>.parquet`
  *    becomes an external parquet table `alias.t`; new tables created
  *    via `CREATE TABLE alias.t (…)` land under the same directory.
  *  - `md:name` / `ducklake:…` / `http(s)://…` → a managed warehouse
  *    database (the cloud service itself is unreachable in this
  *    environment; the namespace + DDL + INSERT surface is what the
  *    engine provides, and it maps to a real catalog on a cluster).
  */
object Attachments {

  final case class AttachSpec(
      uri: String, alias: String, dbType: Option[String], readOnly: Boolean,
      /** Engine extension for 100-TB external tables: `PARTITION_COLUMN
        * c, NUM_PARTITIONS n` in the ATTACH option list turns every
        * registered JDBC table that carries column `c` into a
        * range-partitioned parallel scan (bounds probed once at attach
        * time) instead of Spark's default single-connection read. */
      partitionColumn: Option[String] = None,
      numPartitions: Option[Int] = None)

  private val attachPat =
    """(?is)^\s*ATTACH\s+(?:DATABASE\s+)?(?:IF\s+NOT\s+EXISTS\s+)?'([^']+)'(?:\s+AS\s+(\w+))?\s*(?:\(([^)]*)\))?\s*$""".r

  def parseAttach(stmt: String): Option[AttachSpec] = stmt match {
    case attachPat(uri, alias, opts) =>
      val o = Option(opts).getOrElse("").toUpperCase
      val ty = """TYPE\s+(\w+)""".r.findFirstMatchIn(o).map(_.group(1))
      Some(AttachSpec(
        uri = uri,
        alias = Option(alias).getOrElse(defaultAlias(uri)),
        dbType = ty,
        readOnly = o.contains("READ_ONLY"),
        partitionColumn = """PARTITION_COLUMN\s+(\w+)""".r
          .findFirstMatchIn(o).map(_.group(1).toLowerCase),
        numPartitions = """NUM_PARTITIONS\s+(\d+)""".r
          .findFirstMatchIn(o).map(_.group(1).toInt)))
    case _ => None
  }

  /** DuckDB derives the alias from the URI stem when AS is omitted
    * (`ATTACH 'md:my_db'` → `my_db`, `/tmp/test.db` → `test`). */
  private[engine] def defaultAlias(uri: String): String = {
    val afterScheme = uri.substring(uri.lastIndexOf(':') + 1)
    val base = afterScheme.substring(afterScheme.lastIndexOf('/') + 1)
    val stem = base.split('.').headOption.filter(_.nonEmpty).getOrElse(base)
    stem.replaceAll("\\W", "_")
  }

  def attach(spark: SparkSession, spec: AttachSpec): Unit = {
    val uri = spec.uri
    if (spec.dbType.exists(t => t == "POSTGRES" || t == "MYSQL") ||
        uri.startsWith("jdbc:") || uri.matches("^(postgres(ql)?|mysql)://.*"))
      attachJdbc(spark, spec)
    else if (uri.startsWith("md:") || uri.startsWith("ducklake:") ||
        uri.startsWith("http://") || uri.startsWith("https://")) {
      if (uri.startsWith("http"))
        System.err.println(s"[attach] no egress to $uri; registering " +
          s"'${spec.alias}' as an empty managed database")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${spec.alias}")
    } else attachDirectory(spark, spec)
  }

  // ---- JDBC ---------------------------------------------------------

  /** postgres/mysql URI → JDBC url + credentials. `jdbc:` passes through. */
  private[engine] def toJdbcUrl(uri: String): (String, Option[(String, String)]) = {
    if (uri.startsWith("jdbc:")) return (uri, None)
    val pat = """^(postgres(?:ql)?|mysql)://(?:([^:@/]+)(?::([^@/]*))?@)?([^/:]+)(?::(\d+))?/(.*)$""".r
    uri match {
      case pat(scheme, user, pass, host, port, db) =>
        val vendor = if (scheme.startsWith("postgres")) "postgresql" else "mysql"
        val defPort = if (vendor == "postgresql") "5432" else "3306"
        val url = s"jdbc:$vendor://$host:${Option(port).getOrElse(defPort)}/$db"
        (url, Option(user).map(u => (u, Option(pass).getOrElse(""))))
      case _ => (s"jdbc:$uri", None)
    }
  }

  private def attachJdbc(spark: SparkSession, spec: AttachSpec): Unit = {
    val (url, creds) = toJdbcUrl(spec.uri)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${spec.alias}")
    // enumerate the remote tables once at attach time (the reference
    // connects at ATTACH too); each becomes a pushdown-capable JDBC table
    val conn = creds match {
      case Some((u, p)) => DriverManager.getConnection(url, u, p)
      case None => DriverManager.getConnection(url)
    }
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val found = mutable.ArrayBuffer[(String, String)]() // (schema, table)
      while (rs.next()) {
        val sch = Option(rs.getString("TABLE_SCHEM")).getOrElse("")
        // skip vendor system schemas (Derby SYS*, pg_catalog, information_schema)
        if (!sch.toUpperCase.startsWith("SYS") &&
            !Set("PG_CATALOG", "INFORMATION_SCHEMA").contains(sch.toUpperCase))
          found += ((sch, rs.getString("TABLE_NAME")))
      }
      rs.close()
      found.foreach { case (sch, t) =>
        val dbtable = if (sch.nonEmpty) s"$sch.$t" else t
        val credOpts = creds.map { case (u, p) =>
          s", user '${u.replace("'", "''")}', password '${p.replace("'", "''")}'"
        }.getOrElse("")
        // range-partitioned parallel scan when the partition column
        // exists on this table: probe [min, max] once at attach time
        val partOpts = spec.partitionColumn.flatMap { pc =>
          if (!tableHasColumn(conn, sch, t, pc)) None
          else {
            val st = conn.createStatement()
            try {
              val r = st.executeQuery(s"SELECT MIN($pc), MAX($pc) FROM $dbtable")
              if (r.next() && r.getObject(1) != null) {
                val (lo, hi) = (r.getLong(1), r.getLong(2))
                val n = spec.numPartitions.getOrElse(
                  spark.sessionState.conf.numShufflePartitions)
                Some(s", partitionColumn '$pc', lowerBound '$lo', " +
                  s"upperBound '$hi', numPartitions '$n'")
              } else None
            } finally st.close()
          }
        }.getOrElse("")
        spark.sql(
          s"""CREATE TABLE IF NOT EXISTS ${spec.alias}.`${t.toLowerCase}`
             |USING jdbc
             |OPTIONS (url '${url.replace("'", "''")}', dbtable '$dbtable'$credOpts$partOpts)
             |""".stripMargin)
      }
    } finally conn.close()
  }

  private def tableHasColumn(conn: java.sql.Connection, schema: String,
      table: String, col: String): Boolean = {
    val rs = conn.getMetaData.getColumns(null,
      if (schema.isEmpty) null else schema, table, "%")
    try {
      var found = false
      while (rs.next() && !found)
        found = rs.getString("COLUMN_NAME").equalsIgnoreCase(col)
      found
    } finally rs.close()
  }

  // ---- directory-backed (the engine's native "database file") -------

  private def attachDirectory(spark: SparkSession, spec: AttachSpec): Unit = {
    val dir = new java.io.File(stripFileScheme(spec.uri))
    if (!dir.exists()) dir.mkdirs()
    require(dir.isDirectory,
      s"ATTACH path ${spec.uri} is a file; this engine attaches a DIRECTORY " +
        "of parquet tables (one subdirectory or .parquet file per table)")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${spec.alias} " +
      s"LOCATION '${dir.getAbsolutePath.replace("'", "''")}'")
    val children = Option(dir.listFiles()).getOrElse(Array.empty)
    children.filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach { f =>
        val table = f.getName.stripSuffix(".parquet").replaceAll("\\W", "_")
        if (spark.catalog.tableExists(s"${spec.alias}.$table")) ()
        else spark.catalog.createTable(
          s"${spec.alias}.$table", f.getAbsolutePath, "parquet")
      }
  }

  private def stripFileScheme(uri: String): String =
    if (uri.startsWith("file://")) uri.substring("file://".length) else uri

  /** `CREATE TABLE [IF NOT EXISTS] alias.t (cols…)` against an attached
    * database: a real catalog table (parquet). DuckDB-isms translate
    * rather than drop where Spark has the concept: `DEFAULT expr`
    * column clauses carry over into Spark column DEFAULTs (so partial
    * inserts fill them like the reference does); `PRIMARY KEY (…)`
    * table constraints and double-quoted column names are stripped. */
  def createQualifiedTable(spark: SparkSession, stmt: String): Boolean = {
    val pat =
      """(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\.(\w+)\s*\((.*)\)\s*;?\s*$""".r
    stmt match {
      case pat(ifNot, db, table, colsRaw) =>
        if (!spark.catalog.databaseExists(db))
          throw new IllegalArgumentException(
            s"CREATE TABLE $db.$table: database $db is not attached")
        val defaults = columnDefaults(colsRaw)
        val cols = stripConstraints(colsRaw)
        val schema = StateTable.parseColumns(cols)
        val ddlCols = schema.fields.map { f =>
          val d = defaults.get(f.name.toLowerCase)
            .map(e => s" DEFAULT ${SqlDialect.translate(e)}").getOrElse("")
          s"`${f.name}` ${f.dataType.sql}$d"
        }.mkString(", ")
        val ifClause = if (ifNot != null) "IF NOT EXISTS " else ""
        spark.sql(s"CREATE TABLE $ifClause$db.`$table` ($ddlCols) USING parquet")
        true
      case _ => false
    }
  }

  /** Per-column `DEFAULT <expr>` clauses from a DuckDB column list
    * (lowercased column name → raw default expression). */
  private[engine] def columnDefaults(cols: String): Map[String, String] = {
    val pat = """(?is)^\s*"?(\w+)"?\s+.*?\s+DEFAULT\s+(.+?)\s*$""".r
    splitTopLevel(cols)
      .filterNot(_.trim.toUpperCase.startsWith("PRIMARY KEY"))
      .filterNot(_.trim.toUpperCase.startsWith("UNIQUE"))
      .collect { case pat(name, expr) => name.toLowerCase -> expr.trim }
      .toMap
  }

  /** `INSERT INTO db.t [(cols)] SELECT … ON CONFLICT (keys) DO UPDATE
    * SET …` against an attached catalog table: a key-matched merge —
    * old rows without an incoming key pass through, matched rows apply
    * the SET clauses (additive / replace / arbitrary assignment), new
    * keys append — then the table is atomically overwritten.
    *
    * Scale note: this is the small-state path (offset registries,
    * window accumulators — bounded by #keys, not #messages). On a real
    * cluster the same spec maps 1:1 onto Delta/Iceberg `MERGE INTO`,
    * which this mirrors operation-for-operation. The full-outer join
    * shuffles on the conflict keys only. */
  def upsertCatalog(spark: SparkSession, spec: SqlDialect.UpsertSpec): DataFrame = {
    val target = spark.table(spec.table)
    val tSchema = target.schema
    var delta = spark.sql(SqlDialect.translate(spec.selectSql))
    if (spec.insertColumns.nonEmpty) {
      require(delta.columns.length == spec.insertColumns.length,
        s"INSERT column list (${spec.insertColumns.mkString(",")}) does not " +
          s"match SELECT arity ${delta.columns.length}")
      delta = delta.toDF(spec.insertColumns: _*)
    }
    val aligned = delta.select(tSchema.fields.map { f =>
      (if (delta.columns.contains(f.name)) col(f.name)
       // missing column → the table's declared DEFAULT (Spark keeps it
       // in the field metadata), like the reference's insert; NULL only
       // when no default exists
       else if (f.metadata.contains("CURRENT_DEFAULT"))
         expr(f.metadata.getString("CURRENT_DEFAULT"))
       else lit(null))
        .cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*).localCheckpoint(true)

    val keys = spec.conflictKeys
    require(keys.nonEmpty, s"ON CONFLICT on ${spec.table} requires key columns")
    // DuckDB raises "cannot update the same row twice" when the delta
    // carries a conflict key more than once; silently fanning the
    // full-outer join out would corrupt the one-row-per-key contract
    val dup = aligned.groupBy(keys.map(col).toIndexedSeq: _*)
      .count().filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"ON CONFLICT delta for ${spec.table} contains duplicate key " +
          s"${dup.head.toSeq.init.mkString("(", ", ", ")")}; aggregate the " +
          "SELECT by the conflict keys first")
    val additive = spec.sets.collect { case SqlDialect.Additive(c) => c }.toSet
    val replace = spec.sets.collect { case SqlDialect.Replace(c) => c }.toSet
    val assigns = spec.sets.collect { case SqlDialect.Assign(c, e) => c -> e }.toMap

    val o = target.withColumn("__in_old", lit(1)).as("o")
    val n = aligned.withColumn("__in_new", lit(1)).as("n")
    // using-columns join coalesces the keys into single output columns
    val joined = o.join(n, keys, "full_outer")
    val outCols: Seq[Column] = tSchema.fields.toIndexedSeq.map { f =>
      if (keys.contains(f.name)) col(f.name)
      else {
        val oc = col(s"o.${f.name}"); val nc = col(s"n.${f.name}")
        val merged: Column =
          if (additive.contains(f.name)) // null is additive identity
            when(oc.isNull, nc).when(nc.isNull, oc).otherwise(oc + nc)
          else if (replace.contains(f.name)) nc
          else if (assigns.contains(f.name))
            expr(SqlDialect.translate(assigns(f.name))).cast(f.dataType)
          else oc
        when(col("o.__in_old").isNull, nc)   // brand-new key → insert as-is
          .when(col("n.__in_new").isNull, oc) // untouched existing row
          .otherwise(merged)                  // conflict → DO UPDATE SET
          .as(f.name)
      }
    }
    val merged = joined.select(outCols: _*).localCheckpoint(true)
    merged.write.mode("overwrite").insertInto(spec.table)
    aligned
  }

  /** Drop `PRIMARY KEY(…)` entries, `DEFAULT <expr>` clauses, and
    * double-quotes around column names from a DuckDB column list. */
  private[engine] def stripConstraints(cols: String): String = {
    val parts = splitTopLevel(cols)
      .filterNot(_.trim.toUpperCase.startsWith("PRIMARY KEY"))
      .filterNot(_.trim.toUpperCase.startsWith("UNIQUE"))
      .map(_.replaceAll("(?i)\\s+DEFAULT\\s+\\w+\\s*\\(\\s*\\)", "")
        .replaceAll("(?i)\\s+DEFAULT\\s+'[^']*'", "")
        .replaceAll("(?i)\\s+DEFAULT\\s+[\\w\\.]+", "")
        .replace("\"", "").trim)
    parts.mkString(", ")
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var depth = 0; var q = false; var start = 0
    for (i <- 0 until s.length) {
      val c = s.charAt(i)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}
