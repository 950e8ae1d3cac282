package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class SqlDialectSpec extends AnyFunSuite {
  import SqlDialect._

  test("struct literal → named_struct, including nesting") {
    assert(translate("SELECT {'a': x, 'b': 1} FROM t") ==
      "SELECT named_struct('a', x, 'b', 1) FROM t")
    assert(translate("SELECT {'o': {'i': y}} FROM t") ==
      "SELECT named_struct('o', named_struct('i', y)) FROM t")
  }

  test("list literals rewrite to array(); indexing brackets untouched") {
    assert(translate("SELECT [1, 2, 3] AS xs FROM t") ==
      "SELECT array(1, 2, 3) AS xs FROM t")
    assert(translate("SELECT xs[1] FROM t") == "SELECT xs[1] FROM t")
    assert(translate("SELECT [a, [b, c]] FROM t") ==
      "SELECT array(a, array(b, c)) FROM t")
    // string content is opaque
    assert(translate("SELECT '[not a list]' FROM t") ==
      "SELECT '[not a list]' FROM t")
  }

  test("list comprehensions rewrite to transform/filter") {
    assert(translate("SELECT [x * 2 FOR x IN xs] FROM t") ==
      "SELECT transform(xs, x -> x * 2) FROM t")
    assert(translate("SELECT [x FOR x IN xs IF x > 0] FROM t") ==
      "SELECT transform(filter(xs, x -> x > 0), x -> x) FROM t")
    // nested: literal inside a comprehension body
    assert(translate("SELECT [[x, 1] FOR x IN xs] FROM t") ==
      "SELECT transform(xs, x -> array(x, 1)) FROM t")
    // keywords inside strings or identifiers do not trigger
    assert(translate("SELECT ['FOR x IN y'] FROM t") ==
      "SELECT array('FOR x IN y') FROM t")
    assert(translate("SELECT [fmt(x) FOR x IN informed] FROM t") ==
      "SELECT transform(informed, x -> fmt(x)) FROM t")
  }

  test("in-paren IGNORE/RESPECT NULLS transposes to Spark's postfix form") {
    assert(translate("SELECT last_value(x IGNORE NULLS) OVER w FROM t") ==
      "SELECT last_value(x) IGNORE NULLS OVER w FROM t")
    assert(translate("SELECT lag(x, 1 ignore nulls) OVER w FROM t") ==
      "SELECT lag(x, 1) ignore NULLS OVER w FROM t")
    assert(translate(
      "SELECT first_value(CASE WHEN f(a) > 0 THEN b END RESPECT NULLS) OVER w FROM t") ==
      "SELECT first_value(CASE WHEN f(a) > 0 THEN b END) RESPECT NULLS OVER w FROM t")
    // idempotent: the postfix form has no "NULLS)" tail to rewrite
    val once = translate("SELECT last_value(x IGNORE NULLS) OVER w FROM t")
    assert(translate(once) == once)
  }

  test("braces inside quoted strings are not struct literals") {
    assert(translate("""SELECT '{"k":1}' AS j FROM t""") ==
      """SELECT '{"k":1}' AS j FROM t""")
    // a real struct literal after a quoted JSON string still rewrites
    assert(translate("""SELECT '{"k":1}' AS j, {'a': 1} AS s FROM t""") ==
      """SELECT '{"k":1}' AS j, named_struct('a', 1) AS s FROM t""")
  }

  test("->> chains → duck_extract (type-dispatched string/struct extraction)") {
    assert(translate("SELECT payload ->> 'k' FROM t") ==
      "SELECT duck_extract(payload, 'k') FROM t")
    assert(translate("SELECT issue ->> 'user' ->> 'login' FROM t") ==
      "SELECT duck_extract(duck_extract(issue, 'user'), 'login') FROM t")
  }

  test(":: casts with type mapping") {
    assert(translate("SELECT ts::timestamptz FROM t") ==
      "SELECT CAST(ts AS TIMESTAMP) FROM t")
    assert(translate("SELECT now()::timestamptz FROM t") ==
      "SELECT CAST(current_timestamp() AS TIMESTAMP) FROM t")
    assert(translate("SELECT x::STRING, y::inet FROM t") ==
      "SELECT CAST(x AS STRING), CAST(y AS STRING) FROM t")
  }

  test("strftime → date_format with format mapping (literal T quoted)") {
    assert(translate("SELECT strftime(date_trunc('hour', b), '%Y-%m-%dT%H:%M:%S') FROM t") ==
      "SELECT date_format(date_trunc('hour', b), 'yyyy-MM-dd''T''HH:mm:ss') FROM t")
  }

  test("time_bucket → epoch floor bucketing") {
    assert(translate("SELECT time_bucket(INTERVAL '1 minute', ts) FROM t") ==
      "SELECT timestamp_seconds((unix_timestamp(ts) div 60) * 60) FROM t")
    // nested call argument (bluesky.kafka.windowed.yml:49): the value
    // expression is extracted paren-balanced, not to the first ')'
    assert(translate(
      "SELECT time_bucket(INTERVAL '1 minute', to_timestamp(time_us / 1000000)) FROM t") ==
      "SELECT timestamp_seconds((unix_timestamp(timestamp_seconds(time_us / 1000000)) div 60) * 60) FROM t")
    // two calls in one statement both rewrite
    assert(translate(
      "SELECT time_bucket(INTERVAL '1' hour, a), time_bucket(INTERVAL '5 minute', b) FROM t") ==
      "SELECT timestamp_seconds((unix_timestamp(a) div 3600) * 3600), " +
        "timestamp_seconds((unix_timestamp(b) div 300) * 300) FROM t")
  }

  test("now() / to_timestamp / AT TIME ZONE rewrites") {
    assert(translate("SELECT now() - INTERVAL '60' SECOND") ==
      "SELECT current_timestamp() - INTERVAL '60' SECOND")
    assert(translate("SELECT to_timestamp(time_us / 1000000)") ==
      "SELECT timestamp_seconds(time_us / 1000000)")
    assert(translate("SELECT x AT TIME ZONE 'utc' FROM t") == "SELECT x FROM t")
  }

  test("double-quoted identifiers → backticks; string literals untouched") {
    assert(translate("""SELECT em."offset" FROM t em""") ==
      "SELECT em.`offset` FROM t em")
    assert(translate("""INSERT INTO m (partition, "offset", topic) SELECT 1, 2, 3""") ==
      "INSERT INTO m (partition, `offset`, topic) SELECT 1, 2, 3")
    // double quotes inside a single-quoted literal are data, not idents
    assert(translate("""SELECT '{"k":"v"}' AS j FROM t""") ==
      """SELECT '{"k":"v"}' AS j FROM t""")
    // multi-word double-quoted content is left alone (not an identifier)
    assert(translate("""SELECT "not an ident" FROM t""") ==
      """SELECT "not an ident" FROM t""")
  }

  test("trailing comma before FROM is tolerated (DuckDB-ism)") {
    assert(translate("SELECT a, b, FROM t") == "SELECT a, b FROM t")
    assert(translate("SELECT a,\n      FROM t") == "SELECT a\n      FROM t")
    // a comma before a column merely PREFIXED "from..." must survive
    assert(translate("SELECT a, fromage FROM t") == "SELECT a, fromage FROM t")
    // from_* FUNCTIONS are not the FROM keyword ('_' continues the ident)
    assert(translate("SELECT a, from_unixtime(ts) AS t FROM b") ==
      "SELECT a, from_unixtime(ts) AS t FROM b")
    // inside a string literal it is data
    assert(translate("SELECT 'x, FROM y' AS s FROM t") ==
      "SELECT 'x, FROM y' AS s FROM t")
  }

  test("parseUpsert: qualified tables, column lists, quoted idents, assigns") {
    val spec = parseUpsert(
      """INSERT INTO my_db.meta (partition, "offset", topic)
        |SELECT p, o, t FROM b
        |ON CONFLICT (topic, partition) DO UPDATE SET
        |  "offset" = EXCLUDED."offset",
        |  updated_at = now()""".stripMargin).get
    assert(spec.table == "my_db.meta")
    assert(spec.insertColumns == Seq("partition", "offset", "topic"))
    assert(spec.conflictKeys == Seq("topic", "partition"))
    assert(spec.sets == Seq(Replace("offset"), Assign("updated_at", "now()")))
  }

  test("parseUpsert extracts table, keys, additive sets") {
    val spec = parseUpsert(
      """INSERT INTO agg BY NAME
        |SELECT b, c, count(*) as count FROM batch GROUP BY b, c
        |ON CONFLICT (b, c) DO UPDATE SET count = count + EXCLUDED.count""".stripMargin).get
    assert(spec.table == "agg")
    assert(spec.conflictKeys == Seq("b", "c"))
    assert(spec.sets == Seq(Additive("count")))
    assert(spec.selectSql.startsWith("SELECT"))
    assert(parseUpsert("SELECT 1").isEmpty)
  }

  test("parseDelete extracts table and translated condition") {
    val d = parseDelete(
      "DELETE FROM agg WHERE bucket < (now()::timestamptz - INTERVAL '60' SECOND)").get
    assert(d.table == "agg")
    assert(d.whereSql ==
      "bucket < (CAST(current_timestamp() AS TIMESTAMP) - INTERVAL '60' SECOND)")
  }

  test("findTableFunctions locates read_csv variants") {
    val fns = findTableFunctions(
      "SELECT * FROM read_csv('/tmp/a.csv', auto_detect=True, header=True) JOIN read_json_auto('/tmp/b.json')")
    assert(fns.map(f => (f.kind, f.path)) ==
      Seq(("read_csv", "/tmp/a.csv"), ("read_json_auto", "/tmp/b.json")))
  }

  test("QUALIFY on a select-list alias wraps in a subquery filter") {
    assert(translate(
      "SELECT city, row_number() OVER (ORDER BY n DESC) AS rk FROM t QUALIFY rk <= 3 ORDER BY rk") ==
      "SELECT * FROM (SELECT city, row_number() OVER (ORDER BY n DESC) AS rk FROM t) WHERE rk <= 3 ORDER BY rk")
  }

  test("QUALIFY with an inline window materializes the predicate column") {
    val out = translate(
      "SELECT city FROM t QUALIFY row_number() OVER (PARTITION BY st ORDER BY n DESC) = 1")
    assert(out.startsWith("SELECT * EXCEPT (__graft_qualify) FROM (SELECT city,"))
    assert(out.contains("AS __graft_qualify FROM t) WHERE __graft_qualify"))
  }

  test("QUALIFY inside a CTE body is rewritten; quoted text untouched") {
    val out = translate(
      "WITH top AS (SELECT a, rank() OVER (ORDER BY b) AS rk FROM t QUALIFY rk = 1) SELECT 'QUALIFY x' AS lit, a FROM top")
    assert(out.contains("WITH top AS (SELECT * FROM (SELECT a, rank() OVER (ORDER BY b) AS rk FROM t) WHERE rk = 1)"))
    assert(out.contains("'QUALIFY x' AS lit"))
  }

  test("DuckDB list_* functions rename to Spark array equivalents") {
    assert(translate("SELECT list_transform(a, x -> x + 1), list_min(a) FROM t") ==
      "SELECT transform(a, x -> x + 1), array_min(a) FROM t")
    assert(translate("SELECT list_filter(list_distinct(a), x -> x > 0) FROM t") ==
      "SELECT filter(array_distinct(a), x -> x > 0) FROM t")
    // null ordering verified equivalent on the oracle's DuckDB (1.0.0
    // nulls-last, same as Spark array_sort)
    assert(translate("SELECT array_to_string(list_sort(a), ',') FROM t") ==
      "SELECT array_join(array_sort(a), ',') FROM t")
    // not function calls / quoted → untouched
    assert(translate("SELECT 'list_min(a)' AS s, list_min_x FROM t") ==
      "SELECT 'list_min(a)' AS s, list_min_x FROM t")
    // arg_max/arg_min → max_by/min_by (same arg order and semantics)
    assert(translate("SELECT arg_max(k, v), arg_min(k, v) FROM t GROUP BY g") ==
      "SELECT max_by(k, v), min_by(k, v) FROM t GROUP BY g")
  }

  test("star EXCLUDE rewrites to Spark EXCEPT (list and bare forms)") {
    assert(translate("SELECT * EXCLUDE (a, b) FROM t") ==
      "SELECT * EXCEPT (a, b) FROM t")
    assert(translate("SELECT t.* EXCLUDE secret FROM t") ==
      "SELECT t.* EXCEPT (secret) FROM t")
    // not a star modifier → untouched
    assert(translate("SELECT 'EXCLUDE (a)' AS s FROM t") ==
      "SELECT 'EXCLUDE (a)' AS s FROM t")
  }

  test("star REPLACE rewrites to EXCEPT + recomputed columns (order moves to end)") {
    assert(translate("SELECT * REPLACE (round(price, 2) AS price) FROM t") ==
      "SELECT * EXCEPT (price), round(price, 2) AS price FROM t")
    // multiple items; exprs with nested commas/parens survive the scan
    assert(translate(
      "SELECT * REPLACE (coalesce(a, 0) AS a, concat(b, ',x') AS b) FROM t") ==
      "SELECT * EXCEPT (a, b), coalesce(a, 0) AS a, concat(b, ',x') AS b FROM t")
    // qualified star keeps its qualifier
    assert(translate("SELECT t.* REPLACE (upper(n) AS n) FROM t") ==
      "SELECT t.* EXCEPT (n), upper(n) AS n FROM t")
    // string literal containing REPLACE ( → untouched
    assert(translate("SELECT '* REPLACE (x AS y)' AS s FROM t") ==
      "SELECT '* REPLACE (x AS y)' AS s FROM t")
    // replace() the FUNCTION is untouched (no star anchor)
    assert(translate("SELECT replace(a, 'x', 'y') FROM t") ==
      "SELECT replace(a, 'x', 'y') FROM t")
  }

  test("DISTINCT ON rewrites to row_number keep-first; ORDER BY drives the pick") {
    assert(translate(
      "SELECT DISTINCT ON (user_id) user_id, ts, v FROM t ORDER BY user_id, ts DESC") ==
      "SELECT * EXCEPT (__graft_rn) FROM (SELECT user_id, ts, v, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY user_id, ts DESC) AS __graft_rn " +
        "FROM t) WHERE __graft_rn = 1 ORDER BY user_id, ts DESC")
    // no ORDER BY → partition keys order the window (deterministic pick)
    assert(translate("SELECT DISTINCT ON (k) k, v FROM t") ==
      "SELECT * EXCEPT (__graft_rn) FROM (SELECT k, v, " +
        "row_number() OVER (PARTITION BY k ORDER BY k) AS __graft_rn " +
        "FROM t) WHERE __graft_rn = 1")
    // plain DISTINCT untouched
    assert(translate("SELECT DISTINCT k FROM t") == "SELECT DISTINCT k FROM t")
  }

  test("DISTINCT ON after a WITH prologue is rewritten (top-level SELECT anchor)") {
    val out = translate(
      "WITH r AS (SELECT k, ts, v FROM t) SELECT DISTINCT ON (k) k, v FROM r ORDER BY k, ts DESC")
    assert(out ==
      "WITH r AS (SELECT k, ts, v FROM t) SELECT * EXCEPT (__graft_rn) FROM (SELECT k, v, " +
        "row_number() OVER (PARTITION BY k ORDER BY k, ts DESC) AS __graft_rn " +
        "FROM r) WHERE __graft_rn = 1 ORDER BY k, ts DESC")
    // DISTINCT ON inside a CTE body still rewrites via the paren descent
    val inner = translate(
      "WITH d AS (SELECT DISTINCT ON (k) k, v FROM t) SELECT k FROM d")
    assert(inner.contains("row_number() OVER (PARTITION BY k"))
  }

  test("SELECT-list unnest rewrites to explode") {
    assert(translate("SELECT id, unnest(tags) AS tag FROM t") ==
      "SELECT id, explode(tags) AS tag FROM t")
    assert(translate("SELECT 'unnest(x)' AS s FROM t") ==
      "SELECT 'unnest(x)' AS s FROM t")
  }

  test("correlated LIMIT 1 left join is rewritten to dedup-then-join") {
    val sql =
      """SELECT a FROM batch LEFT JOIN (
        | SELECT * FROM locations WHERE locations.city = properties.city LIMIT 1
        |) AS single_location ON single_location.city = properties.city""".stripMargin
    val out = translate(sql)
    assert(out.contains("row_number() OVER (PARTITION BY city"))
    assert(!out.toUpperCase.contains("LIMIT 1"))
  }

  test("ASOF LEFT JOIN rewrites to interval join, backward = lead window") {
    val out = translate(
      "SELECT l.a, p.v FROM l ASOF LEFT JOIN prices p " +
        "ON l.k = p.k AND l.ts >= p.ts ORDER BY l.a")
    assert(out.contains(
      "LEFT JOIN (SELECT *, lead(ts) OVER (PARTITION BY k ORDER BY ts) " +
        "AS __asof_end FROM prices WHERE ts IS NOT NULL) AS p"), out)
    assert(out.contains("ON l.k = p.k AND l.ts >= p.ts AND " +
      "(p.__asof_end IS NULL OR l.ts < p.__asof_end)"), out)
    // the query-level ORDER BY is untouched
    assert(out.endsWith("ORDER BY l.a"), out)
  }

  test("ASOF JOIN (inner, forward <=) uses lag; LEFT ASOF keyword order also accepted") {
    val inner = translate(
      "SELECT * FROM l ASOF JOIN quotes ON l.ts <= quotes.ts")
    assert(inner.contains(
      "JOIN (SELECT *, lag(ts) OVER (ORDER BY ts) AS __asof_end " +
        "FROM quotes WHERE ts IS NOT NULL) AS quotes"), inner)
    assert(!inner.startsWith("LEFT"), inner)
    assert(inner.contains("(quotes.__asof_end IS NULL OR l.ts > quotes.__asof_end)"),
      inner)
    val alt = translate(
      "SELECT * FROM l LEFT ASOF JOIN quotes q ON l.k = q.k AND q.ts <= l.ts")
    assert(alt.contains("LEFT JOIN (SELECT *, lead(ts) OVER " +
      "(PARTITION BY k ORDER BY ts)"), alt)
    assert(alt.contains("(q.__asof_end IS NULL OR l.ts < q.__asof_end)"), alt)
  }

  test("ASOF strict inequality shifts the interval bound to inclusive") {
    val out = translate(
      "SELECT * FROM l ASOF JOIN r ON l.k = r.k AND l.ts > r.ts")
    assert(out.contains("lead(ts)"), out)
    assert(out.contains("(r.__asof_end IS NULL OR l.ts <= r.__asof_end)"), out)
  }

  test("PIVOT statement rewrites to Spark PIVOT clause with named value columns") {
    val out = translate(
      "PIVOT orders ON o_orderstatus IN ('O', 'F') USING count(o_totalprice) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    // count: empty combos are 0 in DuckDB but NULL in Spark's clause —
    // the rewrite adds the repair projection
    assert(out.startsWith(
      "SELECT o_orderpriority, coalesce(`O`, 0) AS `O`, coalesce(`F`, 0) AS `F` " +
        "FROM (SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders)"), out)
    assert(out.contains(
      "PIVOT (count(o_totalprice) FOR o_orderstatus IN ('O' AS `O`, 'F' AS `F`))"), out)
    assert(out.endsWith("ORDER BY o_orderpriority"), out)
    // non-count aggs are NULL in both engines: no repair projection
    val sum = translate(
      "PIVOT orders ON o_orderstatus IN ('O') USING sum(o_totalprice) " +
        "GROUP BY o_orderpriority")
    assert(sum.startsWith("SELECT * FROM"), sum)
    assert(!sum.contains("coalesce"), sum)
  }

  test("UNPIVOT statement rewrites to Spark UNPIVOT clause") {
    val out = translate(
      "UNPIVOT wide ON a, b, c INTO NAME metric VALUE v ORDER BY g, metric")
    assert(out.startsWith(
      "SELECT * FROM wide UNPIVOT (v FOR metric IN (a, b, c))"), out)
    assert(out.endsWith("ORDER BY g, metric"), out)
    // multi-value form unsupported → untouched, loud failure
    val multi = "UNPIVOT wide ON (a, b) INTO NAME m VALUE x, y"
    assert(translate(multi).trim.startsWith("UNPIVOT"), translate(multi))
  }

  test("PIVOT auto-discovery form (no IN list) is left untouched") {
    val auto = "PIVOT orders ON o_orderstatus USING count(o_totalprice) " +
      "GROUP BY o_orderpriority"
    assert(translate(auto).trim.startsWith("PIVOT"), translate(auto))
  }

  test("unsupported ASOF shapes are left untouched (loud Spark failure)") {
    // two inequalities — not a valid single-pick asof
    val two = "SELECT * FROM l ASOF JOIN r ON l.ts >= r.ts AND l.ts2 >= r.ts2"
    assert(translate(two).contains("ASOF"), translate(two))
    // non-column operand (literal) in a condition
    val lit = "SELECT * FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= '2020-01-01'"
    assert(translate(lit).contains("ASOF"), translate(lit))
    // right-only equality (r.a = r.b): would become a bogus window
    // partition key → duplicate matches; must stay untouched
    val rr = "SELECT * FROM l ASOF JOIN r ON l.k = r.k AND r.a = r.b AND l.ts >= r.ts"
    assert(translate(rr).contains("ASOF"), translate(rr))
  }

  test("count(DISTINCT) OVER becomes size(collect_set() OVER)") {
    assert(translate(
      "SELECT count(DISTINCT x) OVER (PARTITION BY g) FROM t") ==
      "SELECT size(collect_set(x) OVER (PARTITION BY g)) FROM t")
    // framed form, nested parens in the expression, CAST wrapper
    assert(translate(
      """SELECT CAST(count(DISTINCT coalesce(a, b)) OVER (PARTITION BY g
        |ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) FROM t"""
        .stripMargin).contains(
      "CAST(size(collect_set(coalesce(a, b)) OVER (PARTITION BY g"))
    // named window reference
    assert(translate(
      "SELECT count(DISTINCT x) OVER w FROM t WINDOW w AS (PARTITION BY g)")
      .startsWith("SELECT size(collect_set(x) OVER w) FROM t"))
    // two occurrences in one select list both rewrite
    val two = translate(
      "SELECT count(DISTINCT a) OVER (PARTITION BY g), count(DISTINCT b) OVER (PARTITION BY h) FROM t")
    assert(two == "SELECT size(collect_set(a) OVER (PARTITION BY g)), " +
      "size(collect_set(b) OVER (PARTITION BY h)) FROM t", two)
  }

  test("bare alias starting with 'over' is not a window reference") {
    // `overall` is a legal bare alias in DuckDB — the rewrite must
    // require the OVER keyword to end at a word boundary
    assert(translate("SELECT count(DISTINCT x) overall FROM t GROUP BY g") ==
      "SELECT count(DISTINCT x) overall FROM t GROUP BY g")
    assert(translate("SELECT count(DISTINCT x) over_2 FROM t GROUP BY g") ==
      "SELECT count(DISTINCT x) over_2 FROM t GROUP BY g")
  }

  test("count(DISTINCT … OVER pattern inside a string literal is opaque") {
    val s = "SELECT 'count(DISTINCT x) OVER (PARTITION BY g)' AS doc FROM t"
    assert(translate(s) == s)
  }

  test("plain count(DISTINCT) without OVER is untouched") {
    assert(translate("SELECT count(DISTINCT x) FROM t GROUP BY g") ==
      "SELECT count(DISTINCT x) FROM t GROUP BY g")
    // sum(DISTINCT) OVER is NOT transposed — Spark must fail loudly
    assert(translate("SELECT sum(DISTINCT x) OVER (PARTITION BY g) FROM t")
      .contains("sum(DISTINCT x) OVER"))
  }
}
