package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational SQL surface of the reference engine, re-expressed
  * Spark-first over the driver's TPC-H-ish testdata.
  *
  * The reference (turbolytics/sql-flow) delegates all relational
  * operators to an embedded SQL engine; the surface it actually
  * exercises is catalogued in /root/repo/SURVEY.md §2B with file:line
  * citations (projection/filter, nested access, JSON extraction,
  * equi/left/range/anti joins, hash + global aggregation, tumbling
  * buckets via date_trunc/time_bucket, ORDER BY/LIMIT, strftime-style
  * formatting). Each query below exercises one of those constructs as
  * an idiomatic DataFrame plan, with a DuckDB oracle for the driver's
  * correctness gate.
  *
  * Determinism rules (so the DuckDB compare is stable):
  *  - every float aggregate is `round(...)`-ed identically on both sides
  *  - every output has a total ORDER BY
  *  - timestamps are emitted as formatted strings (tz-representation-proof)
  *  - DuckDB integer sums are CAST(... AS BIGINT) (DuckDB widens to HUGEINT)
  */
object Relational {
  import Tables.t

  // --- q01: hash aggregation, multiple aggregates (SURVEY §2B "Aggregation";
  //     reference example basic.agg.mem.yml:17-24 = COUNT(*) GROUP BY key).
  private val q01 = GraftQuery(
    "q01_agg_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
            round(avg(l_quantity), 4) AS avg_qty,
            round(avg(l_discount), 4) AS avg_disc,
            count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    headline = true)

  // --- q02: projection + filter pushdown (SURVEY §2B "Projection / filter";
  //     reference WHERE usage e.g. kafka.motherduck.idempotent.yml:52-53).
  //     Filter + 3-column projection must reach the parquet scan.
  private val q02 = GraftQuery(
    "q02_filter_project",
    (s, dir) => {
      t(s, dir, "events")
        .filter(col("event_type") === "click" && col("value") > 300.0)
        .select(
          col("event_id"), col("user_id"),
          round(col("value"), 2).as("value_r"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, round(value, 2) AS value_r
            FROM events
            WHERE event_type = 'click' AND value > 300.0
            ORDER BY event_id"""),
    headline = true)

  // --- q03: multi-way equi-join with small dims + post-join aggregation
  //     (SURVEY §2B "Joins": stream×dim join with GROUP BY,
  //     csv.filesystem.join.yml:15-25). Dims are broadcast — no shuffle
  //     on the fact side for the join itself.
  private val q03 = GraftQuery(
    "q03_join_agg_revenue_by_nation",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      orders
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_revenue"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, count(*) AS n_orders,
            round(sum(o_totalprice), 2) AS total_revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""),
    headline = true)

  // --- q04: global aggregation, no GROUP BY (SURVEY §2B,
  //     local.parquet.sink.yml:16 `SELECT COUNT(*)`), plus exact
  //     count-distinct (partial-agg + single final reduce).
  private val q04 = GraftQuery(
    "q04_global_agg",
    (s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        date_format(min("l_shipdate"), "yyyy-MM-dd").as("min_ship"),
        date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_ship"))
    },
    Some("""SELECT count(*) AS n_rows,
            count(DISTINCT l_orderkey) AS n_orders,
            round(sum(l_quantity), 2) AS sum_qty,
            strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
            strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
            FROM lineitem"""))

  // --- q05: join + agg + ORDER BY + LIMIT (top-k) (SURVEY §2B
  //     "Sorts / limits"; ORDER BY in basic.agg.mem.yml:24).
  //     TakeOrderedAndProject — no global sort of the whole relation.
  private val q05 = GraftQuery(
    "q05_topk_customers",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      orders.groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(cust), col("o_custkey") === cust("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },
    Some("""SELECT c_custkey, c_name, revenue, n_orders FROM (
              SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue,
                     count(*) AS n_orders
              FROM orders GROUP BY o_custkey
            ) JOIN customer ON o_custkey = c_custkey
            ORDER BY revenue DESC, c_custkey LIMIT 10"""),
    headline = true)

  // --- q06: tumbling-window aggregation via date_trunc bucket — the
  //     reference's core windowing pattern (tumbling.window.yml:48-58,
  //     SURVEY §2B "time_bucket/date_trunc + GROUP BY").
  private val q06 = GraftQuery(
    "q06_tumbling_hour",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("bucket", "event_type")
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
            event_type, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""),
    headline = true)

  // --- q07: JSON extraction from a string column (SURVEY §2B
  //     `col ->> 'key'`, kafka.motherduck.yml:26-27) — Spark answers
  //     with get_json_object, fully codegen'd.
  private val q07 = GraftQuery(
    "q07_json_extract",
    (s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
            round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // --- q08: strftime-style formatting + CASE expression (SURVEY §2B
  //     "Scalar functions": strftime tumbling.window.yml:16; CASE is the
  //     dialect-shim's date_format mapping target).
  private val q08 = GraftQuery(
    "q08_datefmt_case",
    (s, dir) => {
      t(s, dir, "events")
        .select(
          date_format(col("ts"), "yyyy-MM-dd'T'HH").as("hour_str"),
          when(col("value") >= 250.0, "high").otherwise("low").as("band"))
        .groupBy("hour_str", "band")
        .agg(count(lit(1)).as("n"))
        .orderBy("hour_str", "band")
    },
    Some("""SELECT strftime(ts, '%Y-%m-%dT%H') AS hour_str,
            CASE WHEN value >= 250.0 THEN 'high' ELSE 'low' END AS band,
            count(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY hour_str, band"""))

  // --- q09: dedup-then-left-join — the Spark rewrite of the reference's
  //     correlated `LIMIT 1` subquery join (csv.mem.join.yml:24-34,
  //     SURVEY §7.4 risk #3): keep exactly one dim row per key via
  //     row_number, then left join.
  private val q09 = GraftQuery(
    "q09_dedup_left_join",
    (s, dir) => {
      val nation = t(s, dir, "nation")
      val supp = t(s, dir, "supplier")
      val w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
      val dim = supp.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("s_nationkey"), col("s_name"))
      nation.join(broadcast(dim),
          nation("n_nationkey") === dim("s_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"), col("s_name"))
        .orderBy("n_nationkey")
    },
    Some("""SELECT n_nationkey, n_name, s_name
            FROM nation LEFT JOIN (
              SELECT s_nationkey, s_name, row_number() OVER
                (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
              FROM supplier) s
            ON n_nationkey = s_nationkey AND rn = 1
            ORDER BY n_nationkey"""))

  // --- q10: range (theta) join against a small bucket dim — the
  //     reference's inet range join shape (attach-geoip.yml:36,
  //     SURVEY §2B "range/theta join"). Broadcast nested-loop on a
  //     5-row dim: correct plan at any fact-side scale.
  private val q10 = GraftQuery(
    "q10_range_join_buckets",
    (s, dir) => {
      import s.implicits._
      val buckets = Seq(
        ("b0_050", 0.0, 50.0), ("b1_100", 50.0, 100.0),
        ("b2_200", 100.0, 200.0), ("b3_300", 200.0, 300.0),
        ("b4_max", 300.0, 1e9)).toDF("bucket_name", "lo", "hi")
      val ev = t(s, dir, "events")
      ev.join(broadcast(buckets),
          ev("value") >= buckets("lo") && ev("value") < buckets("hi"))
        .groupBy("bucket_name")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("bucket_name")
    },
    Some("""WITH buckets(bucket_name, lo, hi) AS (VALUES
              ('b0_050', 0.0, 50.0), ('b1_100', 50.0, 100.0),
              ('b2_200', 100.0, 200.0), ('b3_300', 200.0, 300.0),
              ('b4_max', 300.0, 1000000000.0))
            SELECT bucket_name, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events JOIN buckets ON value >= lo AND value < hi
            GROUP BY bucket_name ORDER BY bucket_name"""))

  // --- q11: anti join / NOT EXISTS (SURVEY §2B "anti-join-by-predicate",
  //     kafka.motherduck.idempotent.yml:47-53) as a left_anti join.
  private val q11 = GraftQuery(
    "q11_anti_join",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val pOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      cust.join(pOrders, cust("c_custkey") === pOrders("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers_without_p_orders"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_customers_without_p_orders
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'P')
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // --- q12: semi join / EXISTS (SURVEY §2B "semi/anti" extension) as
  //     left_semi — no row multiplication, map-side-combinable agg.
  private val q12 = GraftQuery(
    "q12_semi_join",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 200000.0)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers_with_big_order"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_customers_with_big_order
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 200000.0)
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // --- q13: UNION + DISTINCT set semantics (SURVEY §2B "set-ops" extension).
  private val q13 = GraftQuery(
    "q13_union_distinct",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"))
      c.union(sup).distinct().orderBy("nationkey")
    },
    Some("""SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
            UNION
            SELECT CAST(s_nationkey AS INTEGER) FROM supplier
            ORDER BY nationkey"""))

  // --- q14: the reference's idempotent-consumer pattern — filter a
  //     stream against per-key max offsets from a meta table
  //     (kafka.motherduck.idempotent.yml:44-80). Meta side is tiny →
  //     broadcast; predicate `mx IS NULL OR offset > mx`.
  private val q14 = GraftQuery(
    "q14_idempotent_offset_filter",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val meta = ev.filter(col("ts") < lit("2024-01-15"))
        .groupBy(col("event_type").as("m_type"))
        .agg(max("event_id").as("mx"))
      ev.join(broadcast(meta), ev("event_type") === meta("m_type"), "left")
        .filter(col("mx").isNull || col("event_id") > col("mx"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_new"))
        .orderBy("event_type")
    },
    Some("""SELECT e.event_type, count(*) AS n_new
            FROM events e
            LEFT JOIN (SELECT event_type AS m_type, max(event_id) AS mx
                       FROM events WHERE ts < '2024-01-15'
                       GROUP BY event_type) m
              ON e.event_type = m.m_type
            WHERE m.mx IS NULL OR e.event_id > m.mx
            GROUP BY e.event_type ORDER BY e.event_type"""))

  // --- q15: window functions (OVER) — beyond reference parity
  //     (SURVEY §2B notes none are exercised); top-2 orders per customer.
  private val q15 = GraftQuery(
    "q15_window_topn_per_key",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"), col("rn"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 2 ORDER BY o_custkey, rn"""))

  // --- q16: ROLLUP grouping sets (beyond-parity aggregation surface).
  //     NULL grouping keys are coalesced to 'ALL' on both sides so the
  //     compare never sees engine-specific NULL ordering.
  private val q16 = GraftQuery(
    "q16_rollup",
    (s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
            coalesce(l_linestatus, 'ALL') AS linestatus,
            count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY returnflag, linestatus"""))

  // --- q17: as-of join (SURVEY §2B "as-of joins — not exercised" →
  //     beyond-parity operator; see graft.operators.AsofJoin for the
  //     union+window design). Each non-purchase event is matched to the
  //     user's latest purchase at-or-before its timestamp; oracle uses
  //     DuckDB's native ASOF LEFT JOIN.
  private val q17 = GraftQuery(
    "q17_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max("value").as("p_value"))
      val left = ev.filter(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts", "event_type")
      graft.operators.AsofJoin.asofLeft(
          left, purchases,
          keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "p_ts",
          payload = Seq("p_ts", "p_value"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          round(col("p_value"), 2).as("purchase_value"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT user_id, ts AS p_ts, max(value) AS p_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts),
                 l AS (SELECT event_id, user_id, ts, event_type
                       FROM events WHERE event_type <> 'purchase')
            SELECT l.event_id, l.user_id, l.event_type,
                   strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                   round(p.p_value, 2) AS purchase_value
            FROM l ASOF LEFT JOIN p
              ON l.user_id = p.user_id AND l.ts >= p.p_ts
            ORDER BY event_id"""),
    headline = true)

  // --- q18: INTERSECT / EXCEPT set ops (SURVEY §2B "set-ops" extension).
  //     Both are keyed shuffles with early distinct — no row blow-up.
  private val q18 = GraftQuery(
    "q18_intersect_except",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"))
      val both = c.intersect(sup).withColumn("which", lit("both"))
      val onlyCust = c.except(sup).withColumn("which", lit("customer_only"))
      both.union(onlyCust).orderBy("which", "nationkey")
    },
    Some("""SELECT * FROM (
              SELECT nationkey, 'both' AS which FROM (
                SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
                INTERSECT
                SELECT CAST(s_nationkey AS INTEGER) FROM supplier)
              UNION ALL
              SELECT nationkey, 'customer_only' AS which FROM (
                SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
                EXCEPT
                SELECT CAST(s_nationkey AS INTEGER) FROM supplier))
            ORDER BY which, nationkey"""))

  // --- q19: HLL approximate count-distinct (SURVEY §2B "HLL/approx —
  //     not exercised → native if extended"). Engines' sketches differ,
  //     so no value-exact oracle — rows-only check here; the spec
  //     asserts ≤ 5% relative error against the exact count.
  private val q19 = GraftQuery(
    "q19_approx_count_distinct",
    (s, dir) => {
      // HLL sketches differ across engines, so the estimate itself can
      // never hash-match an oracle. The gate instead emits the EXACT
      // distinct count (hash-checked against DuckDB) plus a boolean
      // asserting the rsd=0.01 HLL estimate landed within ±5% of it
      // (a ~5σ bound: deterministic for Spark's seed-fixed HLL++, and
      // a real regression gate — a broken sketch, wrong column, or
      // rsd mis-plumb flips the boolean and fails the hash).
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("exact_orders"), col("n_rows"),
          (abs(col("approx") - col("exact_orders")) <=
            col("exact_orders") * lit(0.05)).as("hll_within_5pct"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
              count(*) AS n_rows, TRUE AS hll_within_5pct
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // --- q20: sliding (hopping) window aggregation — beyond the
  //     reference's tumbling-only ADR scope; Spark-native
  //     window(ts, size, slide). Each event lands in size/slide buckets;
  //     the oracle enumerates both candidate window starts per event.
  private val q20 = GraftQuery(
    "q20_sliding_window",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("wstart", "event_type")
    },
    Some("""WITH cand AS (
              SELECT event_type, value, ts,
                unnest([
                  to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800),
                  to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800)
                ]) AS wstart
              FROM events)
            SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
              count(*) AS n, round(sum(value), 2) AS sum_value
            FROM cand
            WHERE ts >= wstart AND ts < wstart + INTERVAL 1 HOUR
            GROUP BY 1, 2 ORDER BY wstart, event_type"""))

  // --- q21: session windows (30-min gap) per user — Spark-native
  //     session_window; the oracle is the classic gaps-and-islands
  //     rewrite (new session when the gap from the previous event
  //     exceeds the threshold). Outputs event-time extents, which both
  //     formulations agree on exactly.
  private val q21 = GraftQuery(
    "q21_session_window",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
        .select(col("user_id"), col("first_ts"), col("last_ts"), col("n_events"))
        .orderBy("user_id", "first_ts")
    },
    Some("""WITH o AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM o)
            SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
              count(*) AS n_events
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, first_ts"""))

  // --- q22: NOT EXISTS + scalar-subquery threshold (TPC-H Q22 shape):
  //     above-average-balance customers with no URGENT order. The
  //     scalar (global avg) broadcasts; NOT EXISTS is a left-anti join
  //     on the customer key — no correlated re-execution. (Nearly every
  //     customer has SOME order in the fixture, so the anti-join is on
  //     the filtered urgent subset to keep the gate row informative at
  //     every SF: 5 / 75 / 937 customers at sf0.001/0.01/0.1.)
  private val q22 = GraftQuery(
    "q22_exists_antijoin",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("avg_bal"))
      val rich = cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
      rich.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, count(*) AS n_cust,
              round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total_bal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            GROUP BY c_nationkey ORDER BY c_nationkey"""))

  // --- q23: correlated per-group average threshold (TPC-H Q17 shape).
  //     The per-part average is a separate agg joined back — one keyed
  //     shuffle each, never a correlated re-scan per row.
  private val q23 = GraftQuery(
    "q23_pergroup_avg_filter",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val partAvg = li.groupBy("l_partkey")
        .agg(avg("l_quantity").as("avg_qty"))
      li.join(partAvg, "l_partkey")
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    },
    Some("""SELECT round(CAST(sum(l_extendedprice) / 7.0 AS DOUBLE), 2) AS avg_yearly
            FROM lineitem l
            WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                                WHERE l_partkey = l.l_partkey)"""))

  // --- q24: CTE chain through spark.sql (TPC-H Q15 shape): revenue
  //     per supplier → max → equality join back. Exercises the SQL-text
  //     path end-to-end (WITH, subquery reuse, HAVING-free max filter).
  private val q24 = GraftQuery(
    "q24_cte_top_supplier",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM g_lineitem GROUP BY l_suppkey),
        top AS (SELECT max(total_revenue) AS max_revenue FROM revenue)
        SELECT s_suppkey, s_name, total_revenue
        FROM g_supplier JOIN revenue ON s_suppkey = supplier_no
        JOIN top ON total_revenue = max_revenue
        ORDER BY s_suppkey""")
    },
    Some("""WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                     round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS total_revenue
              FROM lineitem GROUP BY l_suppkey),
            top AS (SELECT max(total_revenue) AS max_revenue FROM revenue)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            JOIN top ON total_revenue = max_revenue
            ORDER BY s_suppkey"""))

  // Exact DISCRETE percentiles (Spark `percentile_disc` ≡ DuckDB
  // `quantile_disc`: smallest value whose cumulative distribution ≥ q).
  // Discrete selection returns an actual data value — zero interpolation
  // arithmetic, so the oracle is bit-exact with no rounding. (The
  // interpolated `percentile`/`quantile_cont` pair differs by 1 ulp in
  // midpoint arithmetic between engines — measured: a cent flip at
  // sf0.001 — which is exactly the boundary-rounding hazard a gate
  // query must not carry.) The exact form needs each group's values
  // together — one shuffle by group key; at 100 TB the sketch path is
  // approx_percentile (map-side mergeable), per the exact-baseline /
  // scale-path pairing used across the dedup family.
  private val q25 = GraftQuery(
    "q25_percentiles",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem_q25")
      s.sql("""SELECT l_returnflag,
                percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
                percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90,
                percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99
              FROM g_lineitem_q25 GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
              quantile_disc(l_extendedprice, 0.5) AS p50,
              quantile_disc(l_extendedprice, 0.9) AS p90,
              quantile_disc(l_extendedprice, 0.99) AS p99
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // PIVOT: revenue matrix returnflag × linestatus. Spark's relational
  // pivot with an EXPLICIT value list stays a single hash aggregate
  // (no second values-discovery job); the oracle is the conditional-
  // aggregation desugaring.
  private val q26 = GraftQuery(
    "q26_pivot_revenue",
    (s, dir) => {
      t(s, dir, "lineitem")
        .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("rev"), 2))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
              round(sum(CASE WHEN l_linestatus = 'F'
                THEN l_extendedprice * (1 - l_discount) END), 2) AS F,
              round(sum(CASE WHEN l_linestatus = 'O'
                THEN l_extendedprice * (1 - l_discount) END), 2) AS O
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // LAG window function: per-customer order-value delta in order-date
  // order. Shuffle = one hashpartition by customer (bounded partitions,
  // no global sort); deterministic tie-break on orderkey so the frame
  // is total-ordered and the oracle exact.
  private val q27 = GraftQuery(
    "q27_lag_delta",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders_q27")
      s.sql("""SELECT o_custkey, o_orderkey,
                round(o_totalprice - lag(o_totalprice) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
                  AS delta_prev
              FROM g_orders_q27
              ORDER BY o_custkey, o_orderkey""")
    },
    Some("""SELECT o_custkey, o_orderkey,
              round(o_totalprice - lag(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
                AS delta_prev
            FROM orders
            ORDER BY o_custkey, o_orderkey"""))

  // FULL OUTER join: per-nation supplier vs customer counts, nations
  // appearing on either side survive with nulls on the other. Both
  // sides pre-aggregate to ≤ #nations rows before the join, so the
  // outer join runs on two tiny aggregates, not the base tables.
  private val q28 = GraftQuery(
    "q28_full_outer_counts",
    (s, dir) => {
      val sup = t(s, dir, "supplier").groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"))
        .withColumnRenamed("s_nationkey", "nationkey")
      val cust = t(s, dir, "customer")
        .filter(col("c_acctbal") > 9000)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_rich_customers"))
        .withColumnRenamed("c_nationkey", "nationkey")
      sup.join(cust, Seq("nationkey"), "full_outer")
        .orderBy("nationkey")
    },
    Some("""WITH sup AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
              FROM supplier GROUP BY 1),
            cust AS (SELECT c_nationkey AS nationkey, count(*) AS n_rich_customers
              FROM customer WHERE c_acctbal > 9000 GROUP BY 1)
            SELECT COALESCE(sup.nationkey, cust.nationkey) AS nationkey,
              n_suppliers, n_rich_customers
            FROM sup FULL OUTER JOIN cust USING (nationkey)
            ORDER BY nationkey"""))

  // GROUPING SETS: explicit set list (the general form of q16's
  // ROLLUP), with grouping() flags so null-group rows are
  // distinguishable from null keys.
  private val q29 = GraftQuery(
    "q29_grouping_sets",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem_q29")
      s.sql("""SELECT l_returnflag, l_linestatus,
                grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
                count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
              FROM g_lineitem_q29
              GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                      (l_returnflag), (l_linestatus))
              ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
              CAST(grouping(l_linestatus) AS TINYINT) AS g_ls,
              count(*) AS n,
              round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), (l_linestatus))
            ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""))

  // Window FRAME (ROWS BETWEEN): per-user trailing average over the
  // last 4 events. Shuffle = one hash partition by user_id with a
  // partition-local sort — no global sort; the frame is bounded so
  // state per row is O(4). Deterministic tie-break on event_id.
  private val q30 = GraftQuery(
    "q30_moving_avg_frame",
    (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("g_events_q30")
      s.sql("""SELECT user_id, event_id,
                round(avg(value) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4
              FROM g_events_q30
              ORDER BY user_id, event_id""")
    },
    Some("""SELECT user_id, event_id,
              round(avg(value) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4
            FROM events
            ORDER BY user_id, event_id"""))

  // NTILE bucketing: account-balance quartiles. NTILE needs a TOTAL
  // order (one window partition) — fine for a ranked report, but at
  // 100 TB the scale path is approx-quantile bucketing (q25's
  // percentile family) which needs no global sort; this registers the
  // exact operator with that caveat on record. Tie-break on custkey
  // makes the quartile assignment (and thus the oracle) exact.
  private val q31 = GraftQuery(
    "q31_ntile_quartiles",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer_q31")
      s.sql("""WITH q AS (SELECT c_acctbal,
                  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
                FROM g_customer_q31)
              SELECT quartile, count(*) AS n,
                round(min(c_acctbal), 2) AS min_bal,
                round(max(c_acctbal), 2) AS max_bal
              FROM q GROUP BY quartile ORDER BY quartile""")
    },
    Some("""WITH q AS (SELECT c_acctbal,
                ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
              FROM customer)
            SELECT quartile, count(*) AS n,
              round(min(c_acctbal), 2) AS min_bal,
              round(max(c_acctbal), 2) AS max_bal
            FROM q GROUP BY quartile ORDER BY quartile"""))

  // Ordered list aggregation: per-customer CSV of order priorities.
  // collect_list is order-nondeterministic under parallel merge, so
  // the result is array_sort'ed before joining — the only way a list
  // agg is reproducible at scale. One hash-agg shuffle on custkey.
  private val q32 = GraftQuery(
    "q32_collect_sorted_csv",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as("n_orders"),
          array_join(array_sort(collect_list(col("o_orderpriority"))), ",")
            .as("priorities_csv"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, count(*) AS n_orders,
              string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
                AS priorities_csv
            FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  // Aggregate FILTER clause — conditional aggregation without
  // self-joins or CASE pyramids; one pass, map-side combine.
  private val q33 = GraftQuery(
    "q33_filter_clause_agg",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders_q33")
      s.sql("""SELECT o_orderstatus,
                count(*) AS n,
                count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                round(avg(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
                  AS avg_urgent
              FROM g_orders_q33
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
    Some("""SELECT o_orderstatus,
              count(*) AS n,
              count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
              round(avg(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
                AS avg_urgent
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // Fuzzy string matching: closest nation name per region name by edit
  // distance (levenshtein is codegen'd in Spark, built-in in DuckDB).
  // The match space here is dim × dim (tiny, broadcast); at corpus
  // scale the same scalar powers a similarity-gated join after a
  // cheap blocking stage (length / first-letter buckets).
  private val q34 = GraftQuery(
    "q34_levenshtein_nearest",
    (s, dir) => {
      t(s, dir, "region").createOrReplaceTempView("g_region_q34")
      t(s, dir, "nation").createOrReplaceTempView("g_nation_q34")
      s.sql("""WITH d AS (SELECT r_name, n_name,
                  levenshtein(r_name, n_name) AS dist,
                  row_number() OVER (PARTITION BY r_name
                    ORDER BY levenshtein(r_name, n_name), n_name) AS rk
                FROM g_region_q34 CROSS JOIN g_nation_q34)
              SELECT r_name, n_name AS nearest_nation, dist
              FROM d WHERE rk = 1 ORDER BY r_name""")
    },
    Some("""WITH d AS (SELECT r_name, n_name,
                levenshtein(r_name, n_name) AS dist,
                row_number() OVER (PARTITION BY r_name
                  ORDER BY levenshtein(r_name, n_name), n_name) AS rk
              FROM region CROSS JOIN nation)
            SELECT r_name, n_name AS nearest_nation, dist
            FROM d WHERE rk = 1 ORDER BY r_name"""))

  // Distribution-position window functions: percent_rank + cume_dist
  // of account balance within each market segment. Per-key partitioned
  // window — one shuffle on mktsegment, in-partition sort; identical
  // tie semantics on both engines (percent_rank = (rank-1)/(n-1),
  // cume_dist = #peers≤ / n).
  private val q35 = GraftQuery(
    "q35_percent_rank_cume",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"))
        .filter(col("c_custkey") % 10 === 0)
        .orderBy("c_custkey")
    },
    Some("""WITH r AS (SELECT c_custkey, c_mktsegment, c_acctbal,
                round(percent_rank() OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal, c_custkey), 4) AS pr,
                round(cume_dist() OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal, c_custkey), 4) AS cd
              FROM customer)
            SELECT * FROM r WHERE c_custkey % 10 = 0 ORDER BY c_custkey"""))

  // Dense calendar zero-fill: hourly error-event counts with EVERY hour
  // of the events table's span present (missing hours → 0) — the gap
  // repair every time-series rollup needs before charting/anomaly
  // scoring. The hour spine is sequence(min, max, 1h) exploded from a
  // ONE-ROW global agg — a driver-sized scalar, broadcast to the left
  // join against the (already tiny) hourly aggregate. Two scans of
  // events (bounds + counts) but the join itself never touches raw
  // rows; at 100 TB both scans prune to the ts/event_type columns.
  private val q36 = GraftQuery(
    "q36_calendar_zero_fill",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val bounds = ev.agg(
        date_trunc("hour", min("ts")).as("h_min"),
        date_trunc("hour", max("ts")).as("h_max"))
      val spine = bounds.select(explode(
        sequence(col("h_min"), col("h_max"),
          expr("INTERVAL 1 HOUR"))).as("hour_ts"))
      val counts = ev.filter(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("n"))
      spine.join(counts, Seq("hour_ts"), "left")
        .select(col("hour_ts"), coalesce(col("n"), lit(0L)).as("n_errors"))
        .orderBy("hour_ts")
    },
    Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS h_min,
                  date_trunc('hour', max(ts)) AS h_max FROM events),
            spine AS (SELECT unnest(generate_series(h_min, h_max,
                  INTERVAL 1 HOUR)) AS hour_ts FROM b),
            c AS (SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n
                  FROM events WHERE event_type = 'error' GROUP BY 1)
            SELECT spine.hour_ts, COALESCE(c.n, 0) AS n_errors
            FROM spine LEFT JOIN c USING (hour_ts) ORDER BY hour_ts"""))

  // TIME-based window frame: per-user trailing-1-hour event count and
  // value sum via RANGE BETWEEN over epoch seconds — the sliding-
  // horizon metric ROWS frames (q30) cannot express (row counts ≠ time
  // spans on irregular events). Epoch-seconds range keys make the
  // frame engine-portable (Spark lacks INTERVAL range frames). One
  // shuffle on user_id, partition-local sort — q27's shape.
  private val q37 = GraftQuery(
    "q37_time_range_frame",
    (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("g_events_q37")
      s.sql("""SELECT event_id, user_id,
                count(*) OVER w AS n_1h,
                round(sum(value) OVER w, 2) AS sum_1h
              FROM (SELECT event_id, user_id, value,
                      unix_timestamp(ts) AS es FROM g_events_q37)
              WINDOW w AS (PARTITION BY user_id ORDER BY es
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
              ORDER BY event_id""")
    },
    Some("""SELECT event_id, user_id,
              count(*) OVER w AS n_1h,
              round(sum(value) OVER w, 2) AS sum_1h
            FROM (SELECT event_id, user_id, value,
                    -- floor, not cast: epoch() is fractional and a
                    -- double->bigint CAST rounds; Spark's
                    -- unix_timestamp floors
                    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY es
              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  // As-of join with a STALENESS BOUND (pandas merge_asof tolerance):
  // q17's match, but a purchase older than 2 hours is no context at
  // all — nulled, not joined. Same single-shuffle union+window plan;
  // the bound applies to the carried match (never widens the join).
  // Both engines compare FRACTIONAL epoch-second diffs (Spark casts
  // the timestamp to double, DuckDB's epoch() is fractional) — whole-
  // second truncation would mis-decide sub-second gaps at the bound.
  private val q38 = GraftQuery(
    "q38_asof_tolerance",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max("value").as("p_value"))
      val left = ev.filter(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts", "event_type")
      graft.operators.AsofJoin.asofLeft(
          left, purchases,
          keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "p_ts",
          payload = Seq("p_ts", "p_value"),
          toleranceSeconds = Some(7200L))
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          round(col("p_value"), 2).as("purchase_value"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT user_id, ts AS p_ts, max(value) AS p_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts),
                 l AS (SELECT event_id, user_id, ts, event_type
                       FROM events WHERE event_type <> 'purchase')
            SELECT l.event_id, l.user_id, l.event_type,
                   CASE WHEN epoch(l.ts) - epoch(p.p_ts) <= 7200
                     THEN strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') END AS purchase_ts,
                   CASE WHEN epoch(l.ts) - epoch(p.p_ts) <= 7200
                     THEN round(p.p_value, 2) END AS purchase_value
            FROM l ASOF LEFT JOIN p
              ON l.user_id = p.user_id AND l.ts >= p.p_ts
            ORDER BY event_id"""))

  // Positional LATERAL explode (table-generator join): posexplode
  // splits every p_type into (position, word) rows — the
  // generator-in-SELECT surface (DuckDB unnest WITH ORDINALITY /
  // generate_subscripts). Generate runs inside the scan stage (no
  // shuffle to explode); the only shuffle is the (pos, word) count
  // agg, map-side combined to the tiny distinct-key space.
  private val q39 = GraftQuery(
    "q39_lateral_explode",
    (s, dir) => {
      t(s, dir, "part")
        .select(posexplode(split(col("p_type"), " ")).as(Seq("pos", "word")))
        .groupBy("pos", "word")
        .agg(count(lit(1)).as("n"))
        .orderBy("pos", "word")
    },
    Some("""WITH w AS (SELECT unnest(string_split(p_type, ' ')) AS word,
                 CAST(generate_subscripts(string_split(p_type, ' '), 1) - 1
                   AS INT) AS pos
               FROM part)
            SELECT pos, word, count(*) AS n FROM w
            GROUP BY pos, word ORDER BY pos, word"""))

  // Correlated EXISTS + NOT EXISTS (the TPC-H Q21 shape): suppliers
  // whose returned lineitems were the ONLY returned ones in
  // multi-supplier finished orders. Catalyst plans EXISTS as a left
  // semi and NOT EXISTS as a left anti join — lineitem appears three
  // times, all three joins keyed on l_orderkey, so the shuffles
  // co-partition and AQE reuses the exchange; the supplier dim
  // broadcasts. Exercises the correlated-existential SQL surface
  // end-to-end through spark.sql.
  private val q40 = GraftQuery(
    "q40_only_late_supplier",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem_q40")
      t(s, dir, "orders").createOrReplaceTempView("g_orders_q40")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier_q40")
      s.sql("""SELECT s_name, count(*) AS numwait
               FROM g_supplier_q40, g_lineitem_q40 l1, g_orders_q40
               WHERE s_suppkey = l1.l_suppkey
                 AND o_orderkey = l1.l_orderkey
                 AND o_orderstatus = 'F'
                 AND l1.l_returnflag = 'R'
                 AND EXISTS (SELECT 1 FROM g_lineitem_q40 l2
                   WHERE l2.l_orderkey = l1.l_orderkey
                     AND l2.l_suppkey <> l1.l_suppkey)
                 AND NOT EXISTS (SELECT 1 FROM g_lineitem_q40 l3
                   WHERE l3.l_orderkey = l1.l_orderkey
                     AND l3.l_suppkey <> l1.l_suppkey
                     AND l3.l_returnflag = 'R')
               GROUP BY s_name
               ORDER BY numwait DESC, s_name
               LIMIT 20""")
    },
    Some("""SELECT s_name, count(*) AS numwait
            FROM supplier, lineitem l1, orders
            WHERE s_suppkey = l1.l_suppkey
              AND o_orderkey = l1.l_orderkey
              AND o_orderstatus = 'F'
              AND l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_returnflag = 'R')
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 20"""))

  // INTERPOLATED percentiles (percentile_cont ≡ quantile_cont): the
  // continuous complement of q25's percentile_disc. Both engines
  // interpolate linearly at rank p·(n−1); inputs are 2-decimal prices
  // so the interpolated midpoints stay far from the 4-decimal rounding
  // boundary. Same single-pass sort-based agg per group.
  private val q41 = GraftQuery(
    "q41_percentile_cont",
    (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
              round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
              round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
              round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
              round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // Correlated scalar subqueries in the SELECT list — the enrichment
  // surface analysts write first (one subquery per metric). Catalyst
  // de-correlates each into a left outer join against the pre-grouped
  // subquery (no per-row re-execution); both aggregates key on
  // nationkey, the 25-row nation side broadcasts.
  private val q42 = GraftQuery(
    "q42_scalar_subqueries",
    (s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("g_nation_q42")
      t(s, dir, "customer").createOrReplaceTempView("g_customer_q42")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier_q42")
      // the empty-group coalesce sits OUTSIDE the subquery: an
      // aggregate over zero correlated rows surfaces as NULL at the
      // outer level identically in both engines, where in-subquery
      // handling of the empty case is engine-dependent (the classic
      // COUNT-bug corner)
      s.sql("""SELECT n_name,
                 (SELECT count(*) FROM g_customer_q42 c
                  WHERE c.c_nationkey = n.n_nationkey) AS n_cust,
                 coalesce((SELECT round(avg(s_acctbal), 2)
                  FROM g_supplier_q42 s
                  WHERE s.s_nationkey = n.n_nationkey), 0.0) AS avg_supp_bal
               FROM g_nation_q42 n
               ORDER BY n_name""")
    },
    Some("""SELECT n_name,
              (SELECT count(*) FROM customer c
               WHERE c.c_nationkey = n.n_nationkey) AS n_cust,
              coalesce((SELECT round(avg(s_acctbal), 2) FROM supplier s
               WHERE s.s_nationkey = n.n_nationkey), 0.0) AS avg_supp_bal
            FROM nation n
            ORDER BY n_name"""))

  // Multiset set-ops (EXCEPT ALL / INTERSECT ALL) — q18's family with
  // duplicate-preserving semantics: per-nation customer minus supplier
  // multiplicities. Catalyst plans both as aggregate-based counting
  // (no row-by-row anti join); the output re-aggregates per key so the
  // gate compares small deterministic counts.
  private val q43 = GraftQuery(
    "q43_except_intersect_all",
    (s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val supp = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      val ex = cust.exceptAll(supp).groupBy("k")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      val in = cust.intersectAll(supp).groupBy("k")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      ex.unionByName(in).select("op", "k", "n").orderBy("op", "k")
    },
    Some("""WITH ex AS (SELECT k, count(*) AS n FROM
                (SELECT c_nationkey AS k FROM customer
                 EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY k),
                 ia AS (SELECT k, count(*) AS n FROM
                (SELECT c_nationkey AS k FROM customer
                 INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY k)
            SELECT 'except_all' AS op, k, n FROM ex
            UNION ALL SELECT 'intersect_all' AS op, k, n FROM ia
            ORDER BY op, k"""))

  // UNPIVOT / melt (wide metrics → long rows) — the inverse surface of
  // q26's PIVOT: per-flag aggregates unpivot into (metric, value)
  // rows. Spark's Dataset.unpivot is a plan-level Expand over the tiny
  // aggregate — no extra shuffle beyond the agg's own; values cast to
  // a uniform DOUBLE on both engines (DuckDB's UNPIVOT yields the
  // common type of the named columns).
  private val q44 = GraftQuery(
    "q44_unpivot_metrics",
    (s, dir) => {
      val agg = t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum("l_quantity"), 2).cast("double").as("sum_qty"),
          round(sum("l_extendedprice"), 2).cast("double").as("sum_price"),
          round(avg("l_discount"), 4).cast("double").as("avg_disc"))
      agg.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    },
    Some("""WITH a AS (SELECT l_returnflag,
                CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
                CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_price,
                CAST(round(avg(l_discount), 4) AS DOUBLE) AS avg_disc
              FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, metric, value FROM
              (UNPIVOT a ON sum_qty, sum_price, avg_disc
               INTO NAME metric VALUE value)
            ORDER BY l_returnflag, metric"""))

  // GROUP BY ALL + arg_max/arg_min — the DuckDB-idiom surface a
  // migrating user types on day one: group keys inferred from the
  // non-aggregate select list (both engines support GROUP BY ALL
  // natively), and arg_max/arg_min keyed selection (renamed to
  // max_by/min_by by the dialect shim for handler SQL; the registry
  // exercises the Spark names directly). Ties: arg_max on a tied
  // value is engine-nondeterministic, so the ordering key is the
  // composite BIGINT cents·1e7 + orderkey (prices have 2 decimals;
  // cents ≤ 5e7, keys < 1e7 — exact integer arithmetic, unique per
  // row, identical in both engines). DuckDB's arg_max rejects STRUCT
  // ordering keys, which rules out the struct tie-break q43's family
  // uses — the integer encoding is the portable form.
  private val q45 = GraftQuery(
    "q45_group_by_all_argmax",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               max_by(o_orderkey,
                 cast(round(o_totalprice * 100) AS bigint) * 10000000 + o_orderkey)
                 AS priciest_order,
               min_by(o_orderkey,
                 cast(round(o_totalprice * 100) AS bigint) * 10000000 + o_orderkey)
                 AS cheapest_order
        FROM g_orders
        GROUP BY ALL
        ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority,
              count(*) AS n_orders,
              arg_max(o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
                AS priciest_order,
              arg_min(o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
                AS cheapest_order
            FROM orders
            GROUP BY ALL
            ORDER BY o_orderpriority"""))

  // Recursive CTE (WITH RECURSIVE) — Spark 4's recursive-union plan
  // against DuckDB's: a 12-row month-series anchor+step recursion,
  // joined against 1995 orders for a zero-filled monthly count (the
  // recursion is the series GENERATOR — q36 builds the same series
  // with sequence(); this is the portable SQL-text form). The
  // recursion depth is 12 and the recursive side is row-at-a-time
  // tiny; the orders aggregation is one keyed shuffle, pre-aggregated
  // BEFORE the join so the 12-row series joins a 12-row aggregate.
  private val q46 = GraftQuery(
    "q46_recursive_cte_months",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12),
        agg AS (
          SELECT month(o_orderdate) AS m, count(*) AS n
          FROM g_orders WHERE year(o_orderdate) = 1995
          GROUP BY month(o_orderdate))
        SELECT months.m AS month, coalesce(agg.n, 0) AS n_orders
        FROM months LEFT JOIN agg ON months.m = agg.m
        ORDER BY month""")
    },
    Some("""WITH RECURSIVE months(m) AS (
              SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12),
            agg AS (
              SELECT month(o_orderdate) AS m, count(*) AS n
              FROM orders WHERE year(o_orderdate) = 1995
              GROUP BY month(o_orderdate))
            SELECT months.m AS month, coalesce(agg.n, 0) AS n_orders
            FROM months LEFT JOIN agg ON months.m = agg.m
            ORDER BY month"""))

  // Z-order (Morton) layout values over (l_orderkey, l_partkey) —
  // operators/Layout: exact-integer range quantization to 8 bits per
  // dimension + unrolled bit-interleave, the clustering key a layout
  // rewrite range-partitions on so file min/max stats prune BOTH
  // dimensions. Everything is BIGINT arithmetic (quantize uses
  // remainder-subtracted floor division) — bit-identical across
  // engines, so the full z-value computation is oracle-checked. The
  // gate aggregates z-values into 64 coarse buckets (count + span
  // per bucket): the layout histogram a rewrite planner would size
  // files from, and a stable 64-row comparison.
  private val q47 = GraftQuery(
    "q47_zorder_layout",
    (s, dir) => {
      val z = graft.operators.Layout.zorder(
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", bits = 8)
      z.withColumn("bucket", shiftright(col("zvalue"), 10))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min("zvalue").as("z_min"), max("zvalue").as("z_max"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (SELECT min(l_orderkey) AS min_a, max(l_orderkey) AS max_a,
                min(l_partkey) AS min_b, max(l_partkey) AS max_b
              FROM lineitem),
            q AS (SELECT
                ((l_orderkey - min_a) * 255) // greatest(max_a - min_a, 1) AS za,
                ((l_partkey - min_b) * 255) // greatest(max_b - min_b, 1) AS zb
              FROM lineitem CROSS JOIN b),
            z AS (SELECT za, zb,
                CAST(list_sum(list_transform(range(8), i ->
                  ((za >> i) & 1) * (1::BIGINT << (2*i)) +
                  ((zb >> i) & 1) * (1::BIGINT << (2*i + 1))))
                  AS BIGINT) AS zvalue
              FROM q)
            SELECT zvalue >> 10 AS bucket, count(*) AS n_rows,
              min(zvalue) AS z_min, max(zvalue) AS z_max
            FROM z GROUP BY bucket ORDER BY bucket"""))

  // Ordered funnel (view → later click → later purchase): each stage
  // is a min-ts agg keyed on user_id joined to the next stage's
  // events with a strict ts inequality — the sequential-conversion
  // query (MATCH_RECOGNIZE territory) expressed as three user-keyed
  // aggregations. Scale shape: every join and agg shares ONE
  // partitioning (user_id), so the funnel is three reuses of the same
  // shuffle, not three independent ones; stage outputs only shrink.
  private val q48 = GraftQuery(
    "q48_funnel_stages",
    (s, dir) => {
      val e = t(s, dir, "events").select("user_id", "ts", "event_type")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t_click"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(ts) AS t_click FROM events e
              JOIN v USING (user_id)
              WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(ts) AS t_purchase FROM events e
              JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id)
            SELECT (SELECT count(*) FROM v) AS n_view,
                   (SELECT count(*) FROM c) AS n_click_after_view,
                   (SELECT count(*) FROM p) AS n_purchase_after_click"""))

  // Cohort retention: users cohorted by the month of their FIRST
  // event; activity counted as distinct users per (cohort, month
  // offset). The offset is exact integer month arithmetic (no date
  // subtraction FP), the distinct count is one (cohort, offset,
  // user) dedup — the standard retention matrix at any scale. The
  // first-event table is the same user-keyed agg q48 starts from.
  private val q49 = GraftQuery(
    "q49_cohort_retention",
    (s, dir) => {
      val e = t(s, dir, "events").select("user_id", "ts")
      val first = e.groupBy("user_id").agg(min("ts").as("t0"))
      e.join(first, "user_id")
        .withColumn("cohort", date_format(col("t0"), "yyyy-MM"))
        .withColumn("offset",
          (year(col("ts")) - year(col("t0"))) * 12 +
            (month(col("ts")) - month(col("t0"))))
        .filter(col("offset") <= 3)
        .groupBy("cohort", "offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort", "offset")
    },
    Some("""WITH f AS (SELECT user_id, min(ts) AS t0 FROM events
              GROUP BY user_id)
            SELECT strftime(t0, '%Y-%m') AS cohort,
              (year(ts) - year(t0)) * 12 + (month(ts) - month(t0)) AS "offset",
              count(DISTINCT e.user_id) AS n_users
            FROM events e JOIN f USING (user_id)
            WHERE (year(ts) - year(t0)) * 12 + (month(ts) - month(t0)) <= 3
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  // LISTAGG WITHIN GROUP (ANSI ordered string aggregation, new SQL
  // surface in Spark 4) vs DuckDB's string_agg(expr, sep ORDER BY …):
  // the deterministic-order contract makes an otherwise
  // merge-order-nondeterministic aggregate reproducible (q32 reaches
  // the same result via array_sort ∘ collect_list — this is the
  // SQL-text form). Dims broadcast; one 5-group agg.
  private val q50 = GraftQuery(
    "q50_listagg_within_group",
    (s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "region").createOrReplaceTempView("g_region")
      s.sql("""
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM g_nation JOIN g_region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")
    },
    Some("""SELECT r_name,
              string_agg(n_name, ',' ORDER BY n_name) AS nations,
              count(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
            ORDER BY r_name"""))

  // DuckDB ASOF JOIN *SQL syntax* through the dialect layer — the
  // reference's handler SQL can use DuckDB's ASOF grammar directly;
  // SqlDialect.rewriteAsofJoin turns it into the non-correlated
  // interval join (lead/lag ownership windows on the right side +
  // plain equi-join). Semantics companion to q17 (same pairing,
  // DataFrame operator) — here the ORACLE runs DuckDB's native ASOF
  // while Spark runs the translated text, so the gate checks the
  // rewrite end-to-end. Right side pre-aggregated to unique
  // (user, ts) — asof right-timestamp ties are nondeterministic in
  // both engines (contract documented on the rewrite).
  private val q51 = GraftQuery(
    "q51_asof_join_sql",
    (s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max("value").as("p_value"))
        .createOrReplaceTempView("g_purchases")
      ev.filter(col("event_type") =!= "purchase")
        .select("event_id", "user_id", "ts", "event_type")
        .createOrReplaceTempView("g_nonpurchase")
      s.sql(graft.engine.SqlDialect.translate("""
        SELECT l.event_id, l.user_id, l.event_type,
               strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
               strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               round(p.p_value, 2) AS purchase_value
        FROM g_nonpurchase l ASOF LEFT JOIN g_purchases p
          ON l.user_id = p.user_id AND l.ts >= p.p_ts
        ORDER BY l.event_id"""))
    },
    Some("""WITH p AS (SELECT user_id, ts AS p_ts, max(value) AS p_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts),
                 l AS (SELECT event_id, user_id, ts, event_type
                       FROM events WHERE event_type <> 'purchase')
            SELECT l.event_id, l.user_id, l.event_type,
                   strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
                   strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                   round(p.p_value, 2) AS purchase_value
            FROM l ASOF LEFT JOIN p
              ON l.user_id = p.user_id AND l.ts >= p.p_ts
            ORDER BY event_id"""))

  // Forward-fill gap repair (last observation carried forward): per
  // user, each event carries the most recent purchase value at or
  // before it — `last(_, ignoreNulls)` over a running row frame, the
  // canonical LOCF shape both engines express as `last_value …
  // IGNORE NULLS`. One shuffle on user_id; the frame is running, so
  // no per-key materialization beyond the window sort.
  private val q52 = GraftQuery(
    "q52_gap_fill_locf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("pv",
          when(col("event_type") === "purchase", col("value")))
        .withColumn("filled", last(col("pv"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("filled"), 2).as("last_purchase_value"),
          (col("pv").isNull && col("filled").isNotNull).as("was_filled"))
        .orderBy("event_id")
    },
    Some("""WITH f AS (SELECT event_id, user_id, event_type,
                 CASE WHEN event_type = 'purchase' THEN value END AS pv,
                 last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
               FROM events)
            SELECT event_id, user_id, event_type,
              round(filled, 2) AS last_purchase_value,
              (pv IS NULL AND filled IS NOT NULL) AS was_filled
            FROM f ORDER BY event_id"""))

  // DuckDB top-level PIVOT *statement* through the dialect layer —
  // the oracle runs DuckDB's native PIVOT grammar while Spark runs
  // the translated PIVOT-clause text, gating the rewrite end-to-end
  // (q26 covers the same reshape built with the DataFrame API).
  private val q53 = GraftQuery(
    "q53_pivot_sql",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders_pivot")
      s.sql(graft.engine.SqlDialect.translate(
        "PIVOT g_orders_pivot ON o_orderstatus IN ('O', 'F', 'P') " +
          "USING count(o_totalprice) GROUP BY o_orderpriority " +
          "ORDER BY o_orderpriority"))
    },
    Some("""PIVOT orders ON o_orderstatus IN ('O', 'F', 'P')
            USING count(o_totalprice) GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  // SCD2 dimension build from a change log — collapse each user's
  // event stream into type-2 validity intervals: keep only CHANGE
  // rows (value differs from the previous one), then valid_to =
  // next change's valid_from, open-ended on the last. Two windows
  // over the SAME (user_id × time) partitioning — Catalyst reuses
  // one shuffle+sort for both (no second exchange), the canonical
  // warehouse-dimension maintenance shape.
  private val q54 = GraftQuery(
    "q54_scd2_intervals",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val changes = t(s, dir, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("valid_to_ts").isNull.as("is_current"))
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
               FROM events),
             ch AS (SELECT user_id, event_type, ts, event_id FROM c
               WHERE prev IS NULL OR prev <> event_type),
             iv AS (SELECT user_id, event_type, ts,
                 lead(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS valid_to_ts
               FROM ch)
             SELECT user_id, event_type AS state,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
               valid_to_ts IS NULL AS is_current
             FROM iv ORDER BY user_id, valid_from"""))

  // DuckDB top-level UNPIVOT *statement* through the dialect layer
  // (the melt companion to q53's PIVOT): oracle runs DuckDB's native
  // UNPIVOT grammar, Spark runs the translated UNPIVOT-clause text.
  private val q55 = GraftQuery(
    "q55_unpivot_sql",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority").pivot("o_orderstatus", Seq("O", "F", "P"))
        .count().na.fill(0L)
        .createOrReplaceTempView("g_status_wide")
      s.sql(graft.engine.SqlDialect.translate(
        "UNPIVOT g_status_wide ON O, F, P INTO NAME status VALUE n " +
          "ORDER BY o_orderpriority, status"))
    },
    Some("""WITH wide0 AS (
              PIVOT orders ON o_orderstatus IN ('O', 'F', 'P')
              USING count(o_totalprice) GROUP BY o_orderpriority),
            wide AS (SELECT o_orderpriority, coalesce("O", 0) AS "O",
              coalesce("F", 0) AS "F", coalesce("P", 0) AS "P" FROM wide0)
            UNPIVOT wide ON "O", "F", "P" INTO NAME status VALUE n
            ORDER BY o_orderpriority, status"""))

  // GROUP BY CUBE — all 2ᵏ grouping combinations in one pass
  // (completes the ROLLUP q16 / GROUPING SETS q29 family). Spark
  // expands cube groupings inside a single hash aggregate; no extra
  // scans.
  private val q56 = GraftQuery(
    "q56_cube",
    (s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy("status", "priority")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS n, round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""))

  // Bucketed BIG×BIG range join — q10's BNLJ shape is only viable
  // against a dimension; here 6k lineitem points × 1.5k order
  // intervals (both fact-sized at scale) join through a manufactured
  // bucket equi-key (operators/RangeJoin) instead of a nested loop.
  // PlanShapeSpec pins the no-BNLJ shape.
  private val q57 = GraftQuery(
    "q57_bucketed_range_join",
    (s, dir) => {
      val iv = t(s, dir, "orders").select(col("o_orderkey"),
        (col("o_totalprice") - 2500).as("lo"),
        (col("o_totalprice") + 2500).as("hi"))
      val pts = t(s, dir, "lineitem").select("l_extendedprice")
      graft.operators.RangeJoin.pointInInterval(
          pts, iv, "l_extendedprice", "lo", "hi", bucketWidth = 5000.0)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_in_range"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, count(*) AS n_in_range,
              round(min(l_extendedprice), 2) AS min_price,
              round(max(l_extendedprice), 2) AS max_price
            FROM orders JOIN lineitem
              ON l_extendedprice BETWEEN o_totalprice - 2500
                                     AND o_totalprice + 2500
            GROUP BY o_orderkey ORDER BY o_orderkey"""))

  // Gap-based sessionization in plain SQL — q21 uses Spark's
  // session_window builtin; this is the engine-portable windowed
  // formulation every warehouse runs: flag rows whose gap from the
  // previous event exceeds 30 min, running-sum the flags into session
  // ordinals, aggregate per session. Two windows + one agg, all on
  // the same user_id partitioning (one data shuffle).
  private val q58 = GraftQuery(
    "q58_sessionize_sql",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("gap_s",
          col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
        .withColumn("new_sess",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(wRun))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
          date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
          round(sum("value"), 2).as("sess_value"))
        .orderBy("user_id", "sess_id")
    },
    Some("""WITH g AS (SELECT user_id, event_id, ts, value,
                 CAST(floor(epoch(ts)) AS BIGINT) -
                 CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id))) AS BIGINT) AS gap_s
               FROM events),
             f AS (SELECT user_id, event_id, ts, value,
                 CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS new_sess
               FROM g),
             sn AS (SELECT user_id, ts, value,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
               FROM f)
             SELECT user_id, sess_id, count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end,
               round(sum(value), 2) AS sess_value
             FROM sn GROUP BY user_id, sess_id
             ORDER BY user_id, sess_id"""))

  /** Flagship for SparkEntry.entry: the multi-way join+agg. */
  def flagship(s: SparkSession, dir: String): DataFrame = q03.run(s, dir)

  // Named WINDOW clause (ANSI SQL window naming) — DuckDB handler SQL
  // that defines a window once and references it from several
  // functions must run unchanged: both engines support the grammar
  // natively, so the SAME text runs on both sides (the gate pins the
  // grammar, not a rewrite). Ordering key is the exact-integer
  // cents·1e7+orderkey composite (q45's portable tie-break), so every
  // rank is deterministic. One shuffle on o_custkey shared by both
  // named windows.
  private val q59 = GraftQuery(
    "q59_named_window_clause",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT o_custkey, o_orderkey,
               cast(round(o_totalprice * 100) AS bigint) AS cents,
               rank() OVER w AS price_rank,
               lag(o_orderkey) OVER w AS prev_order,
               count(*) OVER w2 AS n_orders
        FROM g_orders
        WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY
                cast(round(o_totalprice * 100) AS bigint) * 10000000
                  + o_orderkey DESC),
               w2 AS (PARTITION BY o_custkey)
        ORDER BY o_custkey, price_rank""")
    },
    Some("""SELECT o_custkey, o_orderkey,
              cast(round(o_totalprice * 100) AS BIGINT) AS cents,
              rank() OVER w AS price_rank,
              lag(o_orderkey) OVER w AS prev_order,
              CAST(count(*) OVER w2 AS BIGINT) AS n_orders
            FROM orders
            WHERE o_custkey < 50
            WINDOW w AS (PARTITION BY o_custkey ORDER BY
                    cast(round(o_totalprice * 100) AS BIGINT) * 10000000
                      + o_orderkey DESC),
                   w2 AS (PARTITION BY o_custkey)
            ORDER BY o_custkey, price_rank"""))

  // VALUES inline table constructor — the idiomatic way handler SQL
  // ships a small lookup (priority → tier here) WITHOUT an external
  // file or ATTACH: both engines parse `(VALUES …) AS v(cols)` in
  // FROM natively and the planner treats it as a broadcast dim (a
  // LocalRelation — no scan, no shuffle on the dim side). Exact-cents
  // BIGINT revenue keeps the agg engine-portable.
  private val q60 = GraftQuery(
    "q60_values_inline_dim",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT v.tier, count(*) AS n_orders,
               sum(cast(round(o_totalprice * 100) AS bigint)) AS cents
        FROM g_orders o
        JOIN (VALUES ('1-URGENT', 'high'), ('2-HIGH', 'high'),
                     ('3-MEDIUM', 'mid'), ('4-NOT SPECIFIED', 'low'),
                     ('5-LOW', 'low')) AS v(pri, tier)
          ON o.o_orderpriority = v.pri
        GROUP BY v.tier
        ORDER BY v.tier""")
    },
    Some("""SELECT v.tier, CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS cents
            FROM orders o
            JOIN (VALUES ('1-URGENT', 'high'), ('2-HIGH', 'high'),
                         ('3-MEDIUM', 'mid'), ('4-NOT SPECIFIED', 'low'),
                         ('5-LOW', 'low')) AS v(pri, tier)
              ON o.o_orderpriority = v.pri
            GROUP BY v.tier
            ORDER BY v.tier"""))

  // TRY_CAST lenient coercion — the dirty-data ingestion idiom (both
  // engines null out unparseable values instead of failing the batch,
  // the contract messy crawl/event data needs). The gate derives a
  // deterministic mixed-validity string column in-plan and checks
  // parse-failure counting, null-safe aggregation, and invalid-date
  // rejection agree engine-for-engine.
  private val q61 = GraftQuery(
    "q61_try_cast_lenient",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT count(*) AS n_rows,
               count(try_cast(sv AS int)) AS n_ok,
               sum(coalesce(try_cast(sv AS int), 0)) AS total,
               count(try_cast(dv AS date)) AS n_dates
        FROM (SELECT CASE WHEN o_orderkey % 3 = 0
                       THEN concat('#', cast(o_orderkey AS string))
                       ELSE cast(o_orderkey AS string) END AS sv,
                     CASE WHEN o_orderkey % 2 = 0
                       THEN '2024-13-40' ELSE '2024-01-15' END AS dv
              FROM g_orders)""")
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(try_cast(sv AS INT)) AS BIGINT) AS n_ok,
              CAST(sum(coalesce(try_cast(sv AS INT), 0)) AS BIGINT) AS total,
              CAST(count(try_cast(dv AS DATE)) AS BIGINT) AS n_dates
            FROM (SELECT CASE WHEN o_orderkey % 3 = 0
                       THEN '#' || CAST(o_orderkey AS VARCHAR)
                       ELSE CAST(o_orderkey AS VARCHAR) END AS sv,
                     CASE WHEN o_orderkey % 2 = 0
                       THEN '2024-13-40' ELSE '2024-01-15' END AS dv
              FROM orders)"""))

  // Per-key top-k via the native bounded-heap aggregate
  // (graft.functions.TopKRows) — q15's window formulation shuffles
  // EVERY row to its key partition and sorts it; this one partially
  // aggregates, so each map task ships at most k rows per key and no
  // sort happens anywhere (the per-key generalization of q05's
  // TakeOrderedAndProject). The composite order (balance cents DESC,
  // custkey ASC) rides as separate leading Long fields of the struct
  // — top_k_rows compares them lexicographically, so the order stays
  // exact at any custkey magnitude (the packed cents·10^7 − custkey
  // form silently flips ranks once custkey outgrows the spacing,
  // which happens at TPC-H sf ≥ 100).
  private val q62 = GraftQuery(
    "q62_topk_per_key_agg",
    (s, dir) => {
      import graft.functions.HashFunctions.top_k_rows
      val cust = t(s, dir, "customer")
      val keyed = cust.join(
          broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          struct(
            round(col("c_acctbal") * 100).cast("long").as("ord"),
            (-col("c_custkey").cast("long")).as("ord2"),
            col("c_custkey").as("custkey"),
            round(col("c_acctbal"), 2).cast("double").as("acctbal")).as("s"))
      keyed.groupBy("n_name")
        .agg(top_k_rows(col("s"), 3).as("top"))
        .select(col("n_name"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("n_name"), (col("pos") + 1).as("rank"),
          col("r.custkey").as("custkey"), col("r.acctbal").as("acctbal"))
        .orderBy("n_name", "rank")
    },
    Some("""SELECT n_name, CAST(rnk AS INT) AS rank, custkey, acctbal FROM (
              SELECT n.n_name, c.c_custkey AS custkey,
                round(c.c_acctbal, 2)::DOUBLE AS acctbal,
                row_number() OVER (PARTITION BY n.n_name
                  ORDER BY round(c.c_acctbal * 100) DESC, c.c_custkey) AS rnk
              FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
            WHERE rnk <= 3 ORDER BY n_name, rank"""))

  // Correlated LATERAL subquery (per-customer top-2 orders) — the
  // ANSI "for each row, run this parameterized subquery" grammar both
  // engines parse natively, so the SAME text runs on both sides.
  // Spark DECORRELATES the apparent per-row re-scan: the correlated
  // LIMIT-under-LATERAL plans as one join + per-key window (no
  // nested-loop re-execution), which is why the construct survives
  // 100 TB — the naive reading (re-run the subquery per outer row)
  // would not. Exact-cents ordering keys keep every rank portable.
  private val q63 = GraftQuery(
    "q63_lateral_topn_join",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders63")
      s.sql("""
        SELECT c_custkey, o_orderkey, cents
        FROM g_customer c, LATERAL (
          SELECT o_orderkey,
                 cast(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM g_orders63 WHERE o_custkey = c.c_custkey
          ORDER BY cents DESC, o_orderkey LIMIT 2) t
        WHERE c_custkey < 100
        ORDER BY c_custkey, cents DESC, o_orderkey""")
    },
    Some("""SELECT c_custkey, o_orderkey, cents
            FROM customer c, LATERAL (
              SELECT o_orderkey,
                     cast(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders WHERE o_custkey = c.c_custkey
              ORDER BY cents DESC, o_orderkey LIMIT 2) t
            WHERE c_custkey < 100
            ORDER BY c_custkey, cents DESC, o_orderkey"""))

  // GROUPING()/GROUPING_ID() disambiguation under ROLLUP — the only
  // portable way to tell "NULL because subtotal row" from "NULL in
  // the data"; both engines share the grammar (DuckDB's GROUPING_ID
  // is Spark's bitmask form), so the same text runs unchanged.
  // Exact-cents revenue keeps sums integer; one expand + hash agg,
  // no extra pass per grouping set.
  private val q64 = GraftQuery(
    "q64_grouping_id_rollup",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem64")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n_rows,
               sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM g_lineitem64
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
              CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
              CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              count(*) AS n_rows,
              CAST(sum(cast(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS cents
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY gid, l_returnflag, l_linestatus"""))

  // IGNORE NULLS window grammar, run THROUGH the dialect layer: the
  // Spark side executes the DuckDB text via SqlDialect.translate
  // (which transposes DuckDB's in-paren modifier to Spark's postfix
  // form) — the gate pins the translation on a live query, not just
  // the spec's string equality. last-observation-carried-forward of
  // the most recent high-value order per customer; the carried key is
  // coalesced to -1 so no engine-specific NULL stringification
  // reaches the driver comparator.
  private val q65 = GraftQuery(
    "q65_ignore_nulls_window",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders65")
      s.sql(graft.engine.SqlDialect.translate("""
        SELECT o_custkey, o_orderkey,
               coalesce(last_value(CASE WHEN o_totalprice > 150000
                   THEN o_orderkey END IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 -1) AS last_big_order
        FROM g_orders65 WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderkey"""))
    },
    Some("""SELECT o_custkey, o_orderkey,
              coalesce(last_value(CASE WHEN o_totalprice > 150000
                  THEN o_orderkey END IGNORE NULLS)
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                -1) AS last_big_order
            FROM orders WHERE o_custkey < 100
            ORDER BY o_custkey, o_orderkey"""))

  // Null-safe equality join (`IS NOT DISTINCT FROM`) — the ANSI
  // grammar both engines share for joining on NULLABLE keys (a plain
  // equi-join silently drops every NULL row). The CASE NULLs out one
  // priority class, so the pair set includes null–null matches that
  // exist ONLY if null-safe semantics actually hold. Spark plans <=>
  // as a hash-join key (EqualNullSafe), not a nested loop.
  private val q66 = GraftQuery(
    "q66_null_safe_join",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders66")
      s.sql("""
        WITH o AS (SELECT o_orderkey,
                     CASE WHEN o_orderpriority LIKE '3%' THEN NULL
                       ELSE o_orderpriority END AS pri
                   FROM g_orders66 WHERE o_orderkey < 200)
        SELECT a.o_orderkey AS k1, b.o_orderkey AS k2
        FROM o a JOIN o b
          ON a.pri IS NOT DISTINCT FROM b.pri AND a.o_orderkey < b.o_orderkey
        ORDER BY k1, k2""")
    },
    Some("""WITH o AS (SELECT o_orderkey,
                  CASE WHEN o_orderpriority LIKE '3%' THEN NULL
                    ELSE o_orderpriority END AS pri
                FROM orders WHERE o_orderkey < 200)
            SELECT a.o_orderkey AS k1, b.o_orderkey AS k2
            FROM o a JOIN o b
              ON a.pri IS NOT DISTINCT FROM b.pri AND a.o_orderkey < b.o_orderkey
            ORDER BY k1, k2"""))

  // Point-in-time lookup over SCD2 intervals — "what state was each
  // user in at instant T?", the bitemporal query every warehouse
  // dimension exists to answer. Composes q54's interval build with a
  // 4-instant probe VALUES dim. The probe side is a TINY broadcast
  // literal, so containment evaluates map-side against each interval
  // (cost = |probes| predicate evaluations per row, no shuffle
  // beyond q54's own window); a large probe side without an equi-key
  // would instead go through q57's bucketed range join. Open
  // intervals (valid_to NULL) match every later instant.
  private val q67 = GraftQuery(
    "q67_scd2_point_in_time",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val iv = t(s, dir, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      val probes = s.sql("""SELECT to_timestamp(p) AS probe_ts FROM (VALUES
        ('2024-01-08 00:00:00'), ('2024-01-15 00:00:00'),
        ('2024-01-22 00:00:00'), ('2024-01-29 00:00:00')) v(p)""")
      iv.join(broadcast(probes),
          col("ts") <= col("probe_ts") &&
            (col("valid_to_ts").isNull || col("valid_to_ts") > col("probe_ts")))
        .filter(col("user_id") < 200)
        .select(col("user_id"),
          date_format(col("probe_ts"), "yyyy-MM-dd HH:mm:ss").as("probe"),
          col("event_type").as("state_at_probe"))
        .orderBy("user_id", "probe")
    },
    Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
               FROM events),
             ch AS (SELECT user_id, event_type, ts, event_id FROM c
               WHERE prev IS NULL OR prev <> event_type),
             iv AS (SELECT user_id, event_type, ts,
                 lead(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS valid_to_ts
               FROM ch),
             p AS (SELECT CAST(v.p AS TIMESTAMP) AS probe_ts FROM (VALUES
               ('2024-01-08 00:00:00'), ('2024-01-15 00:00:00'),
               ('2024-01-22 00:00:00'), ('2024-01-29 00:00:00')) v(p))
             SELECT user_id,
               strftime(probe_ts, '%Y-%m-%d %H:%M:%S') AS probe,
               event_type AS state_at_probe
             FROM iv JOIN p ON ts <= probe_ts
               AND (valid_to_ts IS NULL OR valid_to_ts > probe_ts)
             WHERE user_id < 200
             ORDER BY user_id, probe"""))

  // Log₂-histogram quantile sketch over event values — bounded-state
  // percentiles: ≤ 64 counters per key instead of a per-key sort,
  // mergeable by addition, and the SAME aggregation runs under a
  // streaming groupBy(window, key, bin).count with bounded state
  // (SketchSpec proves streaming ≡ batch). Binning is the STRING
  // length of the binary representation — exact in any engine, where
  // a float log2() (Spark: log(x)/log 2) can land on either side of
  // an integer at exact powers of two. The quantile walk compares
  // exact integer products, so the selected bin is bit-reproducible.
  private val q68 = GraftQuery(
    "q68_log_histogram_quantiles",
    (s, dir) => {
      // clamp to ≥1: bin 64 (negative two's complement) would hit
      // engine-divergent shift semantics (Spark wraps the shift count
      // mod 64, DuckDB saturates) in the 2^bin−1 upper bound
      val c = t(s, dir, "events").select(col("event_type"),
        greatest(round(col("value") * 100).cast("long"), lit(1L)).as("cents"))
      graft.operators.Sketch.logHistQuantiles(
          c, Seq("event_type"), "cents", qs = Seq(50, 95))
        .orderBy("event_type")
    },
    Some("""WITH c AS (SELECT event_type,
                 greatest(CAST(round(value * 100) AS BIGINT), 1) AS cents
               FROM events),
             h AS (SELECT event_type, length(bin(cents)) AS bin,
                 count(*) AS cnt FROM c GROUP BY 1, 2),
             w AS (SELECT event_type, bin, cnt,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cnt) OVER (PARTITION BY event_type) AS total FROM h),
             a AS (SELECT event_type,
                 min(CASE WHEN cum * 100 >= total * 50 THEN bin END) AS p50_bin,
                 min(CASE WHEN cum * 100 >= total * 95 THEN bin END) AS p95_bin,
                 CAST(max(total) AS BIGINT) AS n
               FROM w GROUP BY 1)
             SELECT event_type, p50_bin, p95_bin, n,
               (1::BIGINT << p50_bin) - 1 AS p50_hi_cents,
               (1::BIGINT << p95_bin) - 1 AS p95_hi_cents
             FROM a ORDER BY event_type"""))

  // Interval×interval overlap join, bucketed — the missing Spark
  // range-join shape q10/q57 don't cover (both sides are INTERVALS).
  // A bare overlap predicate plans as BroadcastNestedLoopJoin
  // (O(|L|·|R|)); RangeJoin.intervalOverlap manufactures the bucket
  // equi-key and emits each pair exactly once in the bucket holding
  // max(lo, lo') — no post-join distinct shuffle. One month of order
  // fulfilment windows × one month of lineitem ship→receipt windows,
  // pair counts per priority class.
  private val q69 = GraftQuery(
    "q69_interval_overlap_join",
    (s, dir) => {
      val epoch = to_date(lit("1970-01-01"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-03-01") &&
          col("o_orderdate") < lit("1995-04-01"))
        .select(col("o_orderpriority"),
          datediff(col("o_orderdate"), epoch).cast("double").as("o_lo"),
          (datediff(col("o_orderdate"), epoch) + 7).cast("double")
            .as("o_hi"))
      // delivery window length derived from quantity (the fixture has
      // no receipt date): [ship, ship + qty % 14] days
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-03-01") &&
          col("l_shipdate") < lit("1995-04-01"))
        .select(datediff(col("l_shipdate"), epoch).cast("double").as("l_lo"),
          (datediff(col("l_shipdate"), epoch) +
            col("l_quantity").cast("int") % 14).cast("double").as("l_hi"))
      // bucketWidth ≈ the 7-day order window: ≤2 bucket copies/side
      graft.operators.RangeJoin.intervalOverlap(
          o, l, "o_lo", "o_hi", "l_lo", "l_hi", bucketWidth = 8.0)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH o AS (SELECT o_orderpriority,
                 datediff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) AS o_lo,
                 datediff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) + 7 AS o_hi
               FROM orders
               WHERE o_orderdate >= DATE '1995-03-01'
                 AND o_orderdate < DATE '1995-04-01'),
             l AS (SELECT
                 datediff('day', DATE '1970-01-01',
                   CAST(l_shipdate AS DATE)) AS l_lo,
                 datediff('day', DATE '1970-01-01',
                   CAST(l_shipdate AS DATE))
                   + CAST(l_quantity AS INT) % 14 AS l_hi
               FROM lineitem
               WHERE l_shipdate >= DATE '1995-03-01'
                 AND l_shipdate < DATE '1995-04-01')
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_pairs
            FROM o JOIN l ON o_lo <= l_hi AND l_lo <= o_hi
            GROUP BY 1 ORDER BY 1"""))

  // GROUPS-mode window frame (ANSI/DuckDB; Spark plans only
  // ROWS/RANGE) — trailing-3-month revenue attached to every order
  // row, where months are PEER GROUPS of the ORDER BY key.
  // WindowFrames.groupsSum re-expresses it as a group-level ROWS
  // frame + broadcast join back; sums run in exact integer cents so
  // the cross-engine hash is order-free.
  private val q70 = GraftQuery(
    "q70_groups_window_frame",
    (s, dir) => {
      val base = t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      graft.operators.WindowFrames.groupsSum(
          base, Seq("o_orderpriority"), "mon", "cents",
          nPreceding = 2, out = "gsum")
        .select(col("o_orderkey"), col("o_orderpriority"), col("mon"),
          col("gsum"))
        .orderBy("o_orderkey")
    },
    // DuckDB (1.x) does not implement GROUPS mode either ("not
    // implemented yet"), so the oracle is the frame's relational
    // DEFINITION — per-group sums under a group-level ROWS frame,
    // joined back to member rows — i.e. exactly what the ANSI GROUPS
    // clause specifies.
    Some("""WITH base AS (SELECT o_orderkey, o_orderpriority,
                 strftime(o_orderdate, '%Y-%m') AS mon,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders WHERE o_custkey < 100),
             g AS (SELECT o_orderpriority, mon,
                 CAST(sum(cents) AS BIGINT) AS gsum0
               FROM base GROUP BY 1, 2),
             gw AS (SELECT o_orderpriority, mon,
                 CAST(sum(gsum0) OVER (PARTITION BY o_orderpriority
                   ORDER BY mon
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS gsum
               FROM g)
            SELECT b.o_orderkey, b.o_orderpriority, b.mon, gw.gsum
            FROM base b JOIN gw USING (o_orderpriority, mon)
            ORDER BY b.o_orderkey"""))

  // Window-frame EXCLUDE clauses (ANSI/DuckDB; Spark has none):
  // EXCLUDE CURRENT ROW over the whole partition ("everyone else's
  // revenue in my class") and EXCLUDE GROUP over a running RANGE
  // frame ("revenue of strictly-earlier days"). Both re-expressed as
  // inclusive-frame arithmetic (WindowFrames) — map-side, no extra
  // shuffle. NULL (empty excluded frame) → -1 sentinel on both
  // engines so no NULL stringification reaches the comparator.
  private val q71 = GraftQuery(
    "q71_window_exclude",
    (s, dir) => {
      val epoch = to_date(lit("1970-01-01"))
      val base = t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_orderpriority"),
          datediff(col("o_orderdate"), epoch).cast("long").as("day"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val a = graft.operators.WindowFrames.sumExcludeCurrentRow(
        base, Seq("o_orderpriority"), "cents", "others_cents")
      val b = graft.operators.WindowFrames.runningSumExcludeGroup(
        a, Seq("o_orderpriority"), "day", "cents", "earlier_cents")
      b.select(col("o_orderkey"), col("o_orderpriority"),
          coalesce(col("others_cents"), lit(-1L)).as("others_cents"),
          coalesce(col("earlier_cents"), lit(-1L)).as("earlier_cents"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority,
              coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_orderpriority
                      ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING
                      EXCLUDE CURRENT ROW) AS BIGINT), -1)
                AS others_cents,
              coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_orderpriority
                      ORDER BY datediff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE))
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      EXCLUDE GROUP) AS BIGINT), -1)
                AS earlier_cents
            FROM orders WHERE o_custkey < 100
            ORDER BY o_orderkey"""))

  // Persisted-sketch incremental rollup (DataSketches HLL): per-day
  // distinct-customer sketches union into months WITHOUT rescanning
  // orders — the mergeable-summary discipline that answers any
  // trailing window at 100 TB from KB-sized persisted rows. The
  // month's exact distinct count is fully oracle-checked; the merged
  // estimate is asserted into the HLL error envelope (±5%, lgK=14 ⇒
  // ~0.8% RSE — and at these group sizes the sketch is still in its
  // exact sparse mode) as a gate-fails-if-false boolean, since DuckDB
  // cannot replay DataSketches binaries.
  private val q72 = GraftQuery(
    "q72_hll_sketch_rollup",
    (s, dir) => {
      import graft.operators.Sketch
      val orders = t(s, dir, "orders")
      val daily = Sketch.hllDailySketches(orders, col("o_orderdate"),
        date_format(col("o_orderdate"), "yyyy-MM"), col("o_custkey"))
      val exact = orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("rollup"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      Sketch.hllRollupEstimate(daily).join(exact, "rollup")
        .select(col("rollup").as("month"), col("n_exact"),
          (abs(col("est_distinct").cast("double") - col("n_exact")) <=
            col("n_exact") * lit(0.05)).as("within_5pct"))
        .orderBy("month")
    },
    Some("""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
              count(DISTINCT o_custkey) AS n_exact, TRUE AS within_5pct
            FROM orders GROUP BY month ORDER BY month"""))

  // k-hop reachability over the customer↔supplier co-purchase graph
  // (nodes: custkey·2 / suppkey·2+1; undirected) — semi-naive BFS as
  // a driver loop of frontier-only joins with per-hop lineage
  // truncation (operators/Graph), the general recursive-graph-query
  // execution shape. The oracle replays it as a DuckDB WITH RECURSIVE
  // closure — same answer, but the recursive CTE re-derives the full
  // reached set each round, which is exactly what the frontier/delta
  // discipline avoids at scale.
  private val q73 = GraftQuery(
    "q73_khop_reachability",
    (s, dir) => {
      val e = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val undirected = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "customer").filter(col("c_custkey") < 3)
        .select((col("c_custkey") * 2).as("node"))
      graft.operators.Graph.khopDistances(
          undirected, "src", "dst", seeds, "node", maxHops = 3)
        .select(col("node"), col("hops").cast("int").as("hops"))
        .orderBy("node")
    },
    Some("""WITH RECURSIVE
            e AS (SELECT DISTINCT o.o_custkey * 2 AS src,
                    l.l_suppkey * 2 + 1 AS dst
                  FROM orders o JOIN lineitem l
                    ON l.l_orderkey = o.o_orderkey),
            eb AS (SELECT src, dst FROM e
                   UNION ALL SELECT dst, src FROM e),
            r(node, d) AS (
              SELECT c_custkey * 2, 0 FROM customer WHERE c_custkey < 3
              UNION
              SELECT eb.dst, r.d + 1 FROM r JOIN eb ON eb.src = r.node
              WHERE r.d < 3)
            SELECT node, CAST(min(d) AS INT) AS hops
            FROM r GROUP BY node ORDER BY node"""))

  // DISTINCT window aggregate (`count(DISTINCT x) OVER …`) — DuckDB
  // grammar Spark rejects outright; the dialect shim transposes it to
  // `size(collect_set(x) OVER …)`, whose per-frame set state is the
  // construct's own cost on any engine. Both the whole-partition and
  // the running-frame form are exercised; the oracle runs the
  // IDENTICAL untranslated text natively in DuckDB.
  private val q74 = GraftQuery(
    "q74_distinct_window_count",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders74")
      s.sql(graft.engine.SqlDialect.translate(distinctOverSql
        .replace("FROM orders", "FROM g_orders74")))
    },
    Some(distinctOverSql))

  private lazy val distinctOverSql =
    """SELECT o_custkey, o_orderkey,
         CAST(count(DISTINCT o_orderpriority) OVER
           (PARTITION BY o_custkey) AS BIGINT) AS n_pri_all,
         CAST(count(DISTINCT o_orderpriority) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_pri_sofar
       FROM orders WHERE o_custkey < 200
       ORDER BY o_custkey, o_orderkey"""

  // CDC apply: an I/U/D change feed (synthesized from orders — op by
  // orderkey mod, payload from the order, orderkey as the total
  // order) replayed onto the customer snapshot. Latest-change-wins,
  // deletes drop keys, untouched keys pass through — the lakehouse
  // "apply changes into" op. The window shuffles only the DELTA; the
  // snapshot sees one anti-join + union (bucket the snapshot on the
  // key and the big side stays exchange-free).
  private val q75 = GraftQuery(
    "q75_cdc_apply",
    (s, dir) => {
      val snapshot = t(s, dir, "customer").select(
        col("c_custkey").as("custkey"), col("c_name").as("name"),
        round(col("c_acctbal"), 2).cast("double").as("bal"))
      val changes = t(s, dir, "orders").filter(col("o_orderkey") % 10 < 3)
        .select(col("o_custkey").as("custkey"),
          element_at(typedLit(Seq("U", "I", "D")),
            (col("o_orderkey") % 3).cast("int") + 1).as("op"),
          col("o_orderkey").as("seq"),
          concat(lit("upd_"), col("o_orderkey")).as("name"),
          round(col("o_totalprice"), 2).cast("double").as("bal"))
      graft.operators.Cdc.applyChanges(snapshot, changes,
          "custkey", "op", Seq("seq"))
        .orderBy("custkey")
    },
    Some("""WITH ch AS (SELECT o_custkey AS custkey,
                CASE o_orderkey % 3 WHEN 0 THEN 'U' WHEN 1 THEN 'I'
                  ELSE 'D' END AS op,
                o_orderkey AS seq,
                'upd_' || CAST(o_orderkey AS VARCHAR) AS name,
                round(o_totalprice, 2)::DOUBLE AS bal
              FROM orders WHERE o_orderkey % 10 < 3),
            latest AS (SELECT * FROM (SELECT *, row_number()
                OVER (PARTITION BY custkey ORDER BY seq DESC) AS rn
              FROM ch) WHERE rn = 1)
            SELECT custkey, name, bal FROM (
              SELECT c.c_custkey AS custkey, c.c_name AS name,
                round(c.c_acctbal, 2)::DOUBLE AS bal
              FROM customer c LEFT JOIN latest l ON c.c_custkey = l.custkey
              WHERE l.custkey IS NULL
              UNION ALL
              SELECT custkey, name, bal FROM latest WHERE op <> 'D')
            ORDER BY custkey"""))

  // Exponentially-weighted moving average per key — the ordered-fold
  // time-series smoother (alerting baselines, trend dashboards).
  // Implementation: ONE grouped aggregation collects each key's
  // (day, cents) series, sort_array pins the fold order, and
  // `aggregate` runs the α-recurrence — no per-row window state, one
  // shuffle of pre-aggregated daily rows. α = 1/4 is exactly
  // representable, cents are exact integers, and the fold order is
  // total, so the double recurrence is bit-identical cross-engine.
  // Series length per key is bounded (days), so the collected array
  // is small by construction — this is NOT a collect of raw rows.
  private val q76 = GraftQuery(
    "q76_ewma_daily",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      daily.groupBy("pri")
        .agg(sort_array(collect_list(struct(col("day"), col("cents"))))
          .as("series"))
        .select(col("pri"), size(col("series")).as("n_days"),
          round(aggregate(col("series"), lit(-1.0),
            (acc, e) => when(acc === -1.0, e("cents").cast("double"))
              .otherwise(e("cents").cast("double") * 0.25 + acc * 0.75)), 4)
            .as("ewma_cents"))
        .orderBy("pri")
    },
    Some("""WITH d AS (SELECT o_orderpriority AS pri,
                CAST(o_orderdate AS DATE) AS day,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY pri, day),
            srt AS (SELECT pri, list(cents ORDER BY day) AS series
              FROM d GROUP BY pri)
            SELECT pri, CAST(len(series) AS INT) AS n_days,
              round(list_reduce(list_transform(series,
                  x -> CAST(x AS DOUBLE)),
                (acc, x) -> x * 0.25 + acc * 0.75), 4) AS ewma_cents
            FROM srt ORDER BY pri"""))

  // Incremental view maintenance: the orders⋈customer view is built
  // as base-join ∪ the three delta terms (ΔL⋈R, L⋈ΔR, ΔL⋈ΔR — deltas
  // broadcast, bases scanned once, base×base NEVER re-joined) and
  // must equal the oracle's direct join of the full tables. The
  // identity is what keeps a 100 TB materialized join current at
  // ingest cost ∝ |Δ|, not |base|.
  private val q77 = GraftQuery(
    "q77_ivm_join_delta",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey").as("orderkey"), col("o_custkey").as("custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val c = t(s, dir, "customer").select(
        col("c_custkey").as("custkey"), col("c_name").as("name"))
      val (lBase, lDelta) =
        (o.filter(col("orderkey") % 5 =!= 4), o.filter(col("orderkey") % 5 === 4))
      val (rBase, rDelta) =
        (c.filter(col("custkey") % 7 =!= 6), c.filter(col("custkey") % 7 === 6))
      graft.operators.Ivm.applyDelta(
          lBase.join(rBase, Seq("custkey")),
          graft.operators.Ivm.joinDelta(
            lBase, lDelta, rBase, rDelta, Seq("custkey")))
        .select(col("orderkey"), col("custkey"), col("name"), col("cents"))
        .orderBy("orderkey")
    },
    Some("""SELECT o_orderkey AS orderkey, o_custkey AS custkey,
              c_name AS name,
              CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY orderkey"""))

  // Aggregate IVM with RETRACTIONS: the revenue-per-priority view is
  // maintained by merging a ±1-multiplicity change feed's aggregate
  // into the base aggregate — deletes subtract, fully-retracted
  // groups vanish, and the base table is never re-aggregated. The
  // oracle aggregates the FINAL multiset directly (base − deletes +
  // inserts); equality proves the retraction algebra.
  private val q78 = GraftQuery(
    "q78_ivm_agg_retract",
    (s, dir) => {
      import graft.operators.Ivm
      val o = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val base = o.filter(col("k") % 5 =!= 4)
      val inserts = o.filter(col("k") % 5 === 4).withColumn("mult", lit(1L))
      val deletes = base.filter(col("k") % 7 === 0).withColumn("mult", lit(-1L))
      val view = base.groupBy("pri")
        .agg(count(lit(1)).as("n"), sum("cents").as("total"))
      Ivm.applyCountSumDelta(view,
          Ivm.countSumDelta(inserts.unionByName(deletes),
            Seq("pri"), "mult", "cents"),
          Seq("pri"))
        .orderBy("pri")
    },
    Some("""SELECT o_orderpriority AS pri,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS total
            FROM orders
            WHERE NOT (o_orderkey % 5 <> 4 AND o_orderkey % 7 = 0)
            GROUP BY pri ORDER BY pri"""))

  // Referential-integrity audit over the declared FK edges — the
  // data-quality constraint scan a lakehouse runs per ingest: orphan
  // counts via anti-joins (each one shuffle on the FK, or
  // broadcast when the parent key set is small), child/parent
  // cardinality per edge. Zero orphans on consistent fixtures is the
  // point: the gate FAILS if regeneration ever breaks integrity.
  private val q79 = GraftQuery(
    "q79_fk_integrity_audit",
    (s, dir) => {
      def audit(edge: String, child: org.apache.spark.sql.DataFrame,
          fk: String, parent: org.apache.spark.sql.DataFrame, pk: String) = {
        val orphans = child.select(col(fk).as("__k"))
          .join(parent.select(col(pk).as("__k")), Seq("__k"), "left_anti")
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(edge).as("edge"), col("n_child"), col("n_orphans"))
      }
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      audit("lineitem.orderkey->orders", l, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("lineitem.suppkey->supplier", l, "l_suppkey",
          su, "s_suppkey"))
        .unionByName(audit("orders.custkey->customer", o, "o_custkey",
          c, "c_custkey"))
        .unionByName(audit("customer.nationkey->nation", c, "c_nationkey",
          n, "n_nationkey"))
        .orderBy("edge")
    },
    Some("""SELECT * FROM (
              SELECT 'lineitem.orderkey->orders' AS edge,
                (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
                (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
              UNION ALL
              SELECT 'lineitem.suppkey->supplier',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM supplier s
                    WHERE s.s_suppkey = l.l_suppkey))
              UNION ALL
              SELECT 'orders.custkey->customer',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey))
              UNION ALL
              SELECT 'customer.nationkey->nation',
                (SELECT count(*) FROM customer),
                (SELECT count(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM nation n
                    WHERE n.n_nationkey = c.c_nationkey)))
            ORDER BY edge"""))

  // Incremental sessionization: a PERSISTED session table (built from
  // two-thirds of the events) absorbs the remaining third as a
  // late/backfill batch — new events extend sessions, bridge formerly
  // separate sessions, or stand alone, all through one islands merge
  // over session INTERVALS (one row per session, not per event).
  // Gap-sessionization is an associative interval closure, so the
  // result must equal the oracle's direct pass over the full log —
  // which is exactly what the gate checks. Aggregates merge in exact
  // integer cents (no float re-association).
  private val q80 = GraftQuery(
    "q80_incremental_sessionize",
    (s, dir) => {
      import graft.operators.IncrementalSessions
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
      val existing = IncrementalSessions.sessionsOf(
        ev.filter(col("event_id") % 3 =!= 0), "user_id", "ts", "cents", 1800L)
      IncrementalSessions.incremental(existing,
          ev.filter(col("event_id") % 3 === 0), "user_id", "ts", "cents",
          1800L)
        .select(col("key").as("user_id"), col("sess_id"), col("n_events"),
          date_format(col("start_s").cast("timestamp"),
            "yyyy-MM-dd HH:mm:ss").as("sess_start"),
          date_format(col("end_s").cast("timestamp"),
            "yyyy-MM-dd HH:mm:ss").as("sess_end"),
          col("cents").as("sess_cents"))
        .orderBy("user_id", "sess_id")
    },
    Some("""WITH g AS (SELECT user_id, event_id, ts,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CAST(floor(epoch(ts)) AS BIGINT) -
                 CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id))) AS BIGINT) AS gap_s
               FROM events),
             f AS (SELECT user_id, event_id, ts, cents,
                 CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END
                   AS new_sess
               FROM g),
             sn AS (SELECT user_id, ts, cents,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS sess_id
               FROM f)
             SELECT user_id, sess_id, count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end,
               CAST(sum(cents) AS BIGINT) AS sess_cents
             FROM sn GROUP BY user_id, sess_id
             ORDER BY user_id, sess_id"""))

  // Marketing-touch attribution: every purchase credits its
  // FIRST-touch and LAST-touch preceding click/view (inclusive at the
  // same instant, event_id total order) — revenue by channel under
  // both models from ONE tagged-union window pass (the q17 as-of
  // pattern carrying first AND last simultaneously; no join, no
  // per-conversion re-scan). Touchless purchases report as 'none'.
  private val q81 = GraftQuery(
    "q81_touch_attribution",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
        col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id"), col("event_type").as("tt"),
          lit(null).cast("long").as("cents"))
      val convs = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id"), lit(null).cast("string").as("tt"), col("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      touches.unionByName(convs)
        .withColumn("ft", first(col("tt"), ignoreNulls = true).over(w))
        .withColumn("lt", last(col("tt"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(explode(array(
          struct(lit("first").as("model"),
            coalesce(col("ft"), lit("none")).as("channel")),
          struct(lit("last").as("model"),
            coalesce(col("lt"), lit("none")).as("channel")))).as("m"),
          col("cents"))
        .groupBy(col("m.model").as("model"), col("m.channel").as("channel"))
        .agg(count(lit(1)).as("n_conv"), sum("cents").as("cents"))
        .orderBy("model", "channel")
    },
    Some("""WITH ev AS (SELECT user_id, ts, event_type, event_id,
                CAST(round(value * 100) AS BIGINT) AS cents FROM events),
            u AS (SELECT user_id, ts, 0 AS side, event_id,
                event_type AS tt, NULL::BIGINT AS cents FROM ev
                WHERE event_type IN ('click', 'view')
              UNION ALL
              SELECT user_id, ts, 1, event_id, NULL, cents FROM ev
                WHERE event_type = 'purchase'),
            wn AS (SELECT side, cents,
                first_value(CASE WHEN side = 0 THEN tt END IGNORE NULLS)
                  OVER w AS ft,
                last_value(CASE WHEN side = 0 THEN tt END IGNORE NULLS)
                  OVER w AS lt
              FROM u
              WINDOW w AS (PARTITION BY user_id
                ORDER BY ts, side, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            p AS (SELECT coalesce(ft, 'none') AS ft,
                coalesce(lt, 'none') AS lt, cents FROM wn WHERE side = 1)
            SELECT model, channel, CAST(count(*) AS BIGINT) AS n_conv,
              CAST(sum(cents) AS BIGINT) AS cents
            FROM (SELECT 'first' AS model, ft AS channel, cents FROM p
              UNION ALL SELECT 'last', lt, cents FROM p)
            GROUP BY 1, 2 ORDER BY model, channel"""))

  // Floor-clamped running balance: s_t = max(0, s_{t-1} + x_t) — the
  // inventory/credit-ledger recurrence that NO window frame can
  // express (the clamp makes it nonlinear; a plain cumulative sum
  // mis-states every balance after the first stock-out). Same
  // engine-portable shape as q76: one grouped collect of the bounded
  // per-key daily series, sort_array-pinned fold, exact integer
  // cents. Emits the final balance and how many times the floor hit
  // (stock-out count).
  private val q82 = GraftQuery(
    "q82_clamped_running_balance",
    (s, dir) => {
      // deposits = odd orderkeys (+cents), withdrawals = even (−cents)
      val led = t(s, dir, "orders")
        .select(col("o_custkey").as("k"), col("o_orderkey").as("seq"),
          when(col("o_orderkey") % 2 === 1,
            round(col("o_totalprice") * 100).cast("long"))
            .otherwise(-round(col("o_totalprice") * 100).cast("long"))
            .as("x"))
        .filter(col("k") < 200)
      led.groupBy("k")
        .agg(sort_array(collect_list(struct(col("seq"), col("x"))))
          .as("series"))
        .select(col("k"), size(col("series")).as("n_moves"),
          aggregate(col("series"),
            struct(lit(0L).as("bal"), lit(0L).as("clamps")),
            (acc, e) => {
              val next = acc("bal") + e("x")
              struct(
                greatest(next, lit(0L)).as("bal"),
                (acc("clamps") + when(next < 0, 1L).otherwise(0L))
                  .as("clamps"))
            }).as("f"))
        .select(col("k"), col("n_moves"), col("f.bal").as("balance"),
          col("f.clamps").as("n_stockouts"))
        .orderBy("k")
    },
    Some("""WITH led AS (SELECT o_custkey AS k, o_orderkey AS seq,
                CASE WHEN o_orderkey % 2 = 1
                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE -CAST(round(o_totalprice * 100) AS BIGINT) END AS x
              FROM orders WHERE o_custkey < 200),
            srt AS (SELECT k, list(x ORDER BY seq) AS series
              FROM led GROUP BY k),
            f AS (SELECT k, CAST(len(series) AS INT) AS n_moves,
                list_reduce(list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                  list_transform(series, x -> [x, CAST(0 AS BIGINT)])),
                  (acc, e) -> [greatest(acc[1] + e[1], 0),
                    acc[2] + CASE WHEN acc[1] + e[1] < 0 THEN 1 ELSE 0 END])
                  AS st
              FROM srt)
            SELECT k, n_moves, st[1] AS balance, st[2] AS n_stockouts
            FROM f ORDER BY k"""))

  // Price–volume variance decomposition (1995 → 1996 revenue per
  // priority): Δrev = Δn·p̄₁ + Δp̄·n₁ + Δn·Δp̄ — the finance
  // bridge-report splitting a change into volume, rate, and mix
  // terms, with the exact-identity column proving the decomposition
  // reconciles to the actual delta. Integer cent sums; doubles only
  // in the final bridge arithmetic, identical on both engines.
  private val q83 = GraftQuery(
    "q83_price_volume_bridge",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .groupBy(col("o_orderpriority").as("pri"),
          year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val p = o.groupBy("pri").pivot("yr", Seq(1995, 1996))
        .agg(first("n").as("n"), first("cents").as("cents"))
      p.select(col("pri"),
          col("1995_n").as("n1"), col("1996_n").as("n2"),
          (col("1996_cents") - col("1995_cents")).as("d_cents"),
          round((col("1996_n") - col("1995_n")) *
            (col("1995_cents").cast("double") / col("1995_n")), 4)
            .as("volume_effect"),
          round((col("1996_cents").cast("double") / col("1996_n") -
            col("1995_cents").cast("double") / col("1995_n")) *
            col("1995_n"), 4).as("rate_effect"),
          round((col("1996_n") - col("1995_n")).cast("double") *
            (col("1996_cents").cast("double") / col("1996_n") -
              col("1995_cents").cast("double") / col("1995_n")), 4)
            .as("mix_effect"))
        .orderBy("pri")
    },
    Some("""WITH g AS (SELECT o_orderpriority AS pri,
                year(CAST(o_orderdate AS DATE)) AS yr,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
              GROUP BY 1, 2),
            p AS (SELECT pri,
                max(CASE WHEN yr = 1995 THEN n END) AS n1,
                max(CASE WHEN yr = 1996 THEN n END) AS n2,
                max(CASE WHEN yr = 1995 THEN cents END) AS c1,
                max(CASE WHEN yr = 1996 THEN cents END) AS c2
              FROM g GROUP BY pri)
            SELECT pri, n1, n2, c2 - c1 AS d_cents,
              round((n2 - n1) * (CAST(c1 AS DOUBLE) / n1), 4)
                AS volume_effect,
              round((CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1) * n1,
                4) AS rate_effect,
              round(CAST(n2 - n1 AS DOUBLE) *
                (CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1), 4)
                AS mix_effect
            FROM p ORDER BY pri"""))

  // Market-basket affinity over order line items: part-BRAND pairs
  // co-occurring in one order, scored by support/confidence/lift —
  // the association-rule primitive. Pair generation happens WITHIN an
  // order (self-join keyed on orderkey, bounded by basket size — the
  // t07 Σf² shape with a naturally tiny f), never across the corpus;
  // brand-level grouping keeps the item vocabulary broadcastable.
  // The lift ordering evaluates the identical double expression on
  // both engines with a (brand, brand) tie-break, so the top-20 cut
  // is deterministic.
  private val q84 = GraftQuery(
    "q84_market_basket",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .distinct()
      val nOrders = li.select("ok").distinct()
        .agg(count(lit(1)).as("n_orders"))
      val single = li.groupBy("b").agg(count(lit(1)).as("cb"))
      // hint("merge"): self-join exchange reuse (the joined+distinct
      // basket frame is computed once, not once per side — see
      // Dedup.jaccardPairsWithCounts for the full rationale)
      val pairs = li.as("x").hint("merge").join(li.as("y"), Seq("ok"))
        .filter(col("x.b") < col("y.b"))
        .groupBy(col("x.b").as("ba"), col("y.b").as("bb"))
        .agg(count(lit(1)).as("cab"))
      val scored = pairs
        .join(broadcast(single.select(col("b").as("ba"), col("cb").as("ca"))), "ba")
        .join(broadcast(single.select(col("b").as("bb"), col("cb").as("cbb"))), "bb")
        .crossJoin(broadcast(nOrders))
        .filter(col("cab") >= 20)
      val w = org.apache.spark.sql.expressions.Window.orderBy(
        ((col("cab") * col("n_orders")).cast("double") /
          (col("ca") * col("cbb"))).desc,
        col("ba"), col("bb"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("ba"), col("bb"), col("cab"),
          round(col("cab").cast("double") / col("n_orders"), 6).as("support"),
          round(col("cab").cast("double") / col("ca"), 6).as("confidence"),
          round(col("cab").cast("double") * col("n_orders") /
            (col("ca") * col("cbb")), 6).as("lift"))
        .orderBy("rank")
    },
    Some("""WITH li AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
            no AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
            single AS (SELECT b, count(*) AS cb FROM li GROUP BY b),
            pairs AS (SELECT x.b AS ba, y.b AS bb, count(*) AS cab
              FROM li x JOIN li y ON x.ok = y.ok AND x.b < y.b
              GROUP BY 1, 2 HAVING count(*) >= 20),
            sc AS (SELECT ba, bb, cab, sa.cb AS ca, sb.cb AS cbb, n_orders
              FROM pairs
              JOIN single sa ON sa.b = ba
              JOIN single sb ON sb.b = bb
              CROSS JOIN no),
            r AS (SELECT *, row_number() OVER (ORDER BY
                CAST(cab * n_orders AS DOUBLE) / (ca * cbb) DESC, ba, bb)
                AS rank FROM sc)
            SELECT CAST(rank AS INT) AS rank, ba, bb, CAST(cab AS BIGINT)
                AS cab,
              round(CAST(cab AS DOUBLE) / n_orders, 6) AS support,
              round(CAST(cab AS DOUBLE) / ca, 6) AS confidence,
              round(CAST(cab AS DOUBLE) * n_orders / (ca * cbb), 6) AS lift
            FROM r WHERE rank <= 20 ORDER BY rank"""))

  // Erasure propagation ("right to be forgotten"): a deterministic
  // erasure-request set (custkey % 31 = 0) cascades through the FK
  // graph — customer rows, their orders, those orders' lineitems,
  // their events — via broadcast anti-joins (the request set is tiny
  // by nature; no fact-side shuffle), emitting the per-table audit
  // (rows before / erased / after) a compliance run must produce.
  // Pairs with q79's FK audit: same edges, destructive direction.
  private val q85 = GraftQuery(
    "q85_erasure_propagation",
    (s, dir) => {
      val victims = t(s, dir, "customer")
        .filter(col("c_custkey") % 31 === 0)
        .select(col("c_custkey").as("k"))
      val doomedOrders = t(s, dir, "orders")
        .join(broadcast(victims), col("o_custkey") === col("k"))
        .select(col("o_orderkey").as("ok"))
      def audit(table: String, df: org.apache.spark.sql.DataFrame,
          kept: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_before"))
          .crossJoin(kept.agg(count(lit(1)).as("n_after")))
          .select(lit(table).as("table_name"), col("n_before"),
            (col("n_before") - col("n_after")).as("n_erased"),
            col("n_after"))
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val e = t(s, dir, "events")
      audit("customer", c,
          c.join(broadcast(victims), col("c_custkey") === col("k"),
            "left_anti"))
        .unionByName(audit("orders", o,
          o.join(broadcast(victims), col("o_custkey") === col("k"),
            "left_anti")))
        .unionByName(audit("lineitem", l,
          l.join(broadcast(doomedOrders), col("l_orderkey") === col("ok"),
            "left_anti")))
        .unionByName(audit("events", e,
          e.join(broadcast(victims), col("user_id") === col("k"),
            "left_anti")))
        .orderBy("table_name")
    },
    Some("""WITH victims AS (SELECT c_custkey AS k FROM customer
              WHERE c_custkey % 31 = 0),
            doomed AS (SELECT o_orderkey AS ok FROM orders
              WHERE o_custkey IN (SELECT k FROM victims))
            SELECT * FROM (
              SELECT 'customer' AS table_name,
                (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_before,
                (SELECT CAST(count(*) AS BIGINT) FROM customer
                  WHERE c_custkey IN (SELECT k FROM victims)) AS n_erased,
                (SELECT CAST(count(*) AS BIGINT) FROM customer
                  WHERE c_custkey NOT IN (SELECT k FROM victims)) AS n_after
              UNION ALL
              SELECT 'orders',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM orders
                  WHERE o_custkey IN (SELECT k FROM victims)),
                (SELECT count(*) FROM orders
                  WHERE o_custkey NOT IN (SELECT k FROM victims))
              UNION ALL
              SELECT 'lineitem',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem
                  WHERE l_orderkey IN (SELECT ok FROM doomed)),
                (SELECT count(*) FROM lineitem
                  WHERE l_orderkey NOT IN (SELECT ok FROM doomed))
              UNION ALL
              SELECT 'events',
                (SELECT count(*) FROM events),
                (SELECT count(*) FROM events
                  WHERE user_id IN (SELECT k FROM victims)),
                (SELECT count(*) FROM events
                  WHERE user_id NOT IN (SELECT k FROM victims)))
            ORDER BY table_name"""))

  // BITEMPORAL snapshot — two time axes at once: "what did we BELIEVE
  // on 1996-06-30 (transaction time) the rate EFFECTIVE on 1996-01-01
  // (valid time) was?" q67's point-in-time lookup has one axis; here
  // corrections recorded AFTER the query's knowledge cutoff must be
  // invisible even though their validity covers the target instant.
  // History synthesized from orders: valid_from = orderdate,
  // recorded_at = orderdate + (orderkey mod 3) days (late
  // corrections). One keyed window after two pushed-down date
  // filters.
  private val q86 = GraftQuery(
    "q86_bitemporal_snapshot",
    (s, dir) => {
      val hist = t(s, dir, "orders").select(
        col("o_custkey").as("k"), col("o_orderkey").as("rec_id"),
        col("o_orderdate").cast("date").as("valid_from"),
        date_add(col("o_orderdate").cast("date"),
          (col("o_orderkey") % 3).cast("int")).as("recorded_at"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("k") < 300)
      val known = hist
        .filter(col("recorded_at") <= lit("1996-06-30").cast("date"))
        .filter(col("valid_from") <= lit("1996-01-01").cast("date"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
        .orderBy(col("valid_from").desc, col("recorded_at").desc,
          col("rec_id").desc)
      known.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("k"), col("rec_id"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          date_format(col("recorded_at"), "yyyy-MM-dd").as("recorded_at"),
          col("cents"))
        .orderBy("k")
    },
    Some("""WITH hist AS (SELECT o_custkey AS k, o_orderkey AS rec_id,
                CAST(o_orderdate AS DATE) AS valid_from,
                CAST(o_orderdate AS DATE) + INTERVAL (o_orderkey % 3) DAY
                  AS recorded_at,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders WHERE o_custkey < 300),
            known AS (SELECT * FROM hist
              WHERE recorded_at <= DATE '1996-06-30'
                AND valid_from <= DATE '1996-01-01'),
            r AS (SELECT *, row_number() OVER (PARTITION BY k
                ORDER BY valid_from DESC, recorded_at DESC, rec_id DESC)
                AS rn FROM known)
            SELECT k, rec_id, strftime(valid_from, '%Y-%m-%d') AS valid_from,
              strftime(CAST(recorded_at AS DATE), '%Y-%m-%d') AS recorded_at,
              cents
            FROM r WHERE rn = 1 ORDER BY k"""))

  // Holt's linear trend (double exponential smoothing): level and
  // trend evolve together — ℓ_t = αx + (1−α)(ℓ+b), b_t = β(ℓ_t−ℓ) +
  // (1−β)b — a TWO-variable recursion (q76's EWMA can't carry trend;
  // no window frame can carry either). Struct-accumulator fold over
  // the sorted bounded daily series; α=1/4, β=1/8 exactly
  // representable; emits the final level/trend and the one-step
  // forecast ℓ+b.
  private val q87 = GraftQuery(
    "q87_holt_trend",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      daily.groupBy("pri")
        .agg(sort_array(collect_list(struct(col("day"), col("cents"))))
          .as("series"))
        .select(col("pri"), size(col("series")).as("n_days"),
          aggregate(col("series"),
            struct(lit(Double.NaN).as("l"), lit(0.0).as("b")),
            (acc, e) => {
              val x = e("cents").cast("double")
              val lNew = when(isnan(acc("l")), x)
                .otherwise(x * 0.25 + (acc("l") + acc("b")) * 0.75)
              struct(lNew.as("l"),
                when(isnan(acc("l")), lit(0.0))
                  .otherwise((lNew - acc("l")) * 0.125 + acc("b") * 0.875)
                  .as("b"))
            }).as("f"))
        .select(col("pri"), col("n_days"),
          round(col("f.l"), 4).as("level"),
          round(col("f.b"), 4).as("trend"),
          round(col("f.l") + col("f.b"), 4).as("forecast"))
        .orderBy("pri")
    },
    Some("""WITH d AS (SELECT o_orderpriority AS pri,
                CAST(o_orderdate AS DATE) AS day,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY pri, day),
            srt AS (SELECT pri, list(CAST(cents AS DOUBLE) ORDER BY day)
                AS series FROM d GROUP BY pri),
            f AS (SELECT pri, CAST(len(series) AS INT) AS n_days,
                list_reduce(list_prepend([CAST('nan' AS DOUBLE), 0.0],
                  list_transform(series, x -> [x, 0.0])),
                  (acc, e) -> CASE WHEN isnan(acc[1]) THEN [e[1], 0.0]
                    ELSE [e[1] * 0.25 + (acc[1] + acc[2]) * 0.75,
                      (e[1] * 0.25 + (acc[1] + acc[2]) * 0.75 - acc[1])
                        * 0.125 + acc[2] * 0.875] END) AS st
              FROM srt)
            SELECT pri, n_days, round(st[1], 4) AS level,
              round(st[2], 4) AS trend,
              round(st[1] + st[2], 4) AS forecast
            FROM f ORDER BY pri"""))

  // Session path analysis: the event-type transition matrix over
  // within-session adjacent pairs (q58's session definition) — the
  // Markov-chain view of user journeys. One window pass produces the
  // bigrams; transition probability = pair count / from-state total,
  // exact integers until the final division.
  private val q88 = GraftQuery(
    "q88_session_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val withSess = t(s, dir, "events")
        .withColumn("gap_s",
          col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
        .withColumn("new_sess",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ws = Window.partitionBy("user_id", "sess_id")
        .orderBy(col("ts"), col("event_id"))
      val bigrams = withSess
        .withColumn("next_type", lead(col("event_type"), 1).over(ws))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = bigrams.groupBy("from_type").agg(sum("n").as("tot"))
      bigrams.join(totals, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 6).as("p"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH g AS (SELECT user_id, event_id, ts, event_type,
                CAST(floor(epoch(ts)) AS BIGINT) -
                CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id))) AS BIGINT) AS gap_s
              FROM events),
            f AS (SELECT user_id, event_id, ts, event_type,
                CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END
                  AS new_sess FROM g),
            sn AS (SELECT user_id, event_id, ts, event_type,
                CAST(sum(new_sess) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS sess_id
              FROM f),
            bg AS (SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id, sess_id
                  ORDER BY ts, event_id) AS to_type
              FROM sn),
            c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
              FROM bg WHERE to_type IS NOT NULL GROUP BY 1, 2),
            tt AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
            SELECT from_type, to_type, n,
              round(CAST(n AS DOUBLE) / tot, 6) AS p
            FROM c JOIN tt USING (from_type)
            ORDER BY from_type, to_type"""))

  // Double-entry reconciliation: a journal synthesized from orders
  // (AR debit + REV credit per order; every 997th order also books a
  // one-cent orphan — the planted break) is audited per TRANSACTION
  // (entries must sum to zero) and per ACCOUNT. The closing check of
  // any financial pipeline: exact integer cents, one grouped pass per
  // axis, and the imbalance total must equal exactly the planted
  // corruption.
  private val q89 = GraftQuery(
    "q89_ledger_reconciliation",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey").as("txn"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val journal = o.select(col("txn"), lit("AR").as("account"),
          col("cents").as("amount"))
        .unionByName(o.select(col("txn"), lit("REV").as("account"),
          (-col("cents")).as("amount")))
        .unionByName(o.filter(col("txn") % 997 === 0)
          .select(col("txn"), lit("AR").as("account"),
            lit(1L).as("amount")))
      val perTxn = journal.groupBy("txn").agg(sum("amount").as("bal"))
      val txnAudit = perTxn.agg(
        count(lit(1)).as("n_txn"),
        sum(when(col("bal") =!= 0, 1L).otherwise(0L)).as("n_unbalanced"),
        sum(abs(col("bal"))).as("imbalance_cents"))
      val perAccount = journal.groupBy("account")
        .agg(count(lit(1)).as("n_entries"), sum("amount").as("total_cents"))
      perAccount
        .select(col("account"), col("n_entries"), col("total_cents"))
        .unionByName(txnAudit.select(lit("__AUDIT__").as("account"),
          col("n_txn").as("n_entries"),
          (col("n_unbalanced") * 1000000000L + col("imbalance_cents"))
            .as("total_cents")))
        .orderBy("account")
    },
    Some("""WITH o AS (SELECT o_orderkey AS txn,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders),
            journal AS (
              SELECT txn, 'AR' AS account, cents AS amount FROM o
              UNION ALL SELECT txn, 'REV', -cents FROM o
              UNION ALL SELECT txn, 'AR', 1 FROM o WHERE txn % 997 = 0),
            per_txn AS (SELECT txn, CAST(sum(amount) AS BIGINT) AS bal
              FROM journal GROUP BY txn),
            audit AS (SELECT CAST(count(*) AS BIGINT) AS n_txn,
                CAST(sum(CASE WHEN bal <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unbalanced,
                CAST(sum(abs(bal)) AS BIGINT) AS imbalance
              FROM per_txn)
            SELECT account, CAST(n_entries AS BIGINT) AS n_entries,
              CAST(total_cents AS BIGINT) AS total_cents FROM (
              SELECT account, count(*) AS n_entries,
                sum(amount) AS total_cents
              FROM journal GROUP BY account
              UNION ALL
              SELECT '__AUDIT__', n_txn,
                n_unbalanced * 1000000000 + imbalance FROM audit)
            ORDER BY account"""))

  // Theil–Sen robust trend: the MEDIAN of all pairwise slopes per
  // priority — immune to the outlier days that wreck least squares
  // (the robust-statistics sibling of t78's median/MAD, for trends).
  // Exact Theil–Sen is O(days²) BY CONTRACT, so the operator runs on
  // a BOUNDED window (one year here → ≤66k pairs per group; at scale
  // keep the window bounded or switch to the repeated-median /
  // sampled estimator). Pair generation runs on the PRE-AGGREGATED
  // daily table, never raw orders; the median picks
  // lower-of-two on even counts with an exact integer rank rule, and
  // slope ordering is the identical double expression both engines
  // evaluate.
  private val q90 = GraftQuery(
    "q90_theil_sen_trend",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val epoch = to_date(lit("1970-01-01"))
      val daily = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1997)
        .groupBy(col("o_orderpriority").as("pri"),
          datediff(col("o_orderdate"), epoch).cast("long").as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      // hint("merge"): self-join exchange reuse (the daily aggregate is
      // computed once, not once per side — Dedup.jaccardPairsWithCounts)
      val slopes = daily.as("a").hint("merge").join(daily.as("b"),
          col("a.pri") === col("b.pri") && col("a.day") < col("b.day"))
        .select(col("a.pri").as("pri"),
          ((col("b.cents") - col("a.cents")).cast("double") /
            (col("b.day") - col("a.day"))).as("slope"),
          col("a.day").as("d1"), col("b.day").as("d2"))
      val w = Window.partitionBy("pri")
        .orderBy(col("slope"), col("d1"), col("d2"))
      val wc = Window.partitionBy("pri")
      slopes
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wc))
        .filter(col("rn") * 2 === col("n") || col("rn") * 2 === col("n") + 1)
        .groupBy("pri")
        .agg(max("n").as("n_pairs"),
          round(min("slope"), 4).as("median_slope_cents_per_day"))
        .orderBy("pri")
    },
    Some("""WITH daily AS (SELECT o_orderpriority AS pri,
                datediff('day', DATE '1970-01-01',
                  CAST(o_orderdate AS DATE)) AS day,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
              GROUP BY 1, 2),
            sl AS (SELECT a.pri,
                CAST(b.cents - a.cents AS DOUBLE) / (b.day - a.day) AS slope,
                a.day AS d1, b.day AS d2
              FROM daily a JOIN daily b
                ON a.pri = b.pri AND a.day < b.day),
            r AS (SELECT pri, slope,
                row_number() OVER (PARTITION BY pri
                  ORDER BY slope, d1, d2) AS rn,
                count(*) OVER (PARTITION BY pri) AS n
              FROM sl)
            SELECT pri, CAST(max(n) AS BIGINT) AS n_pairs,
              round(min(slope), 4) AS median_slope_cents_per_day
            FROM r WHERE rn * 2 = n OR rn * 2 = n + 1
            GROUP BY pri ORDER BY pri"""))

  // Interval-union coverage ("uptime report"): overlapping activity
  // intervals per priority (1997 orders, each covering 1–5 days)
  // merge into islands — covered days, island count, and the largest
  // dark gap. The duration-side complement of q80's sessionize and
  // q69's overlap JOIN: one keyed window over interval rows, never
  // per-day explosion (the naive calendar-explode shape is O(days)
  // per interval).
  private val q91 = GraftQuery(
    "q91_interval_coverage",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val epoch = to_date(lit("1970-01-01"))
      val iv = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderpriority").as("pri"),
          col("o_orderkey").as("rid"),
          datediff(col("o_orderdate"), epoch).cast("long").as("s"),
          (datediff(col("o_orderdate"), epoch) +
            (col("o_orderkey") % 5) + 1).cast("long").as("e"))
      // rid tiebreak: duplicate (s, e) rows otherwise order
      // arbitrarily and the running island sum can split a tied pair
      // across two islands (engine-divergent)
      val ord = Window.partitionBy("pri")
        .orderBy(col("s"), col("e"), col("rid"))
      val prevMax = max(col("e")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1))
      val marked = iv
        .withColumn("pm", prevMax)
        .withColumn("ni",
          when(col("pm").isNull || col("s") > col("pm"), 1L).otherwise(0L))
        .withColumn("gap",
          when(col("ni") === 1 && col("pm").isNotNull, col("s") - col("pm")))
        .withColumn("island", sum("ni").over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val islands = marked.groupBy("pri", "island")
        .agg(min("s").as("is"), max("e").as("ie"), max("gap").as("gap"))
      islands.groupBy("pri")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("ie") - col("is")).as("covered_days"),
          coalesce(max("gap"), lit(0L)).as("max_gap_days"))
        .orderBy("pri")
    },
    Some("""WITH iv AS (SELECT o_orderpriority AS pri,
                CAST(datediff('day', DATE '1970-01-01',
                  CAST(o_orderdate AS DATE)) AS BIGINT) AS s,
                CAST(datediff('day', DATE '1970-01-01',
                  CAST(o_orderdate AS DATE)) + o_orderkey % 5 + 1 AS BIGINT)
                  AS e, o_orderkey AS rid
              FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997),
            m AS (SELECT pri, s, e, rid,
                max(e) OVER (PARTITION BY pri ORDER BY s, e, rid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
              FROM iv),
            f AS (SELECT pri, s, e, rid, pm,
                CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni,
                CASE WHEN (pm IS NULL OR s > pm) AND pm IS NOT NULL
                  THEN s - pm END AS gap
              FROM m),
            isl AS (SELECT pri, s, e, gap,
                CAST(sum(ni) OVER (PARTITION BY pri ORDER BY s, e, rid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS island
              FROM f),
            g AS (SELECT pri, island, min(s) AS i_s, max(e) AS i_e,
                max(gap) AS gap
              FROM isl GROUP BY pri, island)
            SELECT pri, CAST(count(*) AS BIGINT) AS n_islands,
              CAST(sum(i_e - i_s) AS BIGINT) AS covered_days,
              CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_days
            FROM g GROUP BY pri ORDER BY pri"""))

  // Conversion-window funnel — q48 with the product constraint real
  // funnels have: each stage counts only within a conversion window
  // of the previous stage's first completion (an unbounded funnel
  // credits a purchase months after the click; 2 days matches this
  // fixture's event cadence — ~96 of 150 eventual click-conversions).
  // Same user-keyed min-after-join ladder as q48 — one keyed agg +
  // join per stage, no windows over the raw stream. Lags are exact
  // INTEGER MICROSECONDS on both engines (unix_micros / epoch_us;
  // second-floored arithmetic would diverge on the fixture's
  // fractional-second timestamps), averaged then scaled — every
  // double step identical.
  private val q92 = GraftQuery(
    "q92_conversion_window_funnel",
    (s, dir) => {
      val e = t(s, dir, "events").select("user_id", "ts", "event_type")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t_view") &&
          col("ts") <= col("t_view") + expr("INTERVAL 2 DAYS"))
        .groupBy("user_id").agg(min("ts").as("t_click"), max("t_view").as("t_view"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c.select("user_id", "t_click"), "user_id")
        .filter(col("ts") > col("t_click") &&
          col("ts") <= col("t_click") + expr("INTERVAL 2 DAYS"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"), max("t_click").as("t_click"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_conv"),
          round(avg(expr("unix_micros(t_click) - unix_micros(t_view)")) /
            lit(1000000.0), 4).as("avg_click_lag_s")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_conv"),
          round(avg(expr("unix_micros(t_purchase) - unix_micros(t_click)")) /
            lit(1000000.0), 4).as("avg_purchase_lag_s")))
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(ts) AS t_click, max(t_view) AS t_view
              FROM events e JOIN v USING (user_id)
              WHERE event_type = 'click' AND ts > t_view
                AND ts <= t_view + INTERVAL 2 DAY
              GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(ts) AS t_purchase,
                max(t_click) AS t_click
              FROM events e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND ts > t_click
                AND ts <= t_click + INTERVAL 2 DAY
              GROUP BY e.user_id)
            SELECT (SELECT count(*) FROM v) AS n_view,
              (SELECT count(*) FROM c) AS n_click_conv,
              (SELECT round(avg(epoch_us(t_click) - epoch_us(t_view))
                 / 1000000.0, 4) FROM c) AS avg_click_lag_s,
              (SELECT count(*) FROM p) AS n_purchase_conv,
              (SELECT round(avg(epoch_us(t_purchase) - epoch_us(t_click))
                 / 1000000.0, 4) FROM p) AS avg_purchase_lag_s"""))

  // SCD2 DELTA MERGE — the incremental companion to q54's full
  // rebuild: a delta batch (each user's 2 most-recent events) merges
  // into the dimension built from the rest. First delta change
  // compares against the dimension's CURRENT state (not just its own
  // lag), the open interval closes at the first surviving change, new
  // intervals chain within the batch. The oracle is q54's FULL
  // REBUILD over all events — merge ≡ rebuild is the strongest gate
  // an incremental operator can face (any drift in the close/compare
  // rules hash-mismatches). Scale: everything is (user_id)-keyed —
  // two window passes + two keyed joins, no global ordering; the
  // dimension side is touched once, per key.
  private val q93 = GraftQuery(
    "q93_scd2_delta_merge",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
      val wDesc = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val wAsc = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val tagged = ev.withColumn("rk", row_number().over(wDesc))
      val hist = tagged.filter(col("rk") > 2).drop("rk")
      val delta = tagged.filter(col("rk") <= 2).drop("rk")
      // dimension = q54's rebuild over the history slice
      val changesH = hist
        .withColumn("prev", lag(col("event_type"), 1).over(wAsc))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      val dim = changesH
        .withColumn("valid_to_ts", lead(col("ts"), 1).over(wAsc))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from_ts"), col("valid_to_ts"))
      val cur = dim.filter(col("valid_to_ts").isNull)
        .select(col("user_id"), col("state").as("cur_state"))
      // delta chain: the FIRST batch row compares against the live
      // dimension state; a no-op value never opens an interval
      val d2 = delta.join(cur, Seq("user_id"), "left")
        .withColumn("prev", lag(col("event_type"), 1).over(wAsc))
        .withColumn("eff_prev", coalesce(col("prev"), col("cur_state")))
        .filter(col("eff_prev").isNull ||
          col("eff_prev") =!= col("event_type"))
      val newIv = d2
        .withColumn("valid_to_ts", lead(col("ts"), 1).over(wAsc))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from_ts"), col("valid_to_ts"))
      val firstChange = d2.groupBy("user_id")
        .agg(min(col("ts")).as("close_ts"))
      val dimUpd = dim.join(firstChange, Seq("user_id"), "left")
        .select(col("user_id"), col("state"), col("valid_from_ts"),
          when(col("valid_to_ts").isNull && col("close_ts").isNotNull,
            col("close_ts")).otherwise(col("valid_to_ts"))
            .as("valid_to_ts"))
      dimUpd.unionByName(newIv)
        .select(col("user_id"), col("state"),
          date_format(col("valid_from_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("valid_from"),
          date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("valid_to"),
          col("valid_to_ts").isNull.as("is_current"))
        .orderBy("user_id", "valid_from")
    },
    // q54's FULL-rebuild oracle, verbatim — the equivalence IS the test
    Some("""WITH c AS (SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
               FROM events),
             ch AS (SELECT user_id, event_type, ts, event_id FROM c
               WHERE prev IS NULL OR prev <> event_type),
             iv AS (SELECT user_id, event_type, ts,
                 lead(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS valid_to_ts
               FROM ch)
             SELECT user_id, event_type AS state,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
               valid_to_ts IS NULL AS is_current
             FROM iv ORDER BY user_id, valid_from"""))

  val all: Seq[GraftQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21,
    q22, q23, q24, q25, q26, q27, q28, q29, q30, q31, q32, q33, q34,
    q35, q36, q37, q38, q39, q40, q41, q42, q43, q44, q45, q46, q47,
    q48, q49, q50, q51, q52, q53, q54, q55, q56, q57, q58, q59, q60,
    q61, q62, q63, q64, q65, q66, q67, q68, q69, q70, q71, q72, q73,
    q74, q75, q76, q77, q78, q79, q80, q81, q82, q83, q84, q85, q86,
    q87, q88, q89, q90, q91, q92, q93)
}
