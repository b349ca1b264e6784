package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query suite over the raw testdata tables.
  *
  * These exercise the operator categories the reference delegates to Spark
  * SQL (SURVEY.md §2.9): projection/filter, joins of every flavor,
  * aggregation, windows, sorts/limits, set ops, scalar functions. Each
  * query has a DuckDB oracle; results are made hash-stable by:
  *   - summing money columns as exact integer cents
  *     (`floor(x*100)` is deterministic IEEE on both engines),
  *   - casting every integer output to BIGINT on both sides,
  *   - deterministic ORDER BY with full tie-breaks.
  */
object Relational {
  import graft.Tables.t

  /** Exact integer cents from a double money column. */
  private def cents(c: Column): Column = floor(c * lit(100)).cast("long")

  /** events.ts as exact BIGINT micros-since-epoch. The testdata stores
    * parquet timestamp[us] isAdjustedToUTC=false (Spark 4: timestamp_ntz);
    * every graft session pins spark.sql.session.timeZone=UTC, so the
    * ntz→timestamp cast is the identity instant mapping and this equals
    * DuckDB's epoch_us(ts) bit-for-bit. */
  private def tsUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Timestamp-NTZ literal (testdata date columns are parquet
    * isAdjustedToUTC=false, which Spark 4 reads as timestamp_ntz). */
  private def ntz(s: String): Column =
    lit(java.time.LocalDateTime.parse(s + "T00:00:00"))

  type QFn = (SparkSession, String) => DataFrame

  /** name -> (spark query, duckdb oracle sql) */
  val all: Map[String, (QFn, Option[String])] = Map(

    // ---- aggregation: TPC-H Q1 shape (filter + groupBy + multiple aggs)
    "q01_pricing_summary" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= ntz("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("sum_base_c"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("sum_disc_c"),
            count(lit(1)).as("cnt"))
          .withColumn("avg_qty",
            col("sum_qty").cast("double") / col("cnt"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               CAST(sum(floor(l_extendedprice*100)) AS BIGINT) AS sum_base_c,
               CAST(sum(floor(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS sum_disc_c,
               count(*) AS cnt,
               CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""))),

    // ---- projection + filter pushdown
    "q02_filter_project" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_orderkey") % 500 === 0 && col("l_quantity") > 45)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS qty,
               strftime(l_shipdate, '%Y-%m-%d') AS ship
        FROM lineitem
        WHERE l_orderkey % 500 = 0 AND l_quantity > 45
        ORDER BY l_orderkey, l_linenumber"""))),

    // ---- 3-way join + agg + top-n (TPC-H Q3 shape)
    "q03_top_revenue_orders" -> ((
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders").filter(col("o_orderdate") < ntz("1997-01-01"))
        val l = t(s, d, "lineitem").filter(col("l_shipdate") > ntz("1997-01-01"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
               CAST(sum(floor(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_c
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue_c DESC, l_orderkey
        LIMIT 10"""))),

    // ---- semi join (EXISTS)
    "q04_order_priority" -> ((
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        val late = t(s, d, "lineitem").filter(col("l_quantity") > 48)
          .select(col("l_orderkey")).distinct()
        o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .filter(col("o_orderdate") >= ntz("1996-01-01") &&
                  col("o_orderdate") < ntz("1997-01-01"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""))),

    // ---- 6-way join + agg (TPC-H Q5 shape)
    "q05_local_supplier_volume" -> ((
      (s: SparkSession, d: String) => {
        val r = t(s, d, "region")
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        val su = t(s, d, "supplier")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= ntz("1996-01-01") &&
                  col("o_orderdate") < ntz("1998-01-01"))
        val l = t(s, d, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_c"))
          .orderBy(col("revenue_c").desc, col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(sum(floor(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_c
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue_c DESC, n_name"""))),

    // ---- highly selective scan + scalar agg (TPC-H Q6 shape)
    "q06_forecast_revenue" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= ntz("1996-01-01") &&
                  col("l_shipdate") < ntz("1997-01-01") &&
                  col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
                  col("l_quantity") < 24)
          .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
                 .as("revenue_c"),
               count(lit(1)).as("cnt")),
      Some("""
        SELECT CAST(sum(floor(l_extendedprice*l_discount*100)) AS BIGINT) AS revenue_c,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24"""))),

    // ---- anti join (NOT EXISTS)
    "q07_customers_no_orders" -> ((
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") < ntz("1996-01-01"))
          .select(col("o_custkey")).distinct()
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS cnt
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""))),

    // ---- window: top-n per group
    "q08_top_orders_per_customer" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            cents(col("o_totalprice")).as("price_c"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice*100) AS BIGINT) AS price_c, rn
        FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
          FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn"""))),

    // ---- window: running aggregate over event time
    "q09_running_user_spend" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .filter(col("user_id") < 10)
          .withColumn("run_c", sum(cents(col("value"))).over(w))
          .select(col("user_id"), col("event_id"), col("run_c"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id, run_c FROM (
          SELECT user_id, event_id,
                 CAST(sum(floor(value*100)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_c
          FROM events WHERE user_id < 10)
        ORDER BY user_id, event_id"""))),

    // ---- distinct aggregation
    "q10_distinct_customers" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
               count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderstatus")),
      Some("""
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))),

    // ---- set operations: INTERSECT / EXCEPT
    "q11_setops_active_custkeys" -> ((
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        val y96 = o.filter(col("o_orderdate") >= ntz("1996-01-01") &&
                           col("o_orderdate") < ntz("1997-01-01"))
          .select(col("o_custkey"))
        val y97 = o.filter(col("o_orderdate") >= ntz("1997-01-01") &&
                           col("o_orderdate") < ntz("1998-01-01"))
          .select(col("o_custkey"))
        y96.intersect(y97).orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        ORDER BY o_custkey"""))),

    // ---- scalar string/math functions
    "q12_part_strings" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "part")
          .select(
            col("p_partkey"),
            upper(substring(col("p_name"), 1, 8)).as("nm"),
            length(col("p_name")).cast("long").as("len"),
            concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
            (col("p_size") % 7).cast("long").as("szmod"),
            cents(col("p_retailprice")).as("price_c"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey, upper(substring(p_name, 1, 8)) AS nm,
               CAST(length(p_name) AS BIGINT) AS len,
               concat_ws('-', p_brand, p_type) AS bt,
               CAST(p_size % 7 AS BIGINT) AS szmod,
               CAST(floor(p_retailprice*100) AS BIGINT) AS price_c
        FROM part ORDER BY p_partkey"""))),

    // ---- date extraction + agg
    "q13_orders_by_month" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .groupBy(year(col("o_orderdate")).cast("long").as("y"),
                   month(col("o_orderdate")).cast("long").as("m"))
          .agg(count(lit(1)).as("cnt"),
               sum(cents(col("o_totalprice"))).as("total_c"))
          .orderBy(col("y"), col("m")),
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               count(*) AS cnt,
               CAST(sum(floor(o_totalprice*100)) AS BIGINT) AS total_c
        FROM orders GROUP BY 1, 2 ORDER BY y, m"""))),

    // ---- rollup (grouping sets)
    "q14_customer_rollup" -> ((
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("cnt"))
          .select(coalesce(col("r_name"), lit("ALL")).as("region"),
                  coalesce(col("n_name"), lit("ALL")).as("nation"),
                  col("cnt"))
          .orderBy(col("region"), col("nation"))
      },
      Some("""
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation, count(*) AS cnt
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region, nation"""))),

    // ---- global sort + limit
    "q15_priciest_lineitems" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            cents(col("l_extendedprice")).as("price_c"))
          .orderBy(col("price_c").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(25),
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice*100) AS BIGINT) AS price_c
        FROM lineitem
        ORDER BY price_c DESC, l_orderkey, l_linenumber
        LIMIT 25"""))),

    // ---- event-time daily aggregation (ns timestamps)
    "q16_events_daily" -> ((
      (s: SparkSession, d: String) =>
        // ts is raw nanos-since-epoch (see Tables.configure); derive the
        // UTC day via exact integer division to micros.
        t(s, d, "events")
          .withColumn("day",
            date_format(timestamp_micros(tsUs(col("ts"))), "yyyy-MM-dd"))
          .groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("val_c"))
          .orderBy(col("day"), col("event_type")),
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               count(*) AS cnt,
               CAST(sum(floor(value*100)) AS BIGINT) AS val_c
        FROM events
        GROUP BY 1, 2 ORDER BY day, event_type"""))),

    // ---- sessionization: gaps-and-islands over the event stream
    // (12h inactivity closes a session; all arithmetic in exact integer
    // microseconds so both engines agree bit-for-bit)
    "q19_sessionization" -> ((
      (s: SparkSession, d: String) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        t(s, d, "events")
          .withColumn("us", tsUs(col("ts")))
          .withColumn("prev", lag(col("us"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev").isNull ||
              col("us") - col("prev") > lit(43200000000L), 1L).otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
          .orderBy(col("user_id"), col("sess_id"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        ), marked AS (
          SELECT user_id, event_id, us,
                 CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                      OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 43200000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM e
        ), sess AS (
          SELECT user_id, us,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM marked
        )
        SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
               count(*) AS n_events, max(us) - min(us) AS dur_us
        FROM sess GROUP BY user_id, sess_id
        ORDER BY user_id, sess_id"""))),

    // ---- correlated aggregate (TPC-H Q17 shape): parts whose order
    // quantity is below 20% of their average — the per-part average is
    // exact (integer-valued doubles sum exactly), so the threshold
    // compare is engine-independent
    "q37_small_quantity_revenue" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val avgQ = li.groupBy(col("l_partkey").as("p_pk"))
          .agg((avg(col("l_quantity")) * 0.2).as("threshold"))
        li.join(avgQ, col("l_partkey") === col("p_pk"))
          .filter(col("l_quantity") < col("threshold"))
          .agg(
            count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("rev_c"))
      },
      Some("""
        SELECT count(*) AS n,
               CAST(sum(floor(l_extendedprice*100)) AS BIGINT) AS rev_c
        FROM lineitem l
        JOIN (SELECT l_partkey AS p_pk, 0.2 * avg(l_quantity) AS threshold
              FROM lineitem GROUP BY l_partkey) t
          ON l.l_partkey = t.p_pk
        WHERE l.l_quantity < t.threshold"""))),

    // ---- CASE expression buckets
    "q17_quantity_buckets" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .withColumn("bucket",
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 30, "mid")
              .otherwise("high"))
          .groupBy(col("bucket"), col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
               sum(col("l_quantity")).cast("long").as("sum_qty"))
          .orderBy(col("bucket"), col("l_returnflag")),
      Some("""
        SELECT CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'high' END AS bucket,
               l_returnflag, count(*) AS cnt,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY 1, 2 ORDER BY bucket, l_returnflag"""))),

    // ---- outer join preserving unmatched rows
    "q18_nation_customer_counts" -> ((
      (s: SparkSession, d: String) => {
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        n.join(c, col("c_nationkey") === col("n_nationkey"), "left")
          .groupBy(col("n_name"))
          .agg(count(col("c_custkey")).as("n_cust"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name, count(c_custkey) AS n_cust
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""))),

    // ---- as-of (temporal) join: each purchase matched to the user's
    //      latest click at-or-before it (graft.operators.AsofJoin —
    //      union + keyed-window carry-forward, ONE shuffle, no
    //      inequality join). Times compared at MICROS: the parquet
    //      nanos get truncated by DuckDB's TIMESTAMP, so both engines
    //      floor-divide to the same axis.
    "q104_asof_purchase_click" -> ((
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val l = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            tsUs(col("ts")).as("us"))
        val r = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("r_event_id"), col("user_id"),
            tsUs(col("ts")).as("r_us"))
        graft.operators.AsofJoin.asof(l, r, on = Seq("user_id"),
            leftTime = "us", rightTime = "r_us",
            tiebreak = Seq("r_event_id"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_purchases"),
            count(col("r_event_id")).as("n_matched"),
            sum(coalesce(col("us") - col("r_us"), lit(0L))).as("lag_us"),
            sum(coalesce(col("r_event_id"), lit(0L)) * col("event_id"))
              .as("asof_check"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
                   FROM events WHERE event_type = 'purchase'),
             r AS (SELECT event_id AS r_event_id, user_id,
                          epoch_us(ts) AS r_us
                   FROM events WHERE event_type = 'click'),
        j AS (SELECT l.event_id, l.user_id, l.us, r.r_event_id, r.r_us,
                     row_number() OVER (PARTITION BY l.event_id
                       ORDER BY r.r_us DESC, r.r_event_id DESC) AS rn
              FROM l JOIN r ON r.user_id = l.user_id AND r.r_us <= l.us)
        SELECT l.user_id,
               count(*) AS n_purchases,
               count(m.r_event_id) AS n_matched,
               CAST(sum(COALESCE(l.us - m.r_us, 0)) AS BIGINT) AS lag_us,
               CAST(sum(COALESCE(m.r_event_id, 0) * l.event_id) AS BIGINT)
                 AS asof_check
        FROM l LEFT JOIN (SELECT * FROM j WHERE rn = 1) m USING (event_id)
        GROUP BY l.user_id ORDER BY l.user_id"""))),

    // ---- forward as-of with a tolerance: conversion attribution — each
    //      click matched to the user's NEXT purchase within 24h.
    //      Exercises the AsofJoin modes q104 doesn't (direction=forward,
    //      tolerance nulling). Tie rule: earliest time, greatest id.
    "q105_click_conversion" -> ((
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val l = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            tsUs(col("ts")).as("us"))
        val r = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"), col("user_id"),
            tsUs(col("ts")).as("p_us"))
        graft.operators.AsofJoin.asof(l, r, on = Seq("user_id"),
            leftTime = "us", rightTime = "p_us", direction = "forward",
            tolerance = Some(86400000000L), tiebreak = Seq("p_event_id"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_clicks"),
            count(col("p_event_id")).as("n_converted"),
            sum(coalesce(col("p_us") - col("us"), lit(0L))).as("lag_us"),
            sum(coalesce(col("p_event_id"), lit(0L)) * col("event_id"))
              .as("conv_check"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us
                   FROM events WHERE event_type = 'click'),
             r AS (SELECT event_id AS p_event_id, user_id,
                          epoch_us(ts) AS p_us
                   FROM events WHERE event_type = 'purchase'),
        j AS (SELECT l.event_id, l.user_id, l.us, r.p_event_id, r.p_us,
                     row_number() OVER (PARTITION BY l.event_id
                       ORDER BY r.p_us ASC, r.p_event_id DESC) AS rn
              FROM l JOIN r ON r.user_id = l.user_id AND r.p_us >= l.us),
        m AS (SELECT * FROM j WHERE rn = 1 AND p_us - us <= 86400000000)
        SELECT l.user_id,
               count(*) AS n_clicks,
               count(m.p_event_id) AS n_converted,
               CAST(sum(COALESCE(m.p_us - m.us, 0)) AS BIGINT) AS lag_us,
               CAST(sum(COALESCE(m.p_event_id, 0) * l.event_id) AS BIGINT)
                 AS conv_check
        FROM l LEFT JOIN m USING (event_id)
        GROUP BY l.user_id ORDER BY l.user_id"""))),

    // ---- point-in-interval (range) join: purchases landing inside any
    //      12h view window of the same user (graft.operators
    //      .IntervalJoin — bucketized equi-join, no inequality join;
    //      bucket == window length so each interval explodes into ≤2
    //      rows). True 1:N containment multiplicity.
    "q106_purchase_in_view_window" -> ((
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val win = 43200000000L // 12h in micros
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            tsUs(col("ts")).as("us"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("v_event_id"), col("user_id"),
            tsUs(col("ts")).as("v_start"),
            (tsUs(col("ts")) + win).as("v_end"))
        graft.operators.IntervalJoin.pointInInterval(p, v,
            on = Seq("user_id"), pointCol = "us", startCol = "v_start",
            endCol = "v_end", bucket = win)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_pairs"),
            countDistinct(col("event_id")).as("n_covered"),
            sum(col("event_id") * col("v_event_id")).as("pair_check"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us
                   FROM events WHERE event_type = 'purchase'),
             v AS (SELECT event_id AS v_event_id, user_id,
                          epoch_us(ts) AS v_start,
                          epoch_us(ts) + 43200000000 AS v_end
                   FROM events WHERE event_type = 'view')
        SELECT p.user_id,
               count(*) AS n_pairs,
               count(DISTINCT p.event_id) AS n_covered,
               CAST(sum(p.event_id * v.v_event_id) AS BIGINT) AS pair_check
        FROM p JOIN v ON v.user_id = p.user_id
                      AND p.us >= v.v_start AND p.us <= v.v_end
        GROUP BY p.user_id ORDER BY p.user_id""")))
  )
}
