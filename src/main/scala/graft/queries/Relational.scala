package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** OGR-SQL-equivalent relational surface (SURVEY.md §2.2–§2.6), expressed
  * Spark-first over the driver's TPC-H-ish parquet tables.
  *
  * Float-parity discipline for the DuckDB oracle compare: every aggregated
  * money/measure value is quantized per-row to integer cents
  * (`cast(round(x*100) as bigint)`) and aggregated EXACTLY as int64; any
  * derived double (avg, stddev) is then computed from those exact integers
  * with the same sequence of IEEE basic ops on both sides, which makes the
  * doubles bit-identical (basic ops + sqrt are exactly specified; only
  * transcendentals aren't). Reference for the operator semantics: OGR SQL
  * (ogr/swq_*.cpp) per SURVEY.md §2; the reference has no GROUP BY — Spark
  * makes that a free upgrade.
  */
object Relational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** cents-quantized exact column */
  private def cents(c: String): org.apache.spark.sql.Column =
    round(col(c) * lit(100)).cast("bigint")

  val defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // §2.4 whole-table SUMMARY mode (SWQM_SUMMARY_RECORD): AVG MIN MAX COUNT
    // SUM STDDEV + COUNT(DISTINCT) in one record, exact accumulators.
    ("q01_summary_agg", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("l_returnflag")).as("cnt_distinct_rf"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          sum(cents("l_quantity")).as("sum_qty_c"),
          sum(cents("l_quantity") * cents("l_quantity")).as("sum_qty_c2"))
        // stddev from int64 sums via the E[x²]−E[x]² form with every
        // intermediate an exact-int64-derived double and a fixed IEEE op
        // order (no cnt*sum2 int64 product → no ANSI overflow at sf≥0.2;
        // both engines produce bit-identical doubles)
        .select(
          col("cnt"), col("cnt_distinct_rf"), col("min_qty"), col("max_qty"),
          (col("sum_qty_c") / lit(100.0)).as("sum_qty"),
          (col("sum_qty_c") / (col("cnt") * lit(100.0))).as("avg_qty"),
          sqrt(
            (col("sum_qty_c2").cast("double") / col("cnt").cast("double")
              - (col("sum_qty_c").cast("double") / col("cnt").cast("double"))
                * (col("sum_qty_c").cast("double") / col("cnt").cast("double")))
              * (col("cnt").cast("double") / (col("cnt") - lit(1)).cast("double"))).as("stddev_qty_c"))
    }, Some("""
      WITH s AS (
        SELECT count(*) AS cnt,
               count(DISTINCT l_returnflag) AS cnt_distinct_rf,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty,
               cast(sum(cast(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               cast(sum(cast(round(l_quantity*100) AS BIGINT)*cast(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c2
        FROM lineitem)
      SELECT cnt, cnt_distinct_rf, min_qty, max_qty,
             sum_qty_c / 100.0 AS sum_qty,
             sum_qty_c / (cnt * 100.0) AS avg_qty,
             sqrt((CAST(sum_qty_c2 AS DOUBLE) / CAST(cnt AS DOUBLE)
                   - (CAST(sum_qty_c AS DOUBLE) / CAST(cnt AS DOUBLE))
                     * (CAST(sum_qty_c AS DOUBLE) / CAST(cnt AS DOUBLE)))
                  * (CAST(cnt AS DOUBLE) / CAST(cnt - 1 AS DOUBLE))) AS stddev_qty_c
      FROM s""")),

    // §2.4 GROUP BY aggregation (zonal-statistics relational analog)
    ("q02_groupby_agg", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(cents("l_quantity")).as("sum_qty_c"),
          sum(cents("l_extendedprice")).as("sum_price_c"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
          (col("sum_qty_c") / lit(100.0)).as("sum_qty"),
          (col("sum_price_c") / lit(100.0)).as("sum_price"),
          (col("sum_price_c") / (col("cnt") * lit(100.0))).as("avg_price"),
          col("min_price"), col("max_price"))
    }, Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             cast(sum(cast(round(l_quantity*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
             cast(sum(cast(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
             cast(sum(cast(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / (count(*) * 100.0) AS avg_price,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price
      FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // §2.4 SELECT DISTINCT (SWQM_DISTINCT_LIST)
    ("q03_distinct", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    }, Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // §2.6 ORDER BY multi-key + LIMIT (CreateOrderByIndex semantics)
    ("q04_orderby_limit", (s: SparkSession, dir: String) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(100)
    }, Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100")),

    // §2.2 WHERE: IN / BETWEEN / LIKE / AND (swq_op_registrar set)
    ("q05_filter_pred", (s: SparkSession, dir: String) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O")
          && col("o_totalprice").between(1000.0, 50000.0)
          && col("o_orderpriority").like("1%"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000.0 AND 50000.0
        AND o_orderpriority LIKE '1%'""")),

    // §2.2 LIKE vs ILIKE split (ogr_swq.h:53-54)
    ("q06_like_ilike", (s: SparkSession, dir: String) => {
      t(s, dir, "part")
        .filter(col("p_name").ilike("%A%") && !col("p_name").like("%A%")
          && col("p_name").like("%bolt%"))
        .select(col("p_partkey"), col("p_name"))
    }, Some("""
      SELECT p_partkey, p_name FROM part
      WHERE p_name ILIKE '%A%' AND p_name NOT LIKE '%A%' AND p_name LIKE '%bolt%'""")),

    // §2.3 inner equi-join (swq_parser.y:1088) + group
    ("q07_join_inner", (s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"), sum(cents("o_totalprice")).as("sum_c"))
        .select(col("c_mktsegment"), col("cnt"), (col("sum_c") / lit(100.0)).as("sum_price"))
    }, Some("""
      SELECT c_mktsegment, count(*) AS cnt,
             cast(sum(cast(round(o_totalprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""")),

    // §2.3 LEFT JOIN (swq_parser.y:1094) with null-producing side
    ("q08_join_left", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(cents("o_totalprice")), lit(0L)).as("sum_c"))
        .select(col("c_custkey"), col("n_orders"), (col("sum_c") / lit(100.0)).as("sum_price"))
    }, Some("""
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             coalesce(cast(sum(cast(round(o_totalprice*100) AS BIGINT)) AS BIGINT), 0) / 100.0 AS sum_price
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey""")),

    // §2.3 semi/anti joins (the Clip/Erase relational core)
    ("q09_semi_anti", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("semi").as("tag"), col("n"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("anti").as("tag"), col("n"))
      semi.union(anti)
    }, Some("""
      SELECT 'semi' AS tag, count(*) AS n FROM customer WHERE EXISTS
        (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT 'anti' AS tag, count(*) AS n FROM customer WHERE NOT EXISTS
        (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // §2.3 OGR SQL first-match join semantics (ogr_gensql.cpp:1334,1542):
    // the reference's index nested-loop keeps only the FIRST matching
    // secondary feature per primary row (lowest FID in iteration order),
    // with joined fields NULL when nothing matches. Spark-first shape:
    // reduce the secondary to one row per key with groupBy + min(struct)
    // — partial (map-side) aggregation absorbs hot keys, so a skewed join
    // key never funnels one task — then a plain LEFT equi-join. This
    // closes the multiplicity deviation noted in SURVEY §2.3 (q07/q08
    // keep standard SQL semantics; this entry reproduces the reference's).
    ("q162_join_first_match", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val fm = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(struct(col("o_orderkey").as("ok"), cents("o_totalprice").as("pc"))).as("fm"))
      c.join(fm, c("c_custkey") === fm("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("fm")("ok").as("first_orderkey"),
          (col("fm")("pc") / lit(100.0)).as("first_price"))
    }, Some("""
      WITH fm AS (SELECT o_custkey, min(o_orderkey) AS first_orderkey FROM orders GROUP BY o_custkey)
      SELECT c.c_custkey, c.c_mktsegment, fm.first_orderkey,
             cast(round(o.o_totalprice*100) AS BIGINT) / 100.0 AS first_price
      FROM customer c
      LEFT JOIN fm ON c.c_custkey = fm.o_custkey
      LEFT JOIN orders o ON o.o_custkey = fm.o_custkey AND o.o_orderkey = fm.first_orderkey""")),

    // §2.5 window top-k per group (the kNN top-k pattern, gdalgrid.cpp:309-331)
    ("q10_window_topk", (s: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders) WHERE rn <= 3""")),

    // §2.6 UNION ALL of compatible selects (swq_parser.y:840)
    ("q11_union_all", (s: SparkSession, dir: String) => {
      val sup = t(s, dir, "supplier").select(lit("supplier").as("src"), col("s_nationkey").as("nk"))
      val cus = t(s, dir, "customer").select(lit("customer").as("src"), col("c_nationkey").as("nk"))
      sup.union(cus).groupBy(col("src"), col("nk")).agg(count(lit(1)).as("cnt"))
    }, Some("""
      SELECT src, nk, count(*) AS cnt FROM (
        SELECT 'supplier' AS src, cast(s_nationkey AS INT) AS nk FROM supplier
        UNION ALL
        SELECT 'customer' AS src, cast(c_nationkey AS INT) AS nk FROM customer)
      GROUP BY src, nk""")),

    // §2.2 CAST + CASE (reclassify analog: pixel ranges → classes)
    ("q12_cast_case", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .withColumn("bucket",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("int")).as("sum_qty_i"))
    }, Some("""
      SELECT CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket,
             count(*) AS cnt,
             cast(sum(cast(l_quantity AS INT)) AS BIGINT) AS sum_qty_i
      FROM lineitem GROUP BY 1""")),

    // §2.7 scalar string surface: CONCAT, 1-based SUBSTR, UPPER, LENGTH
    ("q13_string_funcs", (s: SparkSession, dir: String) => {
      t(s, dir, "nation").select(
        col("n_nationkey"),
        substring(col("n_name"), 1, 3).as("pfx"),
        upper(col("n_name")).as("uname"),
        length(col("n_name")).as("len"),
        concat(col("n_name"), lit("-"), col("n_regionkey").cast("string")).as("tagged"))
    }, Some("""
      SELECT cast(n_nationkey AS INT) AS n_nationkey, substr(n_name, 1, 3) AS pfx,
             upper(n_name) AS uname, cast(length(n_name) AS INT) AS len,
             n_name || '-' || cast(n_regionkey AS VARCHAR) AS tagged
      FROM nation""")),

    // §2.7 HSTORE_GET_VALUE analog: extract a keyed value from a props string
    ("q14_props_extract", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .withColumn("k", regexp_replace(col("props"), "[^0-9]", "").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("k").cast("bigint")).as("sum_k"))
    }, Some("""
      SELECT event_type, count(*) AS cnt,
             cast(sum(cast(regexp_replace(props, '[^0-9]', '', 'g') AS INT)) AS BIGINT) AS sum_k
      FROM events GROUP BY event_type""")),

    // date functions over the temporal column
    ("q15_date_group", (s: SparkSession, dir: String) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("cnt"), sum(cents("o_totalprice")).as("sum_c"))
        .select(col("yr"), col("mo"), col("cnt"), (col("sum_c") / lit(100.0)).as("sum_price"))
    }, Some("""
      SELECT cast(year(o_orderdate) AS INT) AS yr, cast(month(o_orderdate) AS INT) AS mo,
             count(*) AS cnt,
             cast(sum(cast(round(o_totalprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
      FROM orders GROUP BY 1, 2""")),

    // event-time tumbling window aggregation (batch form of §2.9; the same
    // groupBy(window(...)) works under readStream — see streaming spec)
    ("q16_events_window", (s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * lit(1000)).cast("bigint")).as("sum_mills"))
        .select(unix_timestamp(col("w.start")).as("hr_epoch"), col("event_type"),
          col("cnt"), (col("sum_mills") / lit(1000.0)).as("sum_value"))
    }, Some("""
      SELECT cast(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr_epoch, event_type,
             count(*) AS cnt,
             cast(sum(cast(round(value*1000) AS BIGINT)) AS BIGINT) / 1000.0 AS sum_value
      FROM events GROUP BY 1, 2""")),

    // sessionization: gap>30min starts a new session (lag + running sum)
    ("q17_sessionize", (s: SparkSession, dir: String) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull
            || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).cast("bigint").as("n_sessions"), count(lit(1)).as("n_events"))
    }, Some("""
      WITH g AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      m AS (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        FROM g)
      SELECT user_id, cast(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
      FROM m GROUP BY user_id""")),

    // §2.6 union layer (OGRUnionLayer schema merge, ogrunionlayer.h:116):
    // concat frames with different schemas, absent columns null
    ("q77_union_layer", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer").select(lit("customer").as("src"),
        col("c_nationkey").cast("int").as("nk"), cents("c_acctbal").as("acctbal_c"))
      val sup = t(s, dir, "supplier").select(lit("supplier").as("src"),
        col("s_nationkey").cast("int").as("nk")) // no acctbal column
      c.unionByName(sup, allowMissingColumns = true)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("cnt"),
          count(col("acctbal_c")).as("n_with_acctbal"),
          coalesce(sum(col("acctbal_c")), lit(0L)).as("sum_acctbal_c"))
    }, Some("""
      SELECT src, count(*) AS cnt,
             count(acctbal_c) AS n_with_acctbal,
             coalesce(CAST(sum(acctbal_c) AS BIGINT), 0) AS sum_acctbal_c
      FROM (
        SELECT 'customer' AS src, CAST(c_nationkey AS INT) AS nk,
               CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c FROM customer
        UNION ALL
        SELECT 'supplier' AS src, CAST(s_nationkey AS INT) AS nk, NULL AS acctbal_c FROM supplier)
      GROUP BY src""")),

    // §2.6 LIMIT/OFFSET (swq_parser.y:1129,1137)
    ("q18_offset_limit", (s: SparkSession, dir: String) => {
      t(s, dir, "orders")
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"))
        .offset(50).limit(20)
    }, Some("SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 50")),

    // §2.3 as-of join (engine-native; absent in the reference — kdb `aj`
    // / DuckDB ASOF JOIN semantics): each click attaches the SAME user's
    // latest view at-or-before it. Engine: TemporalJoin.asOf — two-phase
    // granule prefix, no per-key unbounded window. Unmatched clicks get
    // (-1, 0.0) sentinels (pinned here, not in the operator). The oracle
    // is the textbook single-window formulation; parity across granule
    // widths and vs the one-window plan is TemporalJoinSpec's job.
    ("q163_asof_join", (s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
      graft.ops.TemporalJoin.asOf(clicks, views, "user_id", "ts", "event_id",
          Seq("event_id" -> "asof_view_id", "value" -> "asof_view_val"),
          bucketMicros = 86400000000L)
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_view_id"), lit(-1L)).as("asof_view_id"),
          coalesce(col("asof_view_val"), lit(0.0)).as("asof_view_val"))
    }, Some("""
      WITH u AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id,
               CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side,
               CASE WHEN event_type = 'view' THEN event_id END AS b_id,
               CASE WHEN event_type = 'view' THEN value END AS b_val
        FROM events WHERE event_type IN ('view', 'click')),
      w AS (
        SELECT user_id, event_id, side,
               last_value(b_id IGNORE NULLS) OVER pk AS a_id,
               last_value(b_val IGNORE NULLS) OVER pk AS a_val
        FROM u
        WINDOW pk AS (PARTITION BY user_id ORDER BY tsu, side, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id, coalesce(a_id, -1) AS asof_view_id,
             coalesce(a_val, 0.0) AS asof_view_val
      FROM w WHERE side = 1""")),

    // §2.3 interval join (engine-native; absent in the reference): views
    // inside each purchase's 24 h lookback window, per user — the
    // attribution-window shape. Engine: TemporalJoin.intervalJoin bands
    // the theta-join into a (key, granule) equi-join (4 h granules →
    // ≤7-row fan-out per interval); the left join keeps zero-view
    // purchases. Millicent-quantized sum keeps the compare exact.
    ("q164_interval_join", (s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (unix_micros(col("ts").cast("timestamp")) - lit(86400000000L)).as("lo"),
          unix_micros(col("ts").cast("timestamp")).as("hi"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          round(col("value") * lit(1000)).cast("bigint").as("mills"))
      val pairs = graft.ops.TemporalJoin.intervalJoin(
        purchases, views, "user_id", "lo", "hi", "ts", bucketMicros = 14400000000L)
      val agg = pairs.groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_views"), sum(col("mills")).as("view_mills"))
      purchases.select(col("purchase_id")).join(agg, Seq("purchase_id"), "left")
        .select(col("purchase_id"),
          coalesce(col("n_views"), lit(0L)).as("n_views"),
          coalesce(col("view_mills"), lit(0L)).as("view_mills"))
    }, Some("""
      SELECT p.event_id AS purchase_id,
             count(v.user_id) AS n_views,
             coalesce(CAST(sum(CAST(round(v.value * 1000) AS BIGINT)) AS BIGINT), 0) AS view_mills
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = p.user_id
       AND epoch_us(v.ts) > epoch_us(p.ts) - 86400000000
       AND epoch_us(v.ts) <= epoch_us(p.ts)
      GROUP BY 1""")),

    // §2.4 ROLLUP grouping sets (engine-native Catalyst rollup; the
    // reference's SQL dialect has none — SURVEY marks the row n/a, this
    // closes it with the builtin). Subtotal levels surface as 'ALL'.
    ("q165_rollup", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(cents("l_quantity")).as("sum_qty_c"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("sum_qty_c"))
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS cnt,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""))
  )
}
