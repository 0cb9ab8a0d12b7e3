package graft.queries

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational/analytic query surface (SURVEY.md §2.6 Engine column).
  *
  * The reference outsources all relational algebra to Postgres/MySQL
  * (postgresql_mysql_sync_dag.py:48-50 does a hand-pushed ranged scan;
  * everything else is row-at-a-time Python). Here the same surface is
  * declared with the DataFrame API and Catalyst supplies pushdown,
  * pruning, join selection, partial aggregation and codegen.
  *
  * Every query is paired with ANSI SQL for the DuckDB oracle. Numeric
  * rules for cross-engine determinism live in [[graft.Num]].
  */
object Analytics {

  /** revenue expression shared by the TPC-H-shaped queries */
  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val qs: Seq[Q] = Seq(
    Q(
      "q1_agg",
      "TPC-H Q1 shape: scan+filter+hash-agg (partial/final) + sort. " +
        "Exercises pushdown of the shipdate predicate into the parquet scan.",
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_price,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.trim),
      (spark, dir) => {
        val li = Tables(spark, dir).lineitem
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            Num.dsum(col("l_quantity")).as("sum_qty"),
            Num.dsum(col("l_extendedprice")).as("sum_base_price"),
            Num.dsum(rev, 6).as("sum_disc_price"),
            Num.dsum(rev * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
            Num.davg(col("l_quantity")).as("avg_qty"),
            Num.davg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"),
          )
      },
    ),
    Q(
      "q2_scan_filter",
      "Selective scan + projection; both the p_size range and p_type equality " +
        "must appear in PushedFilters, and ReadSchema must carry only 4 columns.",
      Some("""
        SELECT p_partkey, p_name, p_retailprice
        FROM part WHERE p_size BETWEEN 1 AND 15 AND p_type = 'PROMO'
        ORDER BY p_partkey
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).part
          .filter(col("p_size").between(1, 15) && col("p_type") === "PROMO")
          .select("p_partkey", "p_name", "p_retailprice")
      },
    ),
    Q(
      "q3_topk_join",
      "TPC-H Q3 shape: 3-way join, agg, top-k. The customer side is a selective " +
        "dimension — broadcast, not shuffled. Top-k = TakeOrderedAndProject, no full sort.",
      Some("""
        SELECT l_orderkey,
          CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
          o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        t.lineitem
          .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
          .join(
            t.orders.filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          // customer scales with data size: no broadcast hint — AQE picks
          // broadcast at small SF and shuffle-hash/sort-merge at 100 TB.
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(Num.dsum(rev, 6).as("revenue"))
          .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
    ),
    Q(
      "q4_join_agg_multi",
      "TPC-H Q5 shape: 5-way join through two broadcast dims (nation, region), " +
        "revenue per nation. Region/nation are tiny: broadcast; orders⋈lineitem shuffles on orderkey.",
      Some("""
        SELECT n_name,
          CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val asiaNations = t.nation
          .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        t.lineitem
          .join(
            t.orders.filter(
              col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          // customer is a fact-scale table (no broadcast hint; see q3 note) —
          // only the fixed-cardinality dims nation/region get hints.
          .join(t.customer.select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(Num.dsum(rev, 6).as("revenue"))
      },
    ),
    Q(
      "q5_selective_agg",
      "TPC-H Q6 shape: fully-pushed selective filters, single global aggregate " +
        "(no shuffle beyond the final 1-row partial merge).",
      Some("""
        SELECT
          CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
          count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).lineitem
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
          .agg(
            Num.dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
            count(lit(1)).as("n"))
      },
    ),
    Q(
      "q6_semi_join",
      "EXISTS / left-semi join: orders having at least one returned lineitem. " +
        "Semi-join avoids materializing the probe side's payload columns.",
      Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        ORDER BY o_orderkey
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders
          .join(t.lineitem.filter(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
      },
    ),
    Q(
      "q7_anti_join",
      "NOT EXISTS / left-anti join: customers with no urgent orders.",
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.customer
          .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
    ),
    Q(
      "q8_distinct_agg",
      "count(DISTINCT) per group — expands to a two-phase aggregate; " +
        "the first phase dedups (partial) before the shuffle.",
      Some("""
        SELECT l_returnflag,
          count(DISTINCT l_partkey) AS n_parts,
          count(DISTINCT l_suppkey) AS n_supps,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).lineitem
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n"))
      },
    ),
    Q(
      "q9_topk_sort",
      "Global top-k: planned as TakeOrderedAndProject (per-partition heap + " +
        "driver merge), never a full sort at scale.",
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).orders
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(25)
      },
    ),
    Q(
      "q10_window_rank",
      "Ranking window: top-3 orders per customer by totalprice. " +
        "Single shuffle on the partition key; rank filter applied post-window.",
      Some("""
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
          FROM orders) t
        WHERE rn <= 3 ORDER BY o_custkey, rn
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables(spark, dir).orders
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
    ),
    Q(
      "q102_window_dist",
      "Distribution window functions over one keyed partitioning: " +
        "ntile(4) quartile bucket, percent_rank, cume_dist, and dense " +
        "ranking per customer's orders — all integer rank arithmetic or " +
        "one IEEE division ((rank-1)/(n-1), rank/n), so cross-engine " +
        "hash-exact; ONE shuffle on the key serves all four.",
      Some("""
        SELECT o_custkey, o_orderkey,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pct_rank,
          cume_dist() OVER w AS cume,
          CAST(dense_rank() OVER w AS BIGINT) AS drank
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables(spark, dir).orders
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            dense_rank().over(w).cast("long").as("drank"))
      },
    ),
    Q(
      "q11_window_running",
      "Running-frame window: cumulative event value + lag per user. Decimal " +
        "accumulation keeps the running sum order-independent across engines.",
      Some("""
        SELECT user_id, event_id,
          CAST(sum(CAST(value AS DECIMAL(30,2))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
          lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events WHERE user_id < 20 ORDER BY user_id, event_id
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(spark, dir).events
          .filter(col("user_id") < 20)
          .select(
            col("user_id"), col("event_id"),
            Num.dsumRaw(col("value")).over(run).cast("double").as("running_value"),
            lag(col("value"), 1).over(w).as("prev_value"))
      },
    ),
    Q(
      "q64_range_frame",
      "RANGE-frame window: per-customer sliding 90-day order total over a " +
        "numeric day key. RANGE frames bound by VALUE distance (all peers " +
        "included), unlike q11's ROWS frame; decimal accumulation keeps the " +
        "sliding sum order-independent across engines.",
      Some("""
        SELECT o_orderkey, o_custkey,
          CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
          CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
            RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_90d
        FROM orders ORDER BY o_orderkey
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("d")).rangeBetween(-90, 0)
        Tables(spark, dir).orders
          .withColumn("d",
            datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01"))).cast("long"))
          .select(
            col("o_orderkey"), col("o_custkey"), col("d"),
            Num.dsumRaw(col("o_totalprice")).over(w).cast("double").as("sum_90d"))
      },
    ),
    Q(
      "q12_setops",
      "Set operations: INTERSECT/EXCEPT of customer keys vs. ordering customers.",
      Some("""
        WITH both_k AS (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders),
             no_k   AS (SELECT c_custkey AS k FROM customer EXCEPT    SELECT o_custkey FROM orders)
        SELECT k, 'both' AS tag FROM both_k
        UNION ALL
        SELECT k, 'no_orders' AS tag FROM no_k
        ORDER BY tag, k
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val ck = t.customer.select(col("c_custkey").as("k"))
        val ok = t.orders.select(col("o_custkey").as("k"))
        ck.intersect(ok).withColumn("tag", lit("both"))
          .unionAll(ck.except(ok).withColumn("tag", lit("no_orders")))
      },
    ),
    Q(
      "q13_rollup",
      "ROLLUP hierarchy totals with GROUPING flags; null-safe ordering pinned " +
        "explicitly (engines disagree on default null order).",
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
          CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
          CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).lineitem
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            Num.dsum(col("l_quantity")).as("sum_qty"),
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"))
      },
    ),
    Q(
      "q14_pivot",
      "Pivot: per-user event-type counts as columns (explicit value list so the " +
        "plan needs no extra pass to discover pivot values).",
      Some("""
        SELECT user_id,
          count(*) FILTER (WHERE event_type = 'click')    AS click,
          count(*) FILTER (WHERE event_type = 'error')    AS error,
          count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
          count(*) FILTER (WHERE event_type = 'signup')   AS signup,
          count(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events GROUP BY user_id ORDER BY user_id
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).events
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
      },
    ),
    Q(
      "q15_having",
      "Aggregate + HAVING post-filter.",
      Some("""
        SELECT p_brand, count(*) AS n,
          CAST(sum(CAST(p_retailprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM part GROUP BY p_brand HAVING count(*) > 50 ORDER BY p_brand
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).part
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), Num.dsum(col("p_retailprice")).as("sum_price"))
          .filter(col("n") > 50)
      },
    ),
    Q(
      "q16_scalar_string",
      "Scalar string functions: upper/substring/concat_ws/length/lpad/LIKE — " +
        "all codegen'd expressions, no UDFs.",
      Some("""
        SELECT c_custkey,
          upper(c_name) AS uname,
          substring(c_name, 10, 8) AS cnum,
          concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
          CAST(length(c_name) AS BIGINT) AS name_len,
          lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
          (c_mktsegment LIKE 'B%') AS is_building
        FROM customer WHERE c_custkey < 200
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).customer
          .filter(col("c_custkey") < 200)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("uname"),
            substring(col("c_name"), 10, 8).as("cnum"),
            concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("seg_nat"),
            length(col("c_name")).cast("long").as("name_len"),
            lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
            col("c_mktsegment").like("B%").as("is_building"))
      },
    ),
    Q(
      "q17_scalar_date",
      "Scalar date/time functions: extract, truncate, epoch, day difference.",
      Some("""
        SELECT o_orderkey,
          CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(month(o_orderdate) AS BIGINT) AS mo,
          CAST(day(o_orderdate) AS BIGINT) AS dom,
          CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
          CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
          CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
        FROM orders WHERE o_orderkey < 500
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).orders
          .filter(col("o_orderkey") < 500)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      },
    ),
    Q(
      "q18_events_hourly",
      "Event-time tumbling aggregation (batch analog of the streaming hourly " +
        "window; see graft.streaming for the watermarked streaming twin).",
      Some("""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
          count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).events
          .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
          .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      },
    ),
    Q(
      "q19_events_json",
      "Semi-structured extraction: JSON path into the props payload " +
        "(reference parses JSON message bodies at sqs_sensor_dag.py:70).",
      Some("""
        SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        FROM events WHERE event_type = 'purchase'
      """.trim),
      (spark, dir) => {
        // plain orderBy: the single get_json_object projection is cheap
        // enough that Sorting.projected's extra range shuffle measured
        // SLOWER than the sampling double-parse it avoids
        Tables(spark, dir).events
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      },
    ),
    Q(
      "q20_scalar_subquery",
      "Scalar subquery in a predicate (SQL entry path: exercises the parser/" +
        "analyzer, subquery decorrelation, and the same decimal-exact mean).",
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) FROM orders)
        ORDER BY o_orderkey
      """.trim),
      (spark, dir) => {
        // Query-scoped view name: never clobber a caller's "orders" view
        // (shared-session catalog state). spark.sql analyzes eagerly, so the
        // view can be dropped as soon as the plan is resolved.
        val t = Tables(spark, dir)
        val view = "graft_q20_orders"
        t.orders.createOrReplaceTempView(view)
        try
          spark.sql(s"""
            SELECT o_orderkey, o_totalprice FROM $view
            WHERE o_totalprice > 1.5 * (
              SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) FROM $view)
            ORDER BY o_orderkey
          """)
        finally spark.catalog.dropTempView(view)
      },
    ),
    Q(
      "q114_ewma",
      "Exponential smoothing: per-user zero-seeded EWMA (alpha = 1/2) of " +
        "event values in (ts, event_id) order. Halving is an exact " +
        "exponent shift and both engines fold the same ordered list left " +
        "to right, so the smoothed values are bit-identical. Same ordered " +
        "per-key fold family as the funnel (one shuffle on the key; a " +
        "pathological hot key buffers in one task — the documented " +
        "contract, FunnelHotKeySpec's bound applies).",
      Some("""
        WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS seq
                   FROM events WHERE user_id < 100 GROUP BY user_id)
        SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(seq, ew_v -> CAST(ew_v AS DOUBLE))),
                      (ew_acc, ew_x) -> (ew_acc + ew_x) / 2.0) AS ewma
        FROM s
      """.trim),
      (spark, dir) =>
        Tables(spark, dir).events
          .filter(col("user_id") < 100)
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("__seq"))
          .selectExpr(
            "user_id",
            "CAST(size(__seq) AS BIGINT) AS n_events",
            "aggregate(__seq, CAST(0.0 AS DOUBLE), (ew_acc, ew_x) -> (ew_acc + CAST(ew_x.value AS DOUBLE)) / 2.0) AS ewma"),
    ),
    Q(
      "q113_interval_overlap",
      "Interval overlap join (bucketized): per-user-per-day activity " +
        "windows [min ts, max ts], all same-day user pairs whose windows " +
        "intersect, with the exact microsecond overlap. Candidates come " +
        "from ONE equi-join on exploded hour buckets — never an n-squared " +
        "inequality product — and a pair is emitted once WITHOUT a " +
        "distinct: only its overlap-start bucket keeps it. The oracle is " +
        "the plain declarative inequality join.",
      Some("""
        WITH iv AS (SELECT user_id, CAST(ts AS DATE) AS day, min(ts) AS s, max(ts) AS e
                    FROM events WHERE user_id < 50 GROUP BY user_id, CAST(ts AS DATE))
        SELECT a.day, a.user_id AS user_a, b.user_id AS user_b,
          CAST(epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)) AS BIGINT) AS overlap_us
        FROM iv a JOIN iv b
          ON a.day = b.day AND a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
      """.trim),
      (spark, dir) => {
        // interval identity: user*100000 + epoch-day — same-day pairs
        // order by user_id, matching the oracle's a.user_id < b.user_id
        // (cross-day intervals never overlap in time)
        val iv = Tables(spark, dir).events
          .filter(col("user_id") < 50)
          .groupBy(col("user_id"), col("ts").cast("date").as("day"))
          .agg(min("ts").as("s"), max("ts").as("e"))
          .withColumn("iv_id",
            col("user_id") * 100000L + expr("CAST(datediff(day, DATE'1970-01-01') AS BIGINT)"))
        graft.operators.TimeSeries
          .intervalOverlaps(iv, "iv_id", "s", "e", carry = Seq("user_id", "day"))
          .select(col("day_a").as("day"), col("user_id_a").as("user_a"),
            col("user_id_b").as("user_b"), col("overlap_us"))
      },
    ),
    Q(
      "q111_transitions",
      "Clickstream transition matrix (first-order Markov): per ordered " +
        "(event, next-event) pair within a user's stream, the count and " +
        "the conditional probability p(to|from) — the path-analysis op " +
        "behind funnels and next-action models. One shuffle on the user " +
        "key serves the lead window; the matrix agg and the per-source " +
        "totals join are event-type-cardinality tiny; one exact division.",
      Some("""
        WITH s AS (SELECT user_id, event_type,
                     lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                   FROM events),
        c AS (SELECT event_type AS from_type, nxt AS to_type, CAST(count(*) AS BIGINT) AS n
              FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n,
          CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
        FROM c JOIN t ON c.from_type = t.from_type
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pairs = Tables(spark, dir).events
          .select(col("event_type").as("from_type"), lead(col("event_type"), 1).over(w).as("to_type"))
          .filter(col("to_type").isNotNull)
          .groupBy("from_type", "to_type").agg(count(lit(1)).cast("long").as("n"))
        val tot = pairs.groupBy(col("from_type")).agg(sum("n").cast("long").as("tot"))
        pairs.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast("double") / col("tot").cast("double")).as("p"))
      },
    ),
    Q(
      "q110_profile",
      "Column profiling (dbt-docs / deequ-summary shape): per-column row " +
        "count, nulls, EXACT distinct count, min/max (numerics + " +
        "epoch-micros timestamps as doubles, strings as strings) over " +
        "five lineitem columns. ONE aggregation pass — the multi-distinct " +
        "expands through Spark's Expand (rows x profiled cols, the " +
        "standard profiling cost); the 1-row result unpivots via stack.",
      Some({
        def entry(c: String, mn: String, mx: String, mns: String, mxs: String) = s"""
          SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS n_null,
            CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
            $mn AS min_num, $mx AS max_num, $mns AS min_str, $mxs AS max_str
          FROM lineitem"""
        def num(c: String) = entry(c, s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        def str(c: String) = entry(c, "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
        def ts(c: String) = entry(c, s"CAST(min(epoch_us($c)) AS DOUBLE)",
          s"CAST(max(epoch_us($c)) AS DOUBLE)", "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        Seq(num("l_orderkey"), num("l_quantity"), num("l_extendedprice"),
          str("l_returnflag"), ts("l_shipdate")).mkString(" UNION ALL ")
      }),
      (spark, dir) =>
        graft.operators.Stats.profile(Tables(spark, dir).lineitem,
          Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")),
    ),
    Q(
      "q235_profile_approx",
      "Sketched column profiling — q110's 100 TB first-look twin: ndv " +
        "via HyperLogLog++ (approx_count_distinct, rsd 2%) instead of " +
        "the exact Expand-based multi-distinct, so every stat is an " +
        "ordinary partially-aggregable function and the whole profile " +
        "is ONE map-side combine pass with a 1-row-per-partition " +
        "exchange — no input x cols Expand, no per-column dedup " +
        "shuffle (PlanSpecs pins the plan). Sketch values are engine-" +
        "specific, so the oracled output is the error GATE the q55 " +
        "way: exact profile columns plus whether each column's HLL " +
        "landed within 10% (2 sigma at the 5% rsd) of its exact ndv. " +
        "One column per type class " +
        "(numeric/string/timestamp) — the gate prices the SKETCH, not " +
        "a second copy of q110's 5-way exact Expand.",
      Some({
        def entry(c: String, mn: String, mx: String, mns: String, mxs: String) = s"""
          SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS n_null,
            CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
            $mn AS min_num, $mx AS max_num, $mns AS min_str, $mxs AS max_str,
            true AS ndv_within_10pct
          FROM lineitem"""
        def num(c: String) = entry(c, s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        def str(c: String) = entry(c, "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
        def ts(c: String) = entry(c, s"CAST(min(epoch_us($c)) AS DOUBLE)",
          s"CAST(max(epoch_us($c)) AS DOUBLE)", "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        Seq(num("l_orderkey"), str("l_returnflag"), ts("l_shipdate")).mkString(" UNION ALL ")
      }),
      (spark, dir) => {
        val t = Tables(spark, dir).lineitem
        val cols = Seq("l_orderkey", "l_returnflag", "l_shipdate")
        // the sketch pass is the operator under test; the exact pass
        // exists to PRICE it (the oracle hashes literal trues, so a
        // drifting sketch fails the round gate). 5-row sides: broadcast.
        val ap = graft.operators.Stats.profileApprox(t, cols, rsd = 0.05)
          .select(col("col_name"), col("ndv").as("__andv"))
        graft.operators.Stats.profile(t, cols)
          .join(broadcast(ap), "col_name")
          .select(col("col_name"), col("n"), col("n_null"), col("ndv"),
            col("min_num"), col("max_num"), col("min_str"), col("max_str"),
            (abs(col("__andv").cast("double") - col("ndv").cast("double"))
              / col("ndv").cast("double") <= lit(0.10)).as("ndv_within_10pct"))
      },
    ),
    Q(
      "q121_pagerank",
      "PageRank centrality over the part co-purchase graph (parts linked " +
        "when they share an order), 5 damped iterations in EXACT scaled-" +
        "integer arithmetic (graft.operators.PageRank): float PageRank " +
        "sums are association-dependent, the BIGINT formulation is bit-" +
        "identical on any partitioning — so an ITERATIVE graph algorithm " +
        "hash-matches the oracle's chained-CTE power iteration exactly. " +
        "Per iteration: one keyed join onto the degree-annotated edge " +
        "list + one partial-agg contribution shuffle, work ∝ |E|.",
      Some(pagerankOracleSql(iters = 5)),
      (spark, dir) => {
        // edge build via the audited helper: the (orderkey, partkey)
        // self-join is Σ|order|² — fine on TPC-H's ≤7-lineitem orders,
        // quadratic death on a 100 TB corpus with a sentinel order, so
        // the eager mega-basket audit gates it (VERDICT r10 watch #2)
        val edges = graft.operators.Graph.coMembershipEdges(
          Tables(spark, dir).lineitem, "l_orderkey", "l_partkey")
        graft.operators.PageRank.runInt(edges, "src", "dst", iters = 5)
          .select(col("node").as("part_id"), col("pr_scaled"))
      },
    ),
  ) ++ Seq(skylineQ, regressionQ, ohlcQ, centroidsQ, winsorizeQ,
    basketPairsQ, trianglesQ, bfsQ, recursiveSqlQ, seasonalQ, madOutliersQ, cusumQ,
    keySkewQ, rollingCorrQ)

  private lazy val seasonalQ = Q(
    "q219_seasonal_dow",
    "Classical seasonal decomposition (the centered-moving-average STL " +
      "member, exact-arithmetic variant): per event_type the daily " +
      "series aggregates in integer CENTS, the trend is a centered " +
      "7-ROW window (edges drop out, textbook MA semantics), the " +
      "day-of-week effect is the mean detrended deviation computed as " +
      "7*daily - sum7 — NO division until the final mean, so the only " +
      "floating step is one IEEE division chain of exact BIGINTs, " +
      "bit-identical cross-engine (the q114/q126/q127 discipline). One " +
      "keyed day shuffle + one days-per-key window; raw events are " +
      "touched once.",
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT)) AS BIGINT) AS daily
        FROM events GROUP BY 1, 2
      ),
      t AS (
        SELECT event_type, day, daily,
               sum(daily) OVER w AS sum7, count(*) OVER w AS n7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      ),
      d AS (SELECT event_type, day, daily * 7 - sum7 AS dev FROM t WHERE n7 = 7)
      SELECT event_type, CAST(extract(isodow FROM day) AS BIGINT) AS isodow,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(dev) AS DOUBLE) / 100.0 / 7.0 / CAST(count(*) AS DOUBLE) AS seasonal
      FROM d GROUP BY 1, 2
    """.trim),
    (spark, dir) =>
      graft.operators.TimeSeries.seasonalDow(
        Tables(spark, dir).events, "event_type", "ts", "value"),
  )

  /** q132's BFS re-entered through Spark's OWN recursive-CTE executor
    * (`WITH RECURSIVE`, new in Spark 4 — the UnionLoop operator): the
    * engine iterates anchor ∪ step until the depth guard empties the
    * frontier, vs q132's hand-rolled frontier-join loop. Same graph,
    * same oracle, third evaluation strategy — exact integer agreement
    * pins all three. UNION ALL recursion enumerates WALKS, so the
    * depth bound (< 3) is what keeps a cyclic graph finite; the
    * min(d)-per-node rollup collapses walk multiplicity exactly like
    * the oracle's UNION-dedup recursion.
    */
  private lazy val recursiveSqlQ = Q(
    "q218_recursive_sql",
    "Bounded BFS as a SQL-string recursive CTE run by Spark's native " +
      "WITH RECURSIVE executor (UnionLoop): anchor = the co-purchase " +
      "graph's max-degree part, step = one undirected hop, depth < 3. " +
      "Shares q132's oracle verbatim — Spark's frontier-join loop, " +
      "Spark's recursive executor, and DuckDB's recursive CTE must " +
      "agree on exact hop counts.",
    Some(coPurchaseSql + """,
      u AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      s AS (SELECT src AS node FROM (SELECT src, count(*) AS d FROM u GROUP BY 1
                                     ORDER BY d DESC, src LIMIT 1)),
      r AS (SELECT node, 0 AS d FROM s
            UNION
            SELECT u.dst, r.d + 1 FROM r JOIN u ON u.src = r.node WHERE r.d < 3)
      SELECT node AS part_id, CAST(min(d) AS BIGINT) AS hops FROM r GROUP BY 1
    """),
    (spark, dir) => {
      coPurchaseEdges(spark, dir).createOrReplaceTempView("copurchase_edges")
      spark.sql("""
        WITH RECURSIVE
        u AS (SELECT src, dst FROM copurchase_edges
              UNION SELECT dst, src FROM copurchase_edges),
        s AS (SELECT src AS node FROM (SELECT src, count(*) AS d FROM u
                                       GROUP BY src ORDER BY d DESC, src LIMIT 1)),
        r(node, d) AS (
          SELECT node, 0 FROM s
          UNION ALL
          SELECT u.dst, r.d + 1 FROM r JOIN u ON u.src = r.node WHERE r.d < 3
        )
        SELECT node AS part_id, CAST(min(d) AS BIGINT) AS hops FROM r GROUP BY node
      """)
    },
  )

  private lazy val rollingCorrQ = Q(
    "q137_rolling_corr",
    "Rolling 7-day Pearson correlation between click and view daily " +
      "revenue totals: the co-movement diagnostic. Daily totals are " +
      "exact DECIMAL(18,2) sums (one keyed shuffle); the six trailing-" +
      "frame sums are exact decimal window aggregates over the DAY " +
      "series (365 rows/year, not raw events); corr is one fixed IEEE " +
      "expression tree over their double casts. Zero-variance and " +
      "partial frames are dropped. graft.operators.TimeSeries" +
      ".rollingCorr.",
    Some("""
      WITH d AS (SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(30,2))
                             ELSE CAST(0.00 AS DECIMAL(30,2)) END) AS DECIMAL(18,2)) AS x,
               CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(30,2))
                             ELSE CAST(0.00 AS DECIMAL(30,2)) END) AS DECIMAL(18,2)) AS y
             FROM events GROUP BY 1),
      w AS (SELECT day,
              CAST(count(*) OVER win AS BIGINT) AS n,
              sum(x) OVER win AS sx, sum(y) OVER win AS sy,
              sum(x * y) OVER win AS sxy,
              sum(x * x) OVER win AS sxx, sum(y * y) OVER win AS syy
            FROM d WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT day, n AS n_rows,
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
      FROM w
      WHERE n = 7
        AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
    """.trim),
    (spark, dir) => {
      val daily = Tables(spark, dir).events
        .selectExpr("CAST(ts AS DATE) AS day",
          "CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(30,2)) ELSE CAST(0.00 AS DECIMAL(30,2)) END AS xv",
          "CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(30,2)) ELSE CAST(0.00 AS DECIMAL(30,2)) END AS yv")
        .groupBy("day")
        .agg(sum("xv").cast(DecimalType(18, 2)).as("x"), sum("yv").cast(DecimalType(18, 2)).as("y"))
      graft.operators.TimeSeries.rollingCorr(daily, "day", "x", "y", window = 7)
    },
  )

  private lazy val keySkewQ = Q(
    "q136_key_skew",
    "Key-skew diagnostic (the measurement behind salting / AQE-split " +
      "decisions): top-10 hottest user_ids with row share, plus exact " +
      "corpus stats — key count, max and p99 multiplicity, and the Gini " +
      "coefficient of the key distribution from the frequency-of-" +
      "frequency table (the only ordered window runs over |distinct " +
      "multiplicities| rows, never a global key sort; Gini is a ratio " +
      "of exact DECIMAL(38,0) rank-block sums, one IEEE division). " +
      "graft.operators.Skew.keySkewProfile.",
    Some("""
      WITH f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
                 FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      ff AS (SELECT cnt, CAST(count(*) AS BIGINT) AS k FROM f GROUP BY 1),
      c AS (SELECT cnt, k, sum(k) OVER (ORDER BY cnt) AS cumk FROM ff),
      n AS (SELECT sum(cnt * (2 * cumk - k + 1) * k) AS s2,
                   CAST(sum(k) AS BIGINT) AS n_keys,
                   CAST(sum(cnt * k) AS BIGINT) AS n_rows,
                   CAST(max(cnt) AS BIGINT) AS max_cnt
            FROM c),
      p AS (SELECT CAST(min(cnt) AS BIGINT) AS p99_cnt
            FROM c CROSS JOIN n WHERE cumk >= (n.n_keys * 9900 + 9999) // 10000),
      g AS (SELECT n.n_keys, n.n_rows, n.max_cnt, p.p99_cnt,
              CAST(n.s2 - (n.n_keys + 1) * n.n_rows AS DOUBLE)
                / CAST(n.n_keys * n.n_rows AS DOUBLE) AS gini
            FROM n CROSS JOIN p)
      SELECT t.user_id, t.cnt,
        CAST(t.cnt AS DOUBLE) / CAST(g.n_rows AS DOUBLE) AS share,
        g.n_keys, g.n_rows, g.max_cnt, g.p99_cnt, g.gini
      FROM (SELECT user_id, cnt FROM f ORDER BY cnt DESC, user_id LIMIT 10) t
      CROSS JOIN g
    """.trim),
    (spark, dir) =>
      graft.operators.Skew.keySkewProfile(
        Tables(spark, dir).events.select("user_id"), "user_id", topK = 10),
  )

  private lazy val madOutliersQ = Q(
    "q134_mad_outliers",
    "Robust outlier detection: events whose |value − median| > 3·MAD " +
      "for their type (median absolute deviation — 50% breakdown point " +
      "where q97's mean-based fences have 0%). Two exact histogram-" +
      "median passes + two broadcast-sized cutoff joins; deviations are " +
      "single IEEE subtracts of identically-computed doubles, so the " +
      "flagged SET is bit-identical. graft.operators.Stats.madOutliers.",
    Some("""
      WITH h AS (SELECT event_type, value, count(*) AS cnt FROM events GROUP BY 1, 2),
      c AS (SELECT event_type, value, cnt,
              sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS n_rows FROM h),
      m AS (SELECT event_type,
              (min(CASE WHEN cum >= (n_rows + 1) // 2 THEN value END)
               + min(CASE WHEN cum >= n_rows // 2 + 1 THEN value END)) / 2.0 AS med
            FROM c GROUP BY event_type),
      d AS (SELECT e.event_id, e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
            FROM events e JOIN m USING (event_type)),
      h2 AS (SELECT event_type, dev, count(*) AS cnt FROM d GROUP BY 1, 2),
      c2 AS (SELECT event_type, dev, cnt,
              sum(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS n_rows FROM h2),
      m2 AS (SELECT event_type,
              (min(CASE WHEN cum >= (n_rows + 1) // 2 THEN dev END)
               + min(CASE WHEN cum >= n_rows // 2 + 1 THEN dev END)) / 2.0 AS mad
            FROM c2 GROUP BY event_type)
      SELECT d.event_id, d.event_type, d.value, d.med, m2.mad
      FROM d JOIN m2 USING (event_type)
      WHERE d.dev > 3.0 * m2.mad
    """.trim),
    (spark, dir) =>
      graft.operators.Stats.madOutliers(
        Tables(spark, dir).events.select("event_id", "event_type", "value"),
        Seq("event_type"), "value", k = 3.0)
        .select("event_id", "event_type", "value", "med", "mad"),
  )

  private lazy val cusumQ = Q(
    "q135_cusum",
    "CUSUM change detection: per-user one-sided cumulative sum of " +
      "mean-centered values in (ts, event_id) order — final statistic " +
      "and running max (a sustained level shift accumulates where " +
      "mean/stddev wash out). Same bit-exact ordered-fold family as " +
      "q114's EWMA. graft.operators.TimeSeries.cusum.",
    Some("""
      WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS seq,
                   CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS mu
                 FROM events WHERE user_id < 100 GROUP BY user_id),
      f AS (SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events, mu,
              list_reduce(
                list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                  list_transform(seq, cs_v -> [CAST(cs_v AS DOUBLE), CAST(0.0 AS DOUBLE)])),
                (cs_acc, cs_x) -> [
                  greatest(cs_acc[1] + cs_x[1] - mu, CAST(0.0 AS DOUBLE)),
                  greatest(cs_acc[2],
                    greatest(cs_acc[1] + cs_x[1] - mu, CAST(0.0 AS DOUBLE)))]) AS f
            FROM s)
      SELECT user_id, n_events, mu, f[1] AS cusum_final, f[2] AS cusum_max FROM f
    """.trim),
    (spark, dir) =>
      graft.operators.TimeSeries.cusum(
        Tables(spark, dir).events.filter(col("user_id") < 100),
        "user_id", Seq("ts", "event_id"), "value"),
  )

  /** Shared DuckDB prefix for q130–q132: the thresholded co-purchase
    * graph (parts are linked when they share ≥ 2 distinct orders —
    * the ≥ 2 support cut drops the long random-pair tail, keeping the
    * edge set sparse at every scale factor).
    */
  // def, not val: the lazy q130–q132 entries are forced while `qs`
  // initializes, BEFORE a later-declared val would be assigned (the
  // object-init trap that bit q115's constants).
  private def coPurchaseSql: String =
    """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |p AS (SELECT a.pk AS src, b.pk AS dst, CAST(count(*) AS BIGINT) AS n_co
      |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      |e AS (SELECT src, dst FROM p WHERE n_co >= 2)""".stripMargin

  /** Spark twin of [[coPurchaseSql]]'s `e`: src < dst, support ≥ 2.
    * Persisted once per corpus via Artifacts (the graph is a derived
    * artifact like the phrase/LSH indexes — q131/q132's analytics read
    * it, they don't re-derive it per query; the oracle recomputes it
    * every time, the documented build/serve asymmetry).
    */
  private def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val p = graft.Artifacts.cached(s"copurchase:$dir") { path =>
      val li = Tables(spark, dir).lineitem
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      li.toDF("ok", "src").join(li.toDF("ok", "dst"), "ok")
        .filter(col("src") < col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).cast("long").as("n_co"))
        .filter(col("n_co") >= 2)
        .select("src", "dst")
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(p)
  }

  private lazy val basketPairsQ = Q(
    "q130_basket_pairs",
    "Market-basket association mining: top-100 co-purchased part pairs " +
      "by support with exact lift = n_co·n_baskets / (n_a·n_b) (all-" +
      "BIGINT ratio, one IEEE division — bit-identical on any " +
      "partitioning). One pair self-join ∝ Σ|basket|², one keyed agg, " +
      "broadcast item counts; top-k plans TakeOrderedAndProject, no " +
      "full sort. graft.operators.Graph.coOccurrence.",
    Some("""
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      p AS (SELECT a.pk AS src, b.pk AS dst, CAST(count(*) AS BIGINT) AS n_co
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nb FROM li),
      i AS (SELECT pk, CAST(count(*) AS BIGINT) AS ni FROM li GROUP BY 1)
      SELECT p.src, p.dst, p.n_co,
        CAST(p.n_co * n.nb AS DOUBLE) / CAST(ia.ni * ib.ni AS DOUBLE) AS lift
      FROM p JOIN i ia ON ia.pk = p.src JOIN i ib ON ib.pk = p.dst CROSS JOIN n
      WHERE p.n_co >= 2
      ORDER BY p.n_co DESC, p.src, p.dst
      LIMIT 100
    """.trim),
    (spark, dir) => {
      val li = Tables(spark, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.coOccurrence(li, "l_orderkey", "l_partkey", minCo = 2)
        .orderBy(col("n_co").desc, col("src"), col("dst")).limit(100)
    },
  )

  private lazy val trianglesQ = Q(
    "q131_triangles",
    "Per-node triangle counts on the co-purchase graph — community " +
      "density around each part. Spark runs degree-ordered compact-" +
      "forward (wedges enumerated at their lowest-degree apex, " +
      "O(|E|^1.5) regardless of hub skew); the oracle runs the naive " +
      "id-ordered 3-way join — the hash-match is the equivalence " +
      "theorem between them. graft.operators.Graph.triangleCounts.",
    Some(coPurchaseSql.replace("WITH RECURSIVE", "WITH") + """,
      t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
            FROM e e1 JOIN e e2 ON e1.dst = e2.src
            JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
      v AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
      SELECT node AS part_id, CAST(count(*) AS BIGINT) AS n_tri FROM v GROUP BY 1
    """),
    (spark, dir) =>
      graft.operators.Graph.triangleCounts(coPurchaseEdges(spark, dir))
        .select(col("node").as("part_id"), col("n_tri")),
  )

  private lazy val bfsQ = Q(
    "q132_bfs",
    "Bounded BFS: exact hop distances within 3 undirected hops of the " +
      "co-purchase graph's max-degree part (the influence-neighborhood " +
      "primitive). Spark iterates frontier-join + anti-join-visited " +
      "with localCheckpoint-flattened lineage; the oracle is a " +
      "depth-bounded recursive CTE with min(d) per node — two very " +
      "different evaluation strategies, one exact integer result.",
    Some(coPurchaseSql + """,
      u AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      s AS (SELECT src AS node FROM (SELECT src, count(*) AS d FROM u GROUP BY 1
                                     ORDER BY d DESC, src LIMIT 1)),
      r AS (SELECT node, 0 AS d FROM s
            UNION
            SELECT u.dst, r.d + 1 FROM r JOIN u ON u.src = r.node WHERE r.d < 3)
      SELECT node AS part_id, CAST(min(d) AS BIGINT) AS hops FROM r GROUP BY 1
    """),
    (spark, dir) =>
      graft.operators.Graph.bfsHops(coPurchaseEdges(spark, dir), maxHops = 3)
        .select(col("node").as("part_id"), col("hops")),
  )

  private lazy val centroidsQ = Q(
    "q128_centroids",
    "Exact per-label embedding centroids (the k-means centroid-update / " +
      "mean-pooling primitive): components land on the 2^-24 fixed-" +
      "point grid (exact power-of-two multiply + exact floor — decimal " +
      "rounding would resolve ties differently per engine), sums are " +
      "plain BIGINTs (order-free, partial-agg map-side), the mean is " +
      "one IEEE division — so a float centroid is bit-identical on any " +
      "partitioning, where naive avg() flips last bits between runs. " +
      "Flat (label, dim) layout: one posexplode + one keyed shuffle, " +
      "never a per-group vector buffer.",
    Some("""
      WITH u AS (SELECT label,
                   unnest(generate_series(0, len(embedding) - 1)) AS dim,
                   unnest(list_transform(embedding,
                     mv_x -> CAST(floor(CAST(mv_x AS DOUBLE) * 16777216.0) AS BIGINT))) AS xf
                 FROM embeddings)
      SELECT label, CAST(dim AS BIGINT) AS dim, count(*) AS n_vectors,
        CAST(sum(xf) AS DOUBLE) / CAST(count(*) * 16777216 AS DOUBLE) AS mean_val
      FROM u GROUP BY 1, 2 ORDER BY 1, 2
    """.trim),
    (spark, dir) =>
      graft.api.VectorSearch.exactCentroids(Tables(spark, dir).embeddings, "label", "embedding"),
  )

  private lazy val winsorizeQ = Q(
    "q129_winsorize",
    "Winsorization: clamp event values into the per-type exact " +
      "[p5, p95] band (q89's integer-position quantiles — always actual " +
      "data values) via least/greatest. Pure selection end to end; one " +
      "histogram quantile pass + one broadcast-sized cutoff join back " +
      "onto the rows. The outlier trim before feature aggregation.",
    Some("""
      WITH h AS (SELECT event_type, value, count(*) AS cnt FROM events GROUP BY 1, 2),
      c AS (SELECT event_type, value, cnt,
              sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS n_rows
            FROM h),
      p AS (SELECT event_type,
              min(CASE WHEN cum >= (n_rows * 500 + 9999) // 10000 THEN value END) AS lo,
              min(CASE WHEN cum >= (n_rows * 9500 + 9999) // 10000 THEN value END) AS hi
            FROM c GROUP BY event_type)
      SELECT e.event_id, e.event_type, e.value,
        least(greatest(e.value, p.lo), p.hi) AS winsorized
      FROM events e JOIN p ON e.event_type = p.event_type
      ORDER BY e.event_id
    """.trim),
    (spark, dir) =>
      graft.operators.Stats.winsorize(Tables(spark, dir).events,
          Seq("event_type"), "value", loBp = 500, hiBp = 9500)
        .select(col("event_id"), col("event_type"), col("value"), col("winsorized")),
  )

  private lazy val ohlcQ = Q(
    "q127_ohlc",
    "OHLC bar aggregation: per (event_type, hour) the opening/closing " +
      "value (min_by/max_by over a (ts, event_id) ordering struct — " +
      "deterministic because event_id is unique, ONE hash aggregation, " +
      "no ranking window), high/low, trade count, and exact-decimal " +
      "volume. The time-series bar-building primitive; open/close are " +
      "pure selection, so doubles hash exactly.",
    Some("""
      WITH e AS (SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
                   ts, event_id, value
                 FROM events),
      o AS (SELECT *,
              row_number() OVER (PARTITION BY event_type, hour_start ORDER BY ts, event_id) AS rn_a,
              row_number() OVER (PARTITION BY event_type, hour_start ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e)
      SELECT event_type, hour_start,
        max(CASE WHEN rn_a = 1 THEN value END) AS bar_open,
        max(CASE WHEN rn_d = 1 THEN value END) AS bar_close,
        max(value) AS bar_high, min(value) AS bar_low,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS volume
      FROM o GROUP BY 1, 2 ORDER BY 1, 2
    """.trim),
    (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("bar_open"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("bar_close"),
          max(col("value")).as("bar_high"),
          min(col("value")).as("bar_low"),
          count(lit(1)).as("n_events"),
          Num.dsum(col("value")).as("volume")),
  )

  private lazy val skylineQ = Q(
    "q125_skyline",
    "Skyline / Pareto frontier (Börzsönyi et al., ICDE'01): parts not " +
      "strictly dominated on (price low, size small). The oracle runs " +
      "the textbook n-squared NOT-EXISTS dominance join; the engine " +
      "computes the same set with one keyed shuffle + a TWO-PASS " +
      "distributed running minimum (per-bucket minima collect as " +
      "control-plane metadata, in-bucket prefix-min windows run " +
      "parallel) — never a single-partition sort, never an n-squared " +
      "product. Pure selection/comparison, so the frontier hash-matches " +
      "on any partitioning and bucket count.",
    Some("""
      SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size FROM part p
      WHERE NOT EXISTS (SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
      ORDER BY p_partkey
    """.trim),
    (spark, dir) =>
      graft.operators.Skyline.skyline2d(Tables(spark, dir).part, "p_retailprice", "p_size")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("long").as("p_size")),
  )

  private lazy val regressionQ = Q(
    "q126_regression",
    "Per-group OLS trend: slope/intercept of event value vs hours-" +
      "since-epoch, per event type. The five sufficient statistics " +
      "(n, sum x, sum y, sum xy, sum x^2) accumulate as EXACT decimals " +
      "(order-free, partial-agg map-side); the closed form runs on " +
      "their double casts in one fixed expression — so a regression " +
      "over floats is still bit-identical across engines and " +
      "partitionings. The streaming-friendly shape: sufficient stats, " +
      "never a second pass over the data.",
    Some("""
      WITH e AS (SELECT event_type,
                   CAST(epoch_us(ts) // 3600000000 AS DECIMAL(20,0)) AS x,
                   CAST(value AS DECIMAL(30,2)) AS y
                 FROM events),
      s AS (SELECT event_type,
              CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(x) AS DOUBLE) AS sx,
              CAST(sum(y) AS DOUBLE) AS sy,
              CAST(sum(x*y) AS DOUBLE) AS sxy,
              CAST(sum(x*x) AS DOUBLE) AS sxx
            FROM e GROUP BY event_type)
      SELECT event_type,
        (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
      FROM s ORDER BY event_type
    """.trim),
    (spark, dir) => {
      // integer DIV, never float division + cast: a double quotient a
      // hair under the integer would truncate differently than the
      // oracle's exact `//`. Micros are non-negative, so trunc == floor.
      val e = Tables(spark, dir).events.select(
        col("event_type"),
        expr("unix_micros(ts) DIV 3600000000")
          .cast(org.apache.spark.sql.types.DecimalType(20, 0)).as("x"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)).as("y"))
      val s = e.groupBy("event_type").agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      s.select(col("event_type"), slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
    },
  )

  /** q121's oracle: the same scaled-integer power iteration as
    * PageRank.runInt, unrolled as chained CTEs (r0..rN). DuckDB sums
    * BIGINTs into HUGEINT, so the damp multiply can't overflow
    * mid-expression; the final CAST back to BIGINT matches the Spark
    * value domain. Generated so `iters` changes in one place.
    */
  private def pagerankOracleSql(iters: Int): String = {
    val scale = 1000000000000L
    val (dn, dd) = (85L, 100L)
    val base = (scale * (dd - dn)) / dd
    val sb = new StringBuilder
    // MATERIALIZED: DuckDB inlines plain CTEs, so every iteration's
    // join would RE-RUN the quadratic co-purchase self-join — at sf1
    // that recomputation spills past the disk and kills the oracle
    // outright (r16 ORACLE_TIMES_SF1 recorded -1). Pinning the shared
    // subgraphs is the oracle's own best plan, not a handicap: sf1
    // finishes in ~39 s materialized vs. out-of-disk inlined.
    sb ++= "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),\n"
    sb ++= "e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst FROM li a " +
      "JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),\n"
    sb ++= "deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),\n"
    sb ++= "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),\n"
    sb ++= s"r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank FROM nodes),\n"
    for (i <- 1 to iters) {
      sb ++= s"c$i AS (SELECT e.dst, sum(r.rank // d.outdeg) AS s FROM e " +
        s"JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY e.dst),\n"
      sb ++= s"r$i AS (SELECT n.node, CAST($base + ($dn * coalesce(c.s, 0)) // $dd AS BIGINT) AS rank " +
        s"FROM nodes n LEFT JOIN c$i c ON c.dst = n.node)"
      sb ++= (if (i < iters) ",\n" else "\n")
    }
    sb ++= s"SELECT node AS part_id, rank AS pr_scaled FROM r$iters ORDER BY part_id"
    sb.toString
  }
}
