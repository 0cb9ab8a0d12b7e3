package graft.queries

import graft.{Num, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-10 surface: scale-first join strategies (bloom-pruned semi
  * join, salted skew join, zone-map skipping) and an exact-statistics
  * analytics family (VWAP, activity streaks, distribution divergence,
  * Welch's t, Mann-Whitney U, attribution, Benford, functional
  * dependencies).
  *
  * Numeric discipline is the engine's standard one (see [[graft.Num]]):
  * every aggregate accumulates EXACT integers/decimals — order-free, so
  * any partitioning and any engine agrees bit-for-bit — and each final
  * statistic is ONE fixed expression over the exact parts, using only
  * correctly-rounded IEEE ops (+,-,*,/,sqrt), written identically here
  * and in the DuckDB oracle SQL.
  */
object Advanced {

  private val d30_2 = DecimalType(30, 2)

  val qs: Seq[Q] = Seq(
    Q(
      "q143_vwap",
      "Volume-weighted vs time-weighted average price per ship-month and " +
        "return flag: VWAP = sum(price*qty)/sum(qty) from exact decimal " +
        "sufficient sums; the spread column exposes volume/price " +
        "correlation. One map-side-combined aggregation, no joins.",
      Some("""
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS mon,
          l_returnflag,
          CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,2))) AS DOUBLE)
            / CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS vwap,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS twap,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS volume
        FROM lineitem
        GROUP BY 1, 2
      """.trim),
      (spark, dir) => {
        val li = Tables(spark, dir).lineitem
        li.groupBy(date_trunc("month", col("l_shipdate")).as("mon"), col("l_returnflag"))
          .agg(
            (Num.dsum(col("l_extendedprice") * col("l_quantity"))
              / Num.dsum(col("l_quantity"))).as("vwap"),
            Num.davg(col("l_extendedprice")).as("twap"),
            Num.dsum(col("l_quantity")).as("volume"),
          )
      },
    ),
    Q(
      "q144_streaks",
      "Gaps-and-islands: longest run of consecutive order days per " +
        "customer. The island id (day-number minus per-customer row " +
        "number) turns consecutiveness into plain grouping — two " +
        "partition-local windows + aggregations, no self-join, no " +
        "quadratic anything; partitions by customer so nothing is global.",
      Some("""
        WITH d AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders),
        r AS (SELECT o_custkey, day,
                date_diff('day', DATE '1970-01-01', day)
                  - row_number() OVER (PARTITION BY o_custkey ORDER BY day) AS g
              FROM d),
        s AS (SELECT o_custkey, g, count(*) AS len FROM r GROUP BY 1, 2)
        SELECT o_custkey, CAST(max(len) AS BIGINT) AS max_streak,
          count(*) AS n_streaks, CAST(sum(len) AS BIGINT) AS n_active_days
        FROM s GROUP BY o_custkey
      """.trim),
      (spark, dir) => {
        val d = Tables(spark, dir).orders
          .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
          .distinct()
        val w = Window.partitionBy("o_custkey").orderBy("day")
        val islands = d
          .withColumn("g",
            datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
              - row_number().over(w))
          .groupBy("o_custkey", "g")
          .agg(count(lit(1)).as("len"))
        islands.groupBy("o_custkey").agg(
          max("len").as("max_streak"),
          count(lit(1)).as("n_streaks"),
          sum("len").as("n_active_days"),
        )
      },
    ),
    Q(
      "q145_bloom_join",
      "Bloom-pruned semi join (graft.operators.ScaleJoins): lineitem " +
        "rows for suppliers in nations 0-4, aggregated per return flag. " +
        "A distributed bloom aggregate over the supplier keys prunes the " +
        "fact scan BEFORE the shuffle (scalar-subquery delivery, the " +
        "InjectRuntimeFilter shape, made explicit); the exact semi join " +
        "then removes false positives, so the result is bit-identical to " +
        "the plain IN-subquery the oracle runs.",
      Some("""
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        GROUP BY l_returnflag
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val dim = t.supplier.filter(col("s_nationkey") < 5).select("s_suppkey")
        graft.operators.ScaleJoins
          .bloomPrunedSemiJoin(t.lineitem, "l_suppkey", dim, "s_suppkey",
            expectedItems = 1L << 20, numBits = 1L << 23)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), Num.dsum(col("l_extendedprice")).as("sum_price"))
      },
    ),
    Q(
      "q146_salted_join",
      "Skew-salted equi-join (graft.operators.ScaleJoins): the events " +
        "fact joined to the customer dimension on user id, fact side " +
        "salted across 8 reducers by a pure hash of the unique event id " +
        "(deterministic under retry), dimension replicated per salt. " +
        "Result is the identical multiset a plain join produces — the " +
        "salt only changes WHERE rows meet, which is the point when one " +
        "hot key would otherwise serialize a reducer.",
      Some("""
        SELECT c.c_mktsegment, count(*) AS n_events,
          CAST(sum(CAST(e.value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        graft.operators.ScaleJoins
          .saltedEquiJoin(t.events, "user_id", col("event_id"),
            t.customer, "c_custkey", salts = 8)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("sum_value"))
      },
    ),
    Q(
      "q147_mix_divergence",
      "Training-mix diagnostics per language slice: total-variation " +
        "distance between the slice's source distribution and the global " +
        "one, plus Gini source diversity. Both statistics are ratios of " +
        "EXACT integer aggregates (|c*m - g*n| sums and sum-of-squares), " +
        "so no transcendental functions and no order-dependent float " +
        "summation — polynomial divergence measures chosen over " +
        "KL/entropy precisely because they stay exact distributed.",
      Some("""
        WITH c AS (SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
        n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        g AS (SELECT source, count(*) AS g FROM documents GROUP BY 1),
        m AS (SELECT count(*) AS m FROM documents),
        grid AS (SELECT n.lang, g.source, n.n, g.g, COALESCE(c.c, 0) AS c, m.m
                 FROM n CROSS JOIN g CROSS JOIN m
                 LEFT JOIN c ON c.lang = n.lang AND c.source = g.source),
        a AS (SELECT lang, n, m,
                sum(abs(CAST(c AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))
                      - CAST(g AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))) AS tvnum,
                sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS sc2
              FROM grid GROUP BY 1, 2, 3)
        SELECT lang, n AS n_docs,
          CAST(tvnum AS DOUBLE)
            / (2 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) AS tv_vs_global,
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sc2 AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_diversity
        FROM a
      """.trim),
      (spark, dir) => {
        val docs = Tables(spark, dir).documents
        val c = docs.groupBy("lang", "source").agg(count(lit(1)).as("c"))
        val n = c.groupBy("lang").agg(sum("c").as("n"))
        val g = docs.groupBy("source").agg(count(lit(1)).as("g"))
        val m = docs.agg(count(lit(1)).as("m"))
        // langs x sources grid so sources ABSENT from a slice still
        // contribute their |0 - g*n| mass; every side here is tiny
        // (distinct langs/sources), so the crosses broadcast.
        val grid = n.crossJoin(g).crossJoin(broadcast(m))
          .join(c, Seq("lang", "source"), "left")
          .na.fill(0, Seq("c"))
        // c*m / g*n products overflow BIGINT at the 100 TB design point
        // (counts to 1e11 each); accumulate exact DECIMAL(38,0) — the
        // q157 pattern — with one double conversion per output column.
        val dec38 = DecimalType(38, 0)
        grid
          .groupBy("lang", "n", "m")
          .agg(
            sum(abs(col("c").cast(dec38) * col("m").cast(dec38)
              - col("g").cast(dec38) * col("n").cast(dec38))).as("tvnum"),
            sum(col("c").cast(dec38) * col("c").cast(dec38)).as("sc2"))
          .select(
            col("lang"),
            col("n").as("n_docs"),
            (col("tvnum").cast("double")
              / (lit(2) * col("n").cast("double") * col("m").cast("double")))
              .as("tv_vs_global"),
            ((col("n").cast("double") * col("n").cast("double") - col("sc2").cast("double"))
              / (col("n").cast("double") * col("n").cast("double"))).as("gini_diversity"),
          )
      },
    ),
    Q(
      "q148_welch_ttest",
      "Welch's unequal-variance t-test comparing event values of the " +
        "click vs error populations: per-group n/sum/sum-of-squares " +
        "accumulate as exact decimals (one map-side-combined pass), the " +
        "t statistic and Welch-Satterthwaite df evaluate in one fixed " +
        "double expression over them.",
      Some("""
        WITH e AS (SELECT event_type, CAST(value AS DECIMAL(30,2)) AS y
                   FROM events WHERE event_type IN ('click', 'error')),
        s AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(y * y) AS DOUBLE) AS syy
              FROM e GROUP BY 1),
        p AS (SELECT
                max(CASE WHEN event_type = 'click' THEN n END) AS n1,
                max(CASE WHEN event_type = 'click' THEN sy END) AS sy1,
                max(CASE WHEN event_type = 'click' THEN syy END) AS syy1,
                max(CASE WHEN event_type = 'error' THEN n END) AS n2,
                max(CASE WHEN event_type = 'error' THEN sy END) AS sy2,
                max(CASE WHEN event_type = 'error' THEN syy END) AS syy2
              FROM s),
        v AS (SELECT n1, n2, sy1 / n1 AS m1, sy2 / n2 AS m2,
                (n1 * syy1 - sy1 * sy1) / (n1 * (n1 - 1)) AS v1,
                (n2 * syy2 - sy2 * sy2) / (n2 * (n2 - 1)) AS v2
              FROM p)
        SELECT CAST(n1 AS BIGINT) AS n1, m1 AS mean1, v1 AS var1,
          CAST(n2 AS BIGINT) AS n2, m2 AS mean2, v2 AS var2,
          (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS t_stat,
          ((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
            / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
            AS welch_df
        FROM v
      """.trim),
      (spark, dir) => {
        val e = Tables(spark, dir).events
          .filter(col("event_type").isin("click", "error"))
          .select(col("event_type"), col("value").cast(d30_2).as("y"))
        val s = e.groupBy("event_type").agg(
          count(lit(1)).cast("double").as("n"),
          sum("y").cast("double").as("sy"),
          sum(col("y") * col("y")).cast("double").as("syy"))
        val p = s.agg(
          max(when(col("event_type") === "click", col("n"))).as("n1"),
          max(when(col("event_type") === "click", col("sy"))).as("sy1"),
          max(when(col("event_type") === "click", col("syy"))).as("syy1"),
          max(when(col("event_type") === "error", col("n"))).as("n2"),
          max(when(col("event_type") === "error", col("sy"))).as("sy2"),
          max(when(col("event_type") === "error", col("syy"))).as("syy2"))
        val v = p.select(
          col("n1"), col("n2"),
          (col("sy1") / col("n1")).as("m1"),
          (col("sy2") / col("n2")).as("m2"),
          ((col("n1") * col("syy1") - col("sy1") * col("sy1"))
            / (col("n1") * (col("n1") - 1))).as("v1"),
          ((col("n2") * col("syy2") - col("sy2") * col("sy2"))
            / (col("n2") * (col("n2") - 1))).as("v2"))
        val se2 = col("v1") / col("n1") + col("v2") / col("n2")
        v.select(
          col("n1").cast("long").as("n1"), col("m1").as("mean1"), col("v1").as("var1"),
          col("n2").cast("long").as("n2"), col("m2").as("mean2"), col("v2").as("var2"),
          ((col("m1") - col("m2")) / sqrt(se2)).as("t_stat"),
          ((se2 * se2)
            / ((col("v1") / col("n1")) * (col("v1") / col("n1")) / (col("n1") - 1)
              + (col("v2") / col("n2")) * (col("v2") / col("n2")) / (col("n2") - 1)))
            .as("welch_df"),
        )
      },
    ),
    Q(
      "q149_mann_whitney",
      "Exact Mann-Whitney U (BUILDING vs MACHINERY account balances) " +
        "with midrank tie handling: balances are grouped to distinct " +
        "values first (the distributed heavy lift), so the only ordered " +
        "pass runs over distinct values, and doubled ranks keep every " +
        "intermediate an exact integer. z uses the tie-corrected " +
        "variance in one fixed double expression.",
      Some("""
        WITH x AS (SELECT c_mktsegment AS seg, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
                   FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        byval AS (SELECT bal, count(*) AS t,
                    count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS t1
                  FROM x GROUP BY bal),
        ranked AS (SELECT t, t1,
                     COALESCE(CAST(sum(t) OVER (ORDER BY bal
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
                       AS cumbefore
                   FROM byval),
        agg AS (SELECT CAST(sum(t1 * (2 * cumbefore + t + 1)) AS BIGINT) AS sr1x2,
                  CAST(sum(t1) AS BIGINT) AS n1, CAST(sum(t) AS BIGINT) AS n,
                  CAST(sum(t * t * t - t) AS BIGINT) AS tieterm
                FROM ranked)
        SELECT n1, n - n1 AS n2,
          CAST(sr1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
          CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
            - CAST(sr1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u2,
          (CAST(sr1x2 - n1 * (n1 + 1) AS DOUBLE) / 2
             - CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2)
            / sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12
                   * (CAST(n + 1 AS DOUBLE)
                      - CAST(tieterm AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))) AS z
        FROM agg
      """.trim),
      (spark, dir) => {
        val x = Tables(spark, dir).customer
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_mktsegment").as("seg"),
            col("c_acctbal").cast(DecimalType(12, 2)).as("bal"))
        val byval = x.groupBy("bal").agg(
          count(lit(1)).as("t"),
          count(when(col("seg") === "BUILDING", 1)).as("t1"))
        // the window runs over DISTINCT balances (already aggregated),
        // not raw rows — the unpartitioned frame is the algorithm's one
        // sequential step and its input is |distinct values|, not |rows|
        val w = Window.orderBy("bal").rowsBetween(Window.unboundedPreceding, -1)
        val ranked = byval.select(col("t"), col("t1"),
          coalesce(sum("t").over(w), lit(0L)).as("cumbefore"))
        val agg = ranked.agg(
          sum(col("t1") * (lit(2) * col("cumbefore") + col("t") + 1)).as("sr1x2"),
          sum("t1").as("n1"), sum("t").as("n"),
          sum(col("t") * col("t") * col("t") - col("t")).as("tieterm"))
        val u1x2 = col("sr1x2") - col("n1") * (col("n1") + 1)
        val n1d = col("n1").cast("double")
        val n2d = (col("n") - col("n1")).cast("double")
        val nd = col("n").cast("double")
        agg.select(
          col("n1"), (col("n") - col("n1")).as("n2"),
          (u1x2.cast("double") / 2).as("u1"),
          (n1d * n2d - u1x2.cast("double") / 2).as("u2"),
          ((u1x2.cast("double") / 2 - n1d * n2d / 2)
            / sqrt(n1d * n2d / 12
              * ((col("n") + 1).cast("double")
                - col("tieterm").cast("double") / (nd * (col("n") - 1).cast("double")))))
            .as("z"),
        )
      },
    ),
    Q(
      "q150_attribution",
      "Last-touch attribution: each purchase credits the user's most " +
        "recent preceding non-purchase event. One per-user ordered " +
        "window with an ignore-nulls last() — no self-join, no range " +
        "scan per purchase; ts ties break on the unique event id so " +
        "replays attribute identically.",
      Some("""
        WITH a AS (SELECT event_type, value,
            last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
          FROM events)
        SELECT COALESCE(src, 'none') AS touch, count(*) AS purchases,
          CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS attributed_value
        FROM a WHERE event_type = 'purchase' GROUP BY 1
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(spark, dir).events
          .withColumn("src",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("src"), lit("none")).as("touch"))
          .agg(count(lit(1)).as("purchases"),
            Num.dsum(col("value")).as("attributed_value"))
      },
    ),
    Q(
      "q151_benford",
      "Benford first-digit audit of order totals: the leading digit " +
        "comes from exact integer cents (string head of a BIGINT — no " +
        "log10 near power-of-ten boundaries), expected mass uses the " +
        "nine Benford constants as fixed double literals, and each " +
        "digit's chi-square contribution is row-local so nothing " +
        "depends on float summation order.",
      Some("""
        WITH v AS (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
                   FROM orders WHERE o_totalprice > 0),
        c AS (SELECT digit, count(*) AS observed FROM v GROUP BY digit),
        n AS (SELECT count(*) AS n FROM v),
        e AS (SELECT digit, observed, n,
                CAST(n AS DOUBLE) * (CASE digit
                  WHEN 1 THEN CAST(0.301029995663981 AS DOUBLE)
                  WHEN 2 THEN CAST(0.176091259055681 AS DOUBLE)
                  WHEN 3 THEN CAST(0.1249387366083 AS DOUBLE)
                  WHEN 4 THEN CAST(0.0969100130080564 AS DOUBLE)
                  WHEN 5 THEN CAST(0.0791812460476248 AS DOUBLE)
                  WHEN 6 THEN CAST(0.0669467896306132 AS DOUBLE)
                  WHEN 7 THEN CAST(0.0579919469776867 AS DOUBLE)
                  WHEN 8 THEN CAST(0.0511525224473813 AS DOUBLE)
                  WHEN 9 THEN CAST(0.0457574905606751 AS DOUBLE) END)
                AS expected
              FROM c CROSS JOIN n)
        SELECT digit, observed, expected,
          (CAST(observed AS DOUBLE) - expected) * (CAST(observed AS DOUBLE) - expected)
            / expected AS chi2_contrib
        FROM e
      """.trim),
      (spark, dir) => {
        // 15 significant digits, NOT full double precision: DuckDB
        // parses a longer literal as DECIMAL whose int64 mantissa
        // exceeds 2^53, and its decimal->double cast then double-rounds
        // (measured: 1-ulp drift on digit 3). At 15 digits both the
        // mantissa and 10^scale are exact doubles, so literal/10^scale
        // is ONE correctly-rounded division — identical to this
        // strtod-parsed constant in any engine.
        val benford = Map(
          1 -> 0.301029995663981, 2 -> 0.176091259055681, 3 -> 0.1249387366083,
          4 -> 0.0969100130080564, 5 -> 0.0791812460476248, 6 -> 0.0669467896306132,
          7 -> 0.0579919469776867, 8 -> 0.0511525224473813, 9 -> 0.0457574905606751)
        val v = Tables(spark, dir).orders
          .filter(col("o_totalprice") > 0)
          .select(substring(
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
        val c = v.groupBy("digit").agg(count(lit(1)).as("observed"))
        val n = v.agg(count(lit(1)).as("n"))
        val pd = benford.foldLeft(lit(null).cast("double")) { case (acc, (d, p)) =>
          when(col("digit") === d, lit(p)).otherwise(acc)
        }
        val e = c.crossJoin(broadcast(n))
          .withColumn("expected", col("n").cast("double") * pd)
        e.select(col("digit"), col("observed"), col("expected"),
          ((col("observed").cast("double") - col("expected"))
            * (col("observed").cast("double") - col("expected"))
            / col("expected")).as("chi2_contrib"))
      },
    ),
    Q(
      "q152_fd_check",
      "Functional-dependency profiling: for a panel of candidate A->B " +
        "dependencies across the schema, count determinant values whose " +
        "dependent is not unique. Each candidate is one grouped " +
        "count-distinct — fully distributed, exact, and the union of " +
        "candidates shares nothing, so the panel parallelizes trivially.",
      Some(
        Seq(
          ("orders", "o_orderkey", "o_custkey"),
          ("lineitem", "l_orderkey", "l_returnflag"),
          ("lineitem", "l_partkey", "l_suppkey"),
          ("customer", "c_custkey", "c_mktsegment"),
          ("events", "user_id", "event_type"),
          ("documents", "doc_id", "lang"),
          ("nation", "n_nationkey", "n_regionkey"),
        ).map { case (t, a, b) =>
          s"""SELECT '$t' AS tbl, '$a' AS det, '$b' AS dep, count(*) AS n_keys,
             |  CAST(count(CASE WHEN d > 1 THEN 1 END) AS BIGINT) AS violating_keys,
             |  count(CASE WHEN d > 1 THEN 1 END) = 0 AS holds
             |FROM (SELECT $a, count(DISTINCT $b) AS d FROM $t GROUP BY $a)""".stripMargin
        }.mkString("", "\nUNION ALL\n", "")),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val candidates = Seq(
          ("orders", t.orders, "o_orderkey", "o_custkey"),
          ("lineitem", t.lineitem, "l_orderkey", "l_returnflag"),
          ("lineitem", t.lineitem, "l_partkey", "l_suppkey"),
          ("customer", t.customer, "c_custkey", "c_mktsegment"),
          ("events", t.events, "user_id", "event_type"),
          ("documents", t.documents, "doc_id", "lang"),
          ("nation", t.nation, "n_nationkey", "n_regionkey"),
        )
        candidates.map { case (name, df, a, b) =>
          // "dependent not unique" needs only EXISTENCE of a second
          // value: count(DISTINCT b) > 1 == min(b) != max(b) (NULLs
          // drop out of both forms identically), and min/max is a
          // single-phase aggregate whose partial combine actually
          // reduces — the countDistinct form pays a groupBy(a, b)
          // dedup pass the question never needed
          df.groupBy(col(a)).agg(
              (min(col(b)) =!= max(col(b))).as("multi"))
            .agg(
              count(lit(1)).as("n_keys"),
              count(when(col("multi"), 1)).as("violating_keys"))
            .select(
              lit(name).as("tbl"), lit(a).as("det"), lit(b).as("dep"),
              col("n_keys"), col("violating_keys"),
              (col("violating_keys") === 0).as("holds"))
        }.reduce(_.unionAll(_))
      },
    ),
    Q(
      "q154_cohort_ltv",
      "Cohort lifetime-value matrix: customers cohorted by first-order " +
        "month, revenue and active-customer counts per (cohort, age) " +
        "cell. Month ids are exact integers (y*12+m), the cohort map is " +
        "one keyed aggregate joined back on the customer key — the " +
        "retention-revenue triangle every growth dashboard draws, exact " +
        "at any partitioning.",
      Some("""
        WITH o AS (SELECT o_custkey, o_totalprice,
                     CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS om
                   FROM orders),
        c AS (SELECT o_custkey, min(om) AS cm FROM o GROUP BY 1),
        j AS (SELECT o.o_custkey, o.o_totalprice, o.om, c.cm
              FROM o JOIN c ON o.o_custkey = c.o_custkey)
        SELECT cm AS cohort_ym, om - cm AS age_months,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
          count(*) AS orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
        FROM j GROUP BY 1, 2
      """.trim),
      (spark, dir) => {
        val o = Tables(spark, dir).orders.select(
          col("o_custkey"), col("o_totalprice"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("om"))
        val cohort = o.groupBy("o_custkey").agg(min("om").as("cm"))
        o.join(cohort, "o_custkey")
          .groupBy(col("cm").as("cohort_ym"), (col("om") - col("cm")).as("age_months"))
          .agg(
            countDistinct("o_custkey").as("active_customers"),
            count(lit(1)).as("orders"),
            Num.dsum(col("o_totalprice")).as("revenue"))
      },
    ),
    Q(
      "q155_mom_growth",
      "Month-over-month revenue growth per order priority: monthly " +
        "exact-decimal totals (one keyed aggregate over raw orders), " +
        "then a lag window over the TINY monthly series — the ordered " +
        "pass runs on O(priorities x months) rows, never raw data. " +
        "Growth is one IEEE division of identically-computed doubles.",
      Some("""
        WITH m AS (SELECT o_orderpriority,
                     CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
                   FROM orders GROUP BY 1, 2),
        w AS (SELECT o_orderpriority, ym, revenue,
                lag(revenue) OVER (PARTITION BY o_orderpriority ORDER BY ym) AS prev_revenue
              FROM m)
        SELECT o_orderpriority, ym, revenue, prev_revenue,
          (revenue - prev_revenue) / prev_revenue AS mom_growth
        FROM w WHERE prev_revenue IS NOT NULL
      """.trim),
      (spark, dir) => {
        val m = Tables(spark, dir).orders
          .groupBy(col("o_orderpriority"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("ym"))
          .agg(Num.dsum(col("o_totalprice")).as("revenue"))
        val w = Window.partitionBy("o_orderpriority").orderBy("ym")
        m.withColumn("prev_revenue", lag("revenue", 1).over(w))
          .filter(col("prev_revenue").isNotNull)
          .withColumn("mom_growth",
            (col("revenue") - col("prev_revenue")) / col("prev_revenue"))
      },
    ),
    Q(
      "q156_acf",
      "Autocorrelation function of daily purchase revenue at lags 1-7: " +
        "the raw events collapse to exact-decimal daily totals first " +
        "(one keyed aggregate), the lag alignment is ONE equi-join of " +
        "the tiny day series against its shifted self (days x 7 rows, " +
        "never raw events), and each lag's Pearson r comes from exact " +
        "decimal sufficient sums in one fixed double expression — the " +
        "seasonality probe (lag-7 spikes = weekly cycle), exact at any " +
        "partitioning.",
      Some("""
        WITH daily AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                         sum(CAST(value AS DECIMAL(30,2))) AS v
                       FROM events WHERE event_type = 'purchase' GROUP BY 1),
        pairs AS (SELECT l.lag, a.v AS x, b.v AS y
                  FROM daily a
                  CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7]) AS lag) l
                  JOIN daily b ON b.d = a.d - l.lag),
        s AS (SELECT lag, CAST(count(*) AS DOUBLE) AS n,
                CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                CAST(sum(x * y) AS DOUBLE) AS sxy,
                CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy
              FROM pairs GROUP BY 1)
        SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
          (n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS acf
        FROM s
      """.trim),
      (spark, dir) => {
        val daily = Tables(spark, dir).events
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("d"))
          .agg(sum(col("value").cast(d30_2)).as("v"))
        val lags = spark.range(1, 8).select(col("id").cast("int").as("lag"))
        val shifted = daily.select(col("d").as("bd"), col("v").as("y"))
        val pairs = daily.crossJoin(broadcast(lags))
          .join(shifted, col("bd") === col("d") - col("lag"))
          .select(col("lag"), col("v").as("x"), col("y"))
        val s = pairs.groupBy("lag").agg(
          count(lit(1)).cast("double").as("n"),
          sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"))
        s.select(
          col("lag"), col("n").cast("long").as("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy"))
            / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
              * sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("acf"),
        )
      },
    ),
    Q(
      "q157_interarrival",
      "Point-process burstiness per event type: inter-arrival gaps as " +
        "exact integer microseconds (one lag window per type key over " +
        "(ts, event_id) order), then mean gap and coefficient of " +
        "variation from exact integer sufficient sums — CV >> 1 marks " +
        "bursty arrivals vs a Poisson stream's CV of 1. One keyed " +
        "shuffle; the fixed double expression runs on per-type totals.",
      Some("""
        WITH g AS (SELECT event_type,
                     epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
                   FROM events),
        s AS (SELECT event_type, CAST(count(gap) AS DOUBLE) AS n,
                CAST(sum(gap) AS DOUBLE) AS sg,
                CAST(sum(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
                  AS DOUBLE) AS sgg
              FROM g WHERE gap IS NOT NULL GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
          sg / n / 1000000 AS mean_gap_sec,
          sqrt(n * sgg - sg * sg)
            / sqrt(n - 1) / sqrt(n) / (sg / n) AS cv
        FROM s
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        val g = Tables(spark, dir).events
          .select(col("event_type"),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap"))
          .filter(col("gap").isNotNull)
        // gap^2 sums overflow BIGINT at scale (1e8-microsecond gaps
        // square to 1e16; x rows), so squares accumulate as exact
        // DECIMAL(38,0) — order-free — with ONE double conversion after
        val dec38 = DecimalType(38, 0)
        val s = g.groupBy("event_type").agg(
          count(col("gap")).cast("double").as("n"),
          sum("gap").cast("double").as("sg"),
          sum(col("gap").cast(dec38) * col("gap").cast(dec38)).cast("double").as("sgg"))
        s.select(
          col("event_type"), col("n").cast("long").as("n_gaps"),
          (col("sg") / col("n") / 1000000).as("mean_gap_sec"),
          (sqrt(col("n") * col("sgg") - col("sg") * col("sg"))
            / sqrt(col("n") - 1) / sqrt(col("n"))
            / (col("sg") / col("n"))).as("cv"),
        )
      },
    ),
    Q(
      "q158_abc",
      "ABC / Pareto classification of parts by revenue " +
        "(graft.operators.Pareto): exact cumulative revenue share in " +
        "descending order, classes cut at 70/90%. The oracle runs the " +
        "textbook single global window; the engine computes the SAME " +
        "exact cumulative through monotone revenue bands — per-band " +
        "totals prefix-summed over |bands| rows, parallel in-band " +
        "windows — so nothing ever moves through one partition. Class " +
        "cuts compare cross-multiplied decimals; only the reported " +
        "share pays a double division.",
      Some("""
        WITH r AS (SELECT l_partkey,
                     sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS rev
                   FROM lineitem GROUP BY 1),
        t AS (SELECT sum(rev) AS total FROM r),
        w AS (SELECT l_partkey, rev,
                sum(rev) OVER (ORDER BY rev DESC, l_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM r)
        SELECT l_partkey, CAST(rev AS DOUBLE) AS measure_value,
          CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
          CASE WHEN cum * 100 <= total * 70 THEN 'A'
               WHEN cum * 100 <= total * 90 THEN 'B'
               ELSE 'C' END AS abc
        FROM w CROSS JOIN t
      """.trim),
      (spark, dir) => {
        val rev = Tables(spark, dir).lineitem
          .groupBy("l_partkey")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(30, 6))).as("rev"))
        graft.operators.Pareto.abcClassify(rev, "l_partkey", col("rev"), bandWidth = 10000L)
      },
    ),
    Q(
      "q159_hll_merge",
      "Sketch ALGEBRA (the 100 TB rollup property q55's direct path " +
        "doesn't exercise): hourly Datasketches-HLL sketches of " +
        "distinct users per event type MERGE into daily estimates via " +
        "hll_union_agg — pre-aggregated rollups answer coarser distinct " +
        "queries without touching raw data again. Sketch bytes are " +
        "engine-specific, so the oracled output is q55's error-gate " +
        "shape: exact daily distincts plus whether the MERGED estimate " +
        "landed within 5% — a drifting merge hash-mismatches the " +
        "oracle's literal trues.",
      Some("""
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
          true AS merged_within_5pct
        FROM events GROUP BY 1, 2
      """.trim),
      (spark, dir) => {
        val ev = Tables(spark, dir).events
        val hourly = ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val daily = hourly
          .groupBy(col("event_type"), date_trunc("day", col("hour")).as("day"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = ev.groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        exact.join(daily, Seq("event_type", "day"))
          .select(col("event_type"), col("day"), col("exact_users"),
            (abs(col("est").cast("double") - col("exact_users").cast("double"))
              / col("exact_users").cast("double") <= 0.05).as("merged_within_5pct"))
      },
    ),
    Q(
      "q161_join_blowup",
      "Join-explosion predictor (the measure-before-you-join companion " +
        "to q136's skew profile): exact output cardinality of the " +
        "events self-join on user id (sum of per-key frequency squares " +
        "— what q113-style same-key pair joins actually cost) plus the " +
        "top-10 contributing keys with their share. One keyed count, " +
        "one tiny aggregate, top-k via TakeOrderedAndProject; at 100 TB " +
        "this runs in seconds and decides whether the real join needs " +
        "bucketizing or salting BEFORE it is attempted.",
      Some("""
        WITH f AS (SELECT user_id, count(*) AS f FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(CAST(f AS DECIMAL(38,0)) * CAST(f AS DECIMAL(38,0)))
                       AS BIGINT) AS total_pairs,
                CAST(count(*) AS BIGINT) AS n_keys
              FROM f)
        SELECT f.user_id, CAST(f.f AS BIGINT) AS f,
          CAST(CAST(f.f AS DECIMAL(38,0)) * CAST(f.f AS DECIMAL(38,0)) AS BIGINT) AS pairs,
          CAST(CAST(f.f AS DECIMAL(38,0)) * CAST(f.f AS DECIMAL(38,0)) AS DOUBLE)
            / CAST(t.total_pairs AS DOUBLE) AS share,
          t.total_pairs, t.n_keys
        FROM f CROSS JOIN t
        ORDER BY pairs DESC, user_id LIMIT 10
      """.trim),
      (spark, dir) => {
        val f = Tables(spark, dir).events
          .groupBy("user_id").agg(count(lit(1)).as("f"))
        // f*f sums overflow BIGINT at the 100 TB design point (a 1e9-row
        // hot key alone squares to 1e18); accumulate exact DECIMAL(38,0)
        // — the q157 pattern — so a blowup never wraps silently. The
        // boundary BIGINT cast is presentation; out-of-range goes null
        // (Spark non-ANSI) / errors (oracle) rather than wrapping.
        val dec38 = DecimalType(38, 0)
        val t = f.agg(
          sum(col("f").cast(dec38) * col("f").cast(dec38)).cast("long").as("total_pairs"),
          count(lit(1)).as("n_keys"))
        f.crossJoin(broadcast(t))
          .select(col("user_id"), col("f"),
            (col("f").cast(dec38) * col("f").cast(dec38)).cast("long").as("pairs"),
            ((col("f").cast(dec38) * col("f").cast(dec38)).cast("double")
              / col("total_pairs").cast("double")).as("share"),
            col("total_pairs"), col("n_keys"))
          .orderBy(col("pairs").desc, col("user_id"))
          .limit(10)
      },
    ),
    Q(
      "q153_zonemap",
      "Zone-map (min/max skip index) build over lineitem with calendar-" +
        "month zones (graft.operators.ZoneMap): per zone, row count and " +
        "min/max of ship date and price. O(zones) output, one map-side-" +
        "combined aggregate — the query-time half (prunedScan: overlap-" +
        "filter the map, gate the scan with a literal IN over the live " +
        "zones = static partition pruning) is exercised by ZoneMapSpec, " +
        "where it must be bit-identical to the plain filter it " +
        "accelerates.",
      Some("""
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS zone,
          min(l_shipdate) AS min_l_shipdate, max(l_shipdate) AS max_l_shipdate,
          min(l_extendedprice) AS min_l_extendedprice,
          max(l_extendedprice) AS max_l_extendedprice,
          count(*) AS zone_rows
        FROM lineitem GROUP BY 1
      """.trim),
      (spark, dir) => {
        graft.operators.ZoneMap.build(
          Tables(spark, dir).lineitem,
          date_trunc("month", col("l_shipdate")),
          Seq("l_shipdate", "l_extendedprice"))
      },
    ),
    Q(
      "q162_autoplan_join",
      "The closed skew loop (graft.operators.Skew.autoPlan): measure, " +
        "then route — dim row count decides broadcast, the key-skew " +
        "profile (q136's diagnostic) decides salted (q146's mitigation) " +
        "vs plain. Here the measurement finds customer small and picks " +
        "the broadcast branch — the RIGHT plan for this shape, chosen by " +
        "data, not by the query author; AutoPlanSpec proves the salted " +
        "branch engages on a hot-key corpus with identical results. " +
        "All three branches are result-identical by construction.",
      Some("""
        SELECT c.c_mktsegment, count(*) AS n_events,
          CAST(sum(CAST(e.value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val (joined, _) = graft.operators.Skew.autoPlan(
          t.events, "user_id", col("event_id"), t.customer, "c_custkey")
        joined.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("sum_value"))
      },
    ),
    Q(
      "q163_scalejoin_flagship",
      "The scale-join family composed into ONE plan (VERDICT r10 next-" +
        "round #7): a zone-map-gated range scan of lineitem (q153's " +
        "skip index, literal static-pruning zone gate), bloom-pruned semi join " +
        "against the urgent orders (q145's pre-shuffle prune, scalar-" +
        "subquery delivery), and a salted join to part feeding the " +
        "brand aggregation (q146's skew spread) — proving the operators " +
        "compose instead of living as separate demos. FlagshipPlanSpec " +
        "pins all three physical shapes in the one executed plan. At " +
        "100 TB: the zone gate prunes scan I/O first (partition pruning " +
        "on a zoned layout), the bloom cuts the semi join's shuffle " +
        "bytes, and the salt bounds the worst reducer.",
      Some("""
        SELECT p.p_brand, count(*) AS n_items,
          CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-06-30'
          AND l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1
      """.trim),
      (spark, dir) => flagshipPlan(Tables(spark, dir)),
    ),
    Q(
      "q179_rolling_actives",
      "Exact trailing-7-day distinct active users per day (the DAU/WAU " +
        "growth metric) via coverage inversion " +
        "(graft.operators.TimeSeries.rollingActives): each (user, " +
        "activity-day) covers the 7 report days it makes the user " +
        "active for — map-side explode + two keyed dedups, rows = " +
        "7 x |user-days|, all equi-joins. The oracle runs the textbook " +
        "days x events range join (O(|days|*|events|)); the engine " +
        "form is the one that survives 100 TB, and the hash-match " +
        "proves the inversion exact.",
      Some("""
        WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        days AS (SELECT DISTINCT d AS day FROM ud)
        SELECT day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS actives_7d
        FROM days JOIN ud u ON u.d BETWEEN day - 6 AND day
        GROUP BY 1
      """.trim),
      (spark, dir) => graft.operators.TimeSeries.rollingActives(
        Tables(spark, dir).events, "user_id", "ts", windowDays = 7),
    ),
    Q(
      "q191_sharded_topk",
      "Distributed top-10 frequent users from TRUNCATED per-day " +
        "summaries with deterministic error bounds (graft.operators." +
        "TopFrequent — the TPUT / SpaceSaving-merge layout): each day " +
        "keeps only its exact top-5 user counts plus eps = the largest " +
        "dropped count; merged bounds lb/ub come from O(days x 5) " +
        "summary rows, and ONE semi-join-bounded exact recount of the " +
        "candidates closes the gap. Unlike stream-order Misra-Gries, " +
        "every step (exact shard counts, key-tie truncation, eps max) " +
        "reproduces bit-identically on any engine, so the WHOLE " +
        "summary algebra is hash-gated — the oracle recomputes " +
        "summaries, bounds, verify, and the lb<=n<=ub containment. At " +
        "100 TB the full key space never converges on one node: " +
        "summaries are metadata-sized, the verify pass is " +
        "candidate-pruned.",
      Some("""
        WITH counts AS (SELECT CAST(ts AS DATE) AS shard, user_id, count(*) AS cnt
                        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, user_id) AS rk
                   FROM counts),
        eps AS (SELECT shard, max(cnt) AS eps FROM ranked WHERE rk > 5 GROUP BY shard),
        summ AS (SELECT r.shard, r.user_id, r.cnt, COALESCE(e.eps, 0) AS eps
                 FROM ranked r LEFT JOIN eps e USING (shard) WHERE r.rk <= 5),
        te AS (SELECT COALESCE(sum(eps), 0) AS te FROM (SELECT DISTINCT shard, eps FROM summ)),
        bounds AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS lb,
                     CAST(sum(cnt) + (any_value(te.te) - sum(eps)) AS BIGINT) AS ub
                   FROM summ CROSS JOIN te GROUP BY user_id),
        exact AS (SELECT e.user_id, count(*) AS n FROM events e
                  WHERE e.user_id IN (SELECT user_id FROM bounds) GROUP BY 1),
        r AS (SELECT b.user_id, x.n, b.lb, b.ub,
                CAST(row_number() OVER (ORDER BY x.n DESC, b.user_id) AS BIGINT) AS rank
              FROM exact x JOIN bounds b USING (user_id))
        SELECT rank, user_id, n, lb, ub, (lb <= n AND n <= ub) AS bounds_ok
        FROM r WHERE rank <= 10 ORDER BY rank
      """.trim),
      (spark, dir) => graft.operators.TopFrequent.topK(
        Tables(spark, dir).events.withColumn("shard", to_date(col("ts"))),
        "shard", "user_id", c = 5, k = 10),
    ),
    Q(
      "q195_ohlc",
      "OHLC candlestick resampling (graft.operators.TimeSeries.ohlc): " +
        "per (event_type, day), the first/highest/lowest/last value " +
        "plus count and exact-decimal turnover — the downsample a " +
        "metrics store serves charts from. Open/close key on the " +
        "(ts, event_id) struct so bars are deterministic even under " +
        "timestamp collisions. ONE hash aggregation — min_by/max_by " +
        "over the tiebreak struct, partial map-side, no window, no " +
        "sort: a single cheap pass over 100 TB of raw events. The " +
        "oracle computes the same bars through first/last windows.",
      Some("""
        WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, value, ts, event_id FROM events),
        r AS (SELECT *,
                row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS rn_a,
                row_number() OVER (PARTITION BY event_type, day ORDER BY ts DESC, event_id DESC) AS rn_d
              FROM e)
        SELECT event_type, day,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high, min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               count(*) AS volume,
               CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS turnover
        FROM r GROUP BY event_type, day
      """.trim),
      (spark, dir) => graft.operators.TimeSeries.ohlc(
        Tables(spark, dir).events.withColumn("day", to_date(col("ts"))),
        Seq("event_type", "day"), "ts", "event_id", "value"),
    ),
  )

  /** q163's plan, shared with FlagshipPlanSpec's plan pins. The zone
    * map is built inline here (one extra aggregate over lineitem); a
    * deployment keeps it persisted and streaming-maintained
    * (ZoneMapStream), so query time pays only the tiny overlap filter.
    */
  def flagshipPlan(t: Tables): org.apache.spark.sql.DataFrame = {
    import graft.operators.{ScaleJoins, ZoneMap}
    val zone = date_trunc("month", col("l_shipdate"))
    val lo = to_timestamp(lit("1995-01-01"))
    val hi = to_timestamp(lit("1995-06-30"))
    val zm = ZoneMap.build(t.lineitem, zone, Seq("l_shipdate"))
    val scanned = ZoneMap.prunedScan(t.lineitem, zone, zm, "l_shipdate", lo, hi)
    val urgent = t.orders
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val semi = ScaleJoins.bloomPrunedSemiJoin(
      scanned, "l_orderkey", urgent, "o_orderkey",
      expectedItems = 1L << 20, numBits = 1L << 23)
    ScaleJoins
      .saltedEquiJoin(semi, "l_partkey", col("l_orderkey"), t.part, "p_partkey", salts = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))"))
          .cast("double").as("revenue"))
  }
}
