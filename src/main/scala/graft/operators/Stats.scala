package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order statistics that stay distributed at any group size. */
object Stats {

  /** Exact per-group median via a VALUE HISTOGRAM — the scale-safe
    * exact quantile when the value domain is bounded (quantities,
    * money cents, ratings, ages): one partial-aggregated shuffle
    * builds the (keys, value, count) histogram, and the cumulative
    * scan + median selection run over the tiny histogram. A
    * sort/row_number median funnels every group's raw rows into one
    * partition — at 100 TB a single group would serialize through one
    * task; here the corpus-sized pass is a plain groupBy with map-side
    * combine, and the window only ever sees |distinct values| rows per
    * group.
    *
    * Median of n values = the ((n+1) div 2)-th and (n div 2 + 1)-th
    * order statistics averaged (equal when n is odd), found as the
    * first histogram values whose cumulative count reaches those
    * positions. The average is a single IEEE division over exactly
    * representable sums, so results are bit-identical cross-engine.
    * Null values are excluded (SQL aggregate convention — and null
    * sort position differs between engines, so including them would
    * break the cross-engine contract).
    *
    * Returns one row per key group: (keys..., n_rows, median).
    */
  def histogramMedian(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame = {
    val kcols = keyCols.map(col)
    val hist = df
      .filter(col(valCol).isNotNull)
      .groupBy((keyCols :+ valCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    hist
      .withColumn("cum", sum("cnt").over(Window.partitionBy(kcols: _*).orderBy(col(valCol))))
      .withColumn("n_rows", sum("cnt").over(Window.partitionBy(kcols: _*)))
      .groupBy(kcols: _*)
      .agg(
        max("n_rows").as("n_rows"),
        min(when(expr("cum >= (n_rows + 1) DIV 2"), col(valCol))).as("__lo"),
        min(when(expr("cum >= n_rows DIV 2 + 1"), col(valCol))).as("__hi"))
      .withColumn("median", (col("__lo") + col("__hi")) / 2.0)
      .drop("__lo", "__hi")
  }

  /** Exact per-group quantiles (lower order statistic: the smallest
    * value whose cumulative count reaches ceil(q·n)) via the same
    * VALUE-HISTOGRAM layout as [[histogramMedian]] — the scale-safe
    * exact p50/p95/p99 profile when the value domain is bounded. One
    * partial-agg shuffle builds the histogram; the cumulative window
    * only ever sees |distinct values| rows per group; one output row
    * per (group, quantile). Positions are exact integers (`ceil(q·n)`
    * computed as `(n·bp + 9999) div 10000` — positive operands, so
    * truncating and flooring division agree across engines), and
    * results carry original values — no interpolation, bit-exact on
    * any engine.
    *
    * `quantilesBp` are basis points (5000 = p50, 9900 = p99).
    * Returns (keys..., q_bp, n_rows, value).
    */
  def histogramQuantiles(df: DataFrame, keyCols: Seq[String], valCol: String, quantilesBp: Seq[Int]): DataFrame = {
    require(quantilesBp.nonEmpty && quantilesBp.forall(b => b >= 1 && b <= 10000),
      s"quantiles are basis points in [1, 10000]: $quantilesBp")
    val kcols = keyCols.map(col)
    val hist = df
      .filter(col(valCol).isNotNull)
      .groupBy((keyCols :+ valCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.partitionBy(kcols: _*).orderBy(col(valCol))))
      .withColumn("n_rows", sum("cnt").over(Window.partitionBy(kcols: _*)))
    val picks = quantilesBp.map { bp =>
      // ceil(bp*n/10000) in pure integer arithmetic (operands positive)
      min(when(expr(s"cum >= (n_rows * $bp + 9999) DIV 10000"), col(valCol))).as(s"__q$bp")
    }
    val aggs = max("n_rows").as("n_rows") +: picks
    hist.groupBy(kcols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        (keyCols :+ "n_rows") ++ Seq(
          s"stack(${quantilesBp.size}, ${quantilesBp.map(bp => s"CAST($bp AS BIGINT), __q$bp").mkString(", ")}) AS (q_bp, value)"): _*)
  }

  /** Winsorization: clamp `valCol` into the per-group
    * [`loBp`, `hiBp`] exact-quantile band (basis points) — the outlier
    * trim a feature/metrics pipeline applies before aggregation. The
    * cutoffs come from [[histogramQuantiles]]'s exact integer-position
    * definition (always actual data values, no interpolation), and the
    * clamp is least/greatest — pure selection end to end, so the result
    * hash-matches on any partitioning.
    *
    * Scale shape: the quantile pass (histogram layout, |distinct
    * values| window rows per group) + ONE join of the group-cardinality
    * cutoff table back onto the rows (AQE broadcasts it when small —
    * not forced, group cardinality is the caller's domain knowledge).
    */
  def winsorize(df: DataFrame, keyCols: Seq[String], valCol: String,
                loBp: Int, hiBp: Int, outCol: String = "winsorized"): DataFrame = {
    require(loBp < hiBp, s"need loBp < hiBp: $loBp, $hiBp")
    val qs = histogramQuantiles(df, keyCols, valCol, Seq(loBp, hiBp))
    val cuts = qs.groupBy(keyCols.map(col): _*)
      .agg(
        max(when(col("q_bp") === loBp, col("value"))).as("__lo"),
        max(when(col("q_bp") === hiBp, col("value"))).as("__hi"))
    df.join(cuts, keyCols)
      .withColumn(outCol, least(greatest(col(valCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Robust outlier detection via the median absolute deviation: rows
    * whose |value − median| exceeds `k`·MAD for their group, where MAD
    * is the median of the absolute deviations. Unlike mean/stddev
    * z-scores (q97's IQR family's cousin), the breakdown point is 50% —
    * half the data can be corrupt before the threshold moves.
    *
    * Determinism: medians are [[histogramMedian]]'s exact order
    * statistics (actual data values, or one IEEE midpoint add for even
    * n); each deviation is ONE IEEE subtract of identically-computed
    * doubles; the flag compares against one multiply. Every engine
    * computes the identical bits, so the flagged row SET hash-matches.
    *
    * Scale shape: two histogram-median passes (each one partial-agg
    * shuffle + a |distinct values|-sized cumulative window per group)
    * plus two joins of group-cardinality cutoff tables back onto the
    * rows (AQE broadcasts them when small). Never sorts the raw rows.
    *
    * Returns the OUTLIER rows only: input columns + (med, mad).
    */
  def madOutliers(df: DataFrame, keyCols: Seq[String], valCol: String, k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val med = histogramMedian(df, keyCols, valCol)
      .select((keyCols.map(col) :+ col("median").as("med")): _*)
    val dev = df.join(med, keyCols)
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = histogramMedian(dev, keyCols, "__dev")
      .select((keyCols.map(col) :+ col("median").as("mad")): _*)
    dev.join(mad, keyCols)
      .filter(col("__dev") > lit(k) * col("mad"))
      .drop("__dev")
  }

  /** Data-quality gate (dbt-test / Deequ-style): violation counts for
    * the three constraint families a pipeline asserts before
    * publishing a table — NOT NULL columns, unique keys, and
    * referential integrity against dimension tables. Returns one row
    * per check: (check, n_violations); a clean table is all zeros and
    * the caller fails the run on any nonzero.
    *
    * Scale shape: all null checks fold into ONE aggregate scan (one
    * sum-of-isnull per column, no shuffle); each unique key costs one
    * partial-agg shuffle (duplicates = Σ (count−1) over groups); each
    * referential check is one left-anti join (broadcast when the dim
    * is small — Spark's planner decides). Violation COUNTS, not
    * violating rows: the report stays driver-safe at any scale; chase
    * rows with a follow-up filter once a check fires.
    */
  def dqChecks(
      df: DataFrame,
      notNull: Seq[String] = Nil,
      uniqueKeys: Seq[Seq[String]] = Nil,
      refs: Seq[(Seq[String], DataFrame, Seq[String])] = Nil,
  ): DataFrame = {
    val spark = df.sparkSession
    require(notNull.nonEmpty || uniqueKeys.nonEmpty || refs.nonEmpty, "no checks given")
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (notNull.nonEmpty) {
      val sums = notNull.map(c => sum(col(c).isNull.cast("long")).as(c))
      val row = df.agg(sums.head, sums.tail: _*)
      parts += row.selectExpr(
        s"stack(${notNull.size}, ${notNull.map(c => s"'not_null:$c', $c").mkString(", ")}) AS (check, n_violations)")
    }
    uniqueKeys.foreach { keys =>
      parts += df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
        .select(lit(s"unique:${keys.mkString(",")}").as("check"), col("n_violations"))
    }
    refs.foreach { case (cols, dim, dimCols) =>
      require(cols.size == dimCols.size, s"ref arity mismatch: $cols vs $dimCols")
      val cond = cols.zip(dimCols).map { case (a, b) => df(a) <=> dim(b) }.reduce(_ && _)
      parts += df.join(dim, cond, "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(s"ref:${cols.mkString(",")}").as("check"), col("n_violations"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Equi-width histogram of a numeric column — the one-pass (plus a
    * 1-row bounds aggregate) distribution profile a 100 TB data-quality
    * sweep runs per column. `nb` buckets span [min, max]; bucket =
    * floor((x − min) / width) clamped so x = max lands in the last
    * bucket; a degenerate column (min = max) collapses to bucket 0.
    *
    * Both the width and the bucket assignment are single IEEE
    * operations on identical doubles, so bucket ids — and therefore
    * counts — are bit-identical cross-engine. The bounds row is a
    * broadcast 1-row side (same pattern as the scalar-subquery and
    * vocabulary joins); the counting pass is one partial-agg shuffle
    * of at most `nb` rows per partition.
    *
    * Returns (bucket, lo, hi, n) ordered by construction; empty
    * buckets are absent (counts, not a densified grid).
    */
  def equiWidthHistogram(df: DataFrame, valCol: String, nb: Int): DataFrame = {
    require(nb > 0, s"nb must be positive: $nb")
    val bounds = df.filter(col(valCol).isNotNull)
      .agg(min(col(valCol)).cast("double").as("__mn"), max(col(valCol)).cast("double").as("__mx"))
    df.filter(col(valCol).isNotNull)
      .join(broadcast(bounds))
      .withColumn("__w", (col("__mx") - col("__mn")) / nb.toDouble)
      .withColumn("bucket",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col(valCol).cast("double") - col("__mn")) / col("__w")).cast("long"),
            lit(nb - 1L))))
      .groupBy("bucket")
      .agg(
        (min(col("__mn")) + col("bucket") * min(col("__w"))).as("lo"),
        (min(col("__mn")) + (col("bucket") + 1L) * min(col("__w"))).as("hi"),
        count(lit(1)).as("n"))
  }

  /** Column profile (the dbt-docs / deequ-summary shape): one row per
    * profiled column with row count, null count, exact distinct count,
    * and min/max — numeric and timestamp columns in `min_num`/`max_num`
    * (integrals and epoch-micros are exact in a double up to 2^53;
    * timestamps profile as `unix_micros`), string columns in
    * `min_str`/`max_str`. The first-look table-health snapshot next to
    * [[dqChecks]]'s pass/fail gate.
    *
    * Scale shape: ONE aggregation pass computes every stat — the
    * multiple exact count(DISTINCT col) expand to Spark's Expand-based
    * multi-distinct aggregate (input rows × profiled columns through
    * one shuffle; the standard profiling cost — prune `cols` on wide
    * tables, or sample upstream, when that product bites). The 1-wide
    * result row unpivots map-only via stack().
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, approxNdvRsd = None)

  /** [[profile]] with SKETCHED distinct counts: `ndv` is HyperLogLog++
    * (`approx_count_distinct` at `rsd` relative standard deviation)
    * instead of the exact Expand-based multi-distinct. The 100 TB
    * first-look shape: every stat — counts, HLL registers, numeric
    * min/max — is an ordinary partially-aggregable function, so the
    * whole profile is ONE map-side combine pass per scan with a
    * 1-row-per-partition exchange and NO Expand (input × cols row
    * multiplication) and NO per-column dedup shuffle (PlanSpecs pins
    * the plan). Exact twin stays [[profile]]; q235 gates the sketch's
    * error against it the q55 way.
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd in (0,1): $rsd")
    profileImpl(df, cols, approxNdvRsd = Some(rsd))
  }

  private def profileImpl(df: DataFrame, cols: Seq[String], approxNdvRsd: Option[Double]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.distinct.size == cols.size, s"duplicate profile columns: $cols")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c), s"no such column: $c"))
    // Names are spliced into generated SQL (backtick-quoted aliases,
    // single-quoted stack literals): a quote/backtick in the name would
    // escape those contexts and die later as a parser error — reject it
    // here, where the message can name the offending column.
    cols.foreach(c => require(!c.exists(ch => ch == '`' || ch == '\''),
      s"profile column name contains a quote/backtick (unsupported in generated SQL): $c"))
    import org.apache.spark.sql.types._
    def numExpr(c: String): Option[String] = types(c) match {
      case _: NumericType => Some(c)
      // NTZ (how parquet TIMESTAMP without UTC adjustment reads back)
      // casts through session-UTC TIMESTAMP to the same micros the
      // oracle's naive epoch_us computes
      case _: TimestampType => Some(s"unix_micros(CAST($c AS TIMESTAMP))")
      case _: TimestampNTZType => Some(s"unix_micros(CAST($c AS TIMESTAMP))")
      case _: DateType => Some(s"CAST(datediff($c, DATE'1970-01-01') AS BIGINT)")
      case _ => None
    }
    // Aggregate-engine split: a min/max over a STRING column carries a
    // variable-length buffer, which disqualifies HashAggregateExec and
    // drags the WHOLE aggregate — including the Expand-based distinct
    // dedup, the expensive part — into SortAggregate (3 sorts of
    // rows × cols; measured 6.6 s vs 0.3 s at sf0.1). So the expanded
    // pass carries only fixed-buffer functions (counts, exact ndv,
    // numeric min/max) and stays hash-aggregated; string min/max run in
    // a second, UNEXPANDED single-scan aggregate (SortAggregate with an
    // empty grouping key degenerates to a fold — no sort, no expand)
    // cross-joined back as a 1-row broadcast side.
    val ndvAgg: String => String = approxNdvRsd match {
      case Some(rsd) => c => s"approx_count_distinct($c, $rsd)"
      case None => c => s"count(DISTINCT $c)"
    }
    val hashAggs = cols.flatMap { c =>
      Seq(
        s"CAST(count($c) AS BIGINT) AS `__nn_$c`",
        s"CAST(${ndvAgg(c)} AS BIGINT) AS `__ndv_$c`") ++
        numExpr(c).map(e => Seq(
          s"CAST(min($e) AS DOUBLE) AS `__mnn_$c`", s"CAST(max($e) AS DOUBLE) AS `__mxn_$c`"))
          .getOrElse(Seq.empty)
    } :+ "CAST(count(*) AS BIGINT) AS `__n`"
    val strCols = cols.filter(c => numExpr(c).isEmpty)
    val strAggs = strCols.flatMap(c => Seq(
      s"CAST(min($c) AS STRING) AS `__mns_$c`", s"CAST(max($c) AS STRING) AS `__mxs_$c`"))
    val hashed = df.selectExpr(cols: _*).agg(expr(hashAggs.head), hashAggs.tail.map(expr): _*)
    val wide =
      if (strAggs.isEmpty) hashed
      else hashed.crossJoin(broadcast(
        df.selectExpr(strCols: _*).agg(expr(strAggs.head), strAggs.tail.map(expr): _*)))
    val stacked = cols.map { c =>
      val (mnn, mxn, mns, mxs) = numExpr(c) match {
        case Some(_) => (s"`__mnn_$c`", s"`__mxn_$c`", "CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
        case None => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"`__mns_$c`", s"`__mxs_$c`")
      }
      s"'$c', `__n` - `__nn_$c`, `__ndv_$c`, $mnn, $mxn, $mns, $mxs"
    }.mkString(", ")
    wide.selectExpr("`__n` AS n",
        s"stack(${cols.size}, $stacked) AS (col_name, n_null, ndv, min_num, max_num, min_str, max_str)")
      .select(col("col_name"), col("n"), col("n_null"), col("ndv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }
}
