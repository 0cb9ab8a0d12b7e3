package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Time-series resampling: regular-grid gap-fill with
  * last-observation-carried-forward (LOCF) — the operator family
  * time-series stores ship natively and Spark lacks as a builtin
  * (Spark's `sequence` + window functions express it, composed here).
  *
  * Scale design: the grid is generated per key from that key's own
  * bounds (`sequence` explode — map-only after a keyed agg), then ONE
  * window over (key) carries values forward; no per-key driver loops,
  * no self-join, no global sort. Grid size is span/step per key —
  * bounded and predictable. Skewed keys (one user with a years-long
  * span) skew the window partition the same way they skew any keyed
  * window; AQE handles the shuffle side, and the grid explode stays
  * linear in output rows.
  */
object TimeSeries {

  /** Resample `df` to a regular `step` grid per `keyCol`, carrying the
    * last observed `valCol` forward onto each grid instant.
    *
    * - Observations at the same (key, ts) are reduced
    *   last-write-wins by `seqCol` (max_by) BEFORE filling, so the
    *   carried value is well-defined under duplicate timestamps.
    * - The grid spans `date_trunc(trunc, min(ts))` to
    *   `date_trunc(trunc, max(ts))` per key, inclusive, every `step`
    *   (a Spark interval string, e.g. "1 hour").
    * - An observation exactly ON a grid instant is visible to it
    *   (ts <= grid, ASOF semantics); grid points before the first
    *   observation fill null.
    * - A NULL observation is still an observation: it is carried as
    *   NULL (the carry tracks observation PRESENCE via a struct, not
    *   value non-nullness), exactly like an ASOF LEFT JOIN returning
    *   the matched row's NULL value.
    *
    * Returns (key, bucket_ts, value_locf). Values are carried, never
    * recomputed, so results are bit-identical cross-engine.
    */
  def gapFillLocf(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      seqCol: String,
      step: String = "1 hour",
      trunc: String = "hour",
  ): DataFrame = {
    // step is spliced into an interval literal: accept only "<n> <unit>"
    require(step.matches("""\d+ (second|minute|hour|day|week)s?"""),
      s"step must be '<n> <unit>' (second/minute/hour/day/week): '$step'")
    val lww = df.groupBy(col(keyCol), col(tsCol).as("__t"))
      .agg(max_by(col(valCol), col(seqCol)).as("__v"))
    val valType = lww.schema("__v").dataType
    val bounds = df.groupBy(col(keyCol))
      .agg(date_trunc(trunc, min(col(tsCol))).as("__t0"),
        date_trunc(trunc, max(col(tsCol))).as("__t1"))
    val grid = bounds.select(col(keyCol),
      explode(expr(s"sequence(__t0, __t1, interval $step)")).as("__t"))
    // marker orders an observation BEFORE the grid instant it lands on,
    // so ts <= grid is inclusive (ASOF semantics). The carried payload
    // is a one-field struct: non-null whenever an observation EXISTS,
    // so a null-valued observation carries as null instead of being
    // skipped over for an older non-null value.
    val obsStruct = StructType(Seq(StructField("v", valType)))
    val unioned = grid
      .withColumn("__o", lit(null).cast(obsStruct)).withColumn("__m", lit(1))
      .unionByName(lww.select(col(keyCol), col("__t"),
        struct(col("__v").as("v")).as("__o")).withColumn("__m", lit(0)))
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__f", last(col("__o"), ignoreNulls = true).over(w))
      .filter(col("__m") === 1)
      .select(col(keyCol), col("__t").as("bucket_ts"), col("__f")("v").as("value_locf"))
  }

  /** Interval overlap self-join: all pairs of CLOSED intervals
    * `[startCol, endCol]` that intersect (touching endpoints count,
    * overlap 0), `id_a < id_b`, with `overlap_us` = exact microsecond
    * intersection length. The temporal-join family member next to
    * as-of (q50), bounded-range (q51), and point-in-time (q94):
    * concurrency/conflict analysis over sessions, bookings, locks.
    *
    * Scale shape — the classic bucketized overlap join, NOT an n²
    * inequality product: each interval explodes into the fixed-width
    * time buckets it covers (`bucketMicros`, default 1 h), candidates
    * come from ONE equi-join on the bucket id, and a pair sharing
    * several buckets is emitted exactly once WITHOUT a distinct
    * shuffle: only the bucket containing the overlap's start keeps it
    * (`joined bucket == floor(max(s_a, s_b) / width)` — every
    * overlapping pair shares that bucket by construction). Work is
    * Σ occupancy² per bucket; size `bucketMicros` to the data's
    * interval lengths.
    *
    * `carry` columns ride along as `<name>_a` / `<name>_b`. `idCol`
    * must order consistently (numeric, or strings of equal length) —
    * it defines which side is `_a`.
    */
  def intervalOverlaps(df: DataFrame, idCol: String, startCol: String, endCol: String,
                       carry: Seq[String] = Nil,
                       bucketMicros: Long = 3600000000L,
                       maxBucketsPerInterval: Int = 1 << 16): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    require(maxBucketsPerInterval > 0, s"maxBucketsPerInterval must be positive: $maxBucketsPerInterval")
    val iv = df.selectExpr(Seq(
        idCol,
        s"unix_micros(CAST($startCol AS TIMESTAMP)) AS __s",
        s"unix_micros(CAST($endCol AS TIMESTAMP)) AS __e") ++ carry: _*)
      .filter(col("__s") <= col("__e"))
    // fail fast instead of materializing a runaway per-row array: an
    // interval 1e6x wider than the bucket means bucketMicros is
    // mis-sized for the data, and the explode would OOM the task long
    // before the join got a chance to be the problem
    val nb = s"((__e DIV ${bucketMicros}L) - (__s DIV ${bucketMicros}L) + 1)"
    val ex = iv.withColumn("__b",
      explode(expr(
        s"CASE WHEN $nb > $maxBucketsPerInterval THEN " +
          s"sequence(CAST(raise_error(concat('intervalOverlaps: an interval spans ', " +
          s"CAST($nb AS STRING), ' buckets (> $maxBucketsPerInterval) — raise bucketMicros " +
          s"or maxBucketsPerInterval')) AS BIGINT), CAST(0 AS BIGINT)) " +
          s"ELSE sequence(__s DIV ${bucketMicros}L, __e DIV ${bucketMicros}L) END")))
    def side(sfx: String) = ex.select(
      (Seq(col(idCol).as(s"id$sfx"), col("__s").as(s"__s$sfx"), col("__e").as(s"__e$sfx"),
        col("__b").as(s"__b$sfx")) ++ carry.map(c => col(c).as(s"$c$sfx"))): _*)
    side("_a")
      .join(side("_b").hint("SHUFFLE_HASH"),
        col("__b_a") === col("__b_b") && col("id_a") < col("id_b") &&
          col("__s_a") <= col("__e_b") && col("__s_b") <= col("__e_a") &&
          // dedup-at-source: keep the pair only in its overlap-start bucket
          col("__b_a") === expr(s"greatest(__s_a, __s_b) DIV ${bucketMicros}L"))
      .select((Seq(col("id_a"), col("id_b")) ++
        carry.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b"))) :+
        (least(col("__e_a"), col("__e_b")) - greatest(col("__s_a"), col("__s_b"))).as("overlap_us")): _*)
  }

  /** Rolling Pearson correlation between two pre-aggregated series
    * columns over a trailing `window`-row frame in `orderCol` order —
    * the co-movement diagnostic between two metrics (e.g. two event
    * types' daily totals).
    *
    * Exactness: `xCol`/`yCol` must be DECIMAL (the caller aggregates
    * them exactly — DECIMAL(18,2) leaves product headroom); the six
    * frame sums (Σx, Σy, Σxy, Σx², Σy², n) are then exact decimal
    * window aggregates, and corr = (n·Σxy − ΣxΣy) /
    * (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) is a fixed IEEE expression tree
    * over their double casts — bit-identical on any engine. Rows with
    * an incomplete frame or a zero variance (corr undefined) are
    * dropped; the variance guard compares the same doubles both
    * engines compute, so the emitted row SET matches exactly.
    *
    * Scale shape: the input is a pre-aggregated series (one row per
    * grid instant), so the ordered window runs over series length, not
    * raw rows — partition by series key upstream when profiling many
    * series.
    */
  def rollingCorr(series: DataFrame, orderCol: String, xCol: String, yCol: String,
                  window: Int = 7): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    import org.apache.spark.sql.types.DecimalType
    Seq(xCol, yCol).foreach { c =>
      require(series.schema(c).dataType.isInstanceOf[DecimalType],
        s"$c must be DECIMAL for exact frame sums (got ${series.schema(c).dataType})")
    }
    val w = Window.orderBy(col(orderCol)).rowsBetween(-(window - 1), Window.currentRow)
    val x = col(xCol)
    val y = col(yCol)
    val framed = series
      .withColumn("__n", count(lit(1)).over(w).cast("long"))
      .withColumn("__sx", sum(x).over(w))
      .withColumn("__sy", sum(y).over(w))
      .withColumn("__sxy", sum(x * y).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
      .withColumn("__syy", sum(y * y).over(w))
    val nD = col("__n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("__sx").cast("double"), col("__sy").cast("double"),
      col("__sxy").cast("double"), col("__sxx").cast("double"), col("__syy").cast("double"))
    val varX = nD * sxx - sx * sx
    val varY = nD * syy - sy * sy
    framed
      .filter(col("__n") === window && varX > 0.0 && varY > 0.0)
      .select(col(orderCol), col("__n").as("n_rows"),
        ((nD * sxy - sx * sy) / (sqrt(varX) * sqrt(varY))).as("corr"))
  }

  /** One-sided CUSUM change detection per key: over the key's values in
    * `orderCols` order, fold
    *
    *   s_i = max(0, s_{i−1} + (x_i − μ_key)),   s_0 = 0
    *
    * (μ_key = the key's mean, 2-decimal exact sum / one IEEE division)
    * and return both the final statistic and its running maximum — a
    * sustained upward level shift accumulates in `cusum_max` where
    * mean/stddev summaries wash it out. The same ordered per-key fold
    * family as q114's EWMA: both engines left-fold the identical
    * ordered list with identical IEEE ops, so the doubles are
    * bit-identical on any partitioning.
    *
    * Scale shape: one shuffle on the key; each key's sequence buffers
    * in one task (the documented contract of the fold family — a
    * pathological hot key is the caller's to pre-split; FunnelHotKeySpec
    * bounds the family's behavior).
    *
    * Returns (key, n_events, mu, cusum_final, cusum_max).
    */
  def cusum(df: DataFrame, keyCol: String, orderCols: Seq[String], valCol: String): DataFrame = {
    require(orderCols.nonEmpty, "cusum needs at least one ordering column")
    val ordered = orderCols.map(col) :+ col(valCol).as("__v")
    df.groupBy(col(keyCol))
      .agg(
        sort_array(collect_list(struct(ordered: _*))).as("__seq"),
        (sum(col(valCol).cast(org.apache.spark.sql.types.DecimalType(30, 2))).cast("double") /
          count(lit(1))).as("mu"))
      .selectExpr(
        keyCol,
        "CAST(size(__seq) AS BIGINT) AS n_events",
        "mu",
        "aggregate(__seq, array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), " +
          "(cs_acc, cs_x) -> array(" +
          "greatest(element_at(cs_acc, 1) + CAST(cs_x.__v AS DOUBLE) - mu, CAST(0.0 AS DOUBLE)), " +
          "greatest(element_at(cs_acc, 2), " +
          "greatest(element_at(cs_acc, 1) + CAST(cs_x.__v AS DOUBLE) - mu, CAST(0.0 AS DOUBLE))))) AS __f")
      .selectExpr(keyCol, "n_events", "mu",
        "element_at(__f, 1) AS cusum_final", "element_at(__f, 2) AS cusum_max")
  }

  /** Exact trailing-window distinct actives — the DAU/WAU/MAU family:
    * for every calendar day with any activity, how many distinct
    * entities were active at least once in the `windowDays`-day window
    * ending that day.
    *
    * The naive forms melt at scale: `count(DISTINCT) OVER (RANGE ...)`
    * keeps a per-frame distinct set (and most engines refuse it), and
    * the days × events range self-join the oracle runs is
    * O(|days| · |events|). This computes the SAME counts linearly via
    * coverage inversion: dedupe to (entity, activity-day), explode each
    * activity day into the `windowDays` report days it covers (entity
    * active on d ⟹ counted for every day in [d, d+w-1]), dedupe the
    * covered pairs, and count per report day restricted to days that
    * themselves saw activity. Rows ≈ w · |entity-days| through map-side
    * explode + two keyed dedup shuffles — all equi-operations, exact
    * BIGINT counts, no inequality join anywhere.
    */
  def rollingActives(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      windowDays: Int = 7,
  ): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val ud = df
      .select(to_date(col(tsCol)).as("__d"), col(entityCol).as("__e"))
      .filter(col("__d").isNotNull && col("__e").isNotNull)
      .distinct()
    val covered = ud
      .select(col("__e"),
        explode(sequence(col("__d"), date_add(col("__d"), windowDays - 1))).as("day"))
      .distinct()
    val activeDays = ud.select(col("__d").as("day")).distinct()
    covered.join(activeDays, "day")
      .groupBy("day")
      .agg(count(lit(1)).cast("long").as(s"actives_${windowDays}d"))
  }

  /** OHLC resampling bars (candlesticks): per group, the first/highest/
    * lowest/last value plus count and exact-decimal turnover — the
    * standard downsample a metrics store serves charts from. Open and
    * close are keyed by (tsCol, seqCol) with `seqCol` a unique
    * tiebreak, so bars are deterministic even when timestamps collide
    * (a float `min_by(ts)` alone would be partition-order-dependent on
    * ties). Plan: ONE hash aggregation — `min_by`/`max_by` over the
    * tiebreak struct, no window, no sort; partial aggregation runs
    * map-side, which is what makes this a single cheap pass over 100 TB
    * of raw events.
    */
  def ohlc(df: DataFrame, groupCols: Seq[String], tsCol: String, seqCol: String,
           valCol: String): DataFrame = {
    val key = struct(col(tsCol), col(seqCol))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        min_by(col(valCol), key).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), key).as("close"),
        count(lit(1)).as("volume"),
        sum(col(valCol).cast(org.apache.spark.sql.types.DecimalType(30, 2)))
          .cast("double").as("turnover"))
  }

  /** Classical seasonal decomposition, the day-of-week effect (the
    * moving-average member of the STL family, exact-arithmetic
    * variant): per key, (1) the daily series aggregates with exact
    * DECIMAL sums, (2) the trend is a CENTERED 7-day moving window
    * (only days with the full window qualify — the textbook
    * even-handed treatment of series edges), (3) the seasonal effect
    * per ISO weekday is the mean detrended deviation. Every
    * intermediate stays exact: the deviation is computed as
    * `7*daily - sum7` (no division), so the ONLY floating step is the
    * final mean — one IEEE division of an exact DECIMAL sum,
    * bit-identical cross-engine (the q114/q126/q127 arithmetic
    * discipline).
    *
    * Scale shape: one keyed day-aggregation shuffle, one 7-row-frame
    * window per key (days-per-key rows, thousands at most — never raw
    * events), one final tiny rollup. The raw table is touched once.
    *
    * Returns (keyCol, isodow, n_days, seasonal) — `seasonal` in value
    * units; Σ n·seasonal ≈ 0 per key by construction.
    */
  def seasonalDow(df: DataFrame, keyCol: String, tsCol: String, valCol: String): DataFrame = {
    // integer CENTS end to end: decimal input-rounding pinned once
    // (the d30_2 discipline), then every sum/multiply is BIGINT —
    // engines cannot disagree on promotion or scale
    val cents = (col(valCol).cast(org.apache.spark.sql.types.DecimalType(30, 2))
      * lit(100)).cast("long")
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(sum(cents).as("__daily"))
    val w = Window.partitionBy(keyCol).orderBy("__day").rowsBetween(-3, 3)
    // ROWS frame over the daily series == the 7-day centered window on
    // contiguous daily data; rows with fewer than 7 frame members are
    // the series edges and drop out exactly like the textbook centered
    // MA leaves NaN edges (and identically in the oracle's ROWS frame)
    val detrended = daily
      .withColumn("__sum7", sum(col("__daily")).over(w))
      .withColumn("__n7", count(lit(1)).over(w))
      .filter(col("__n7") === 7)
      .withColumn("__dev", col("__daily") * lit(7L) - col("__sum7"))
    detrended
      .groupBy(col(keyCol), (expr("weekday(__day)") + 1).cast("long").as("isodow"))
      .agg(
        count(lit(1)).cast("long").as("n_days"),
        (sum(col("__dev")).cast("double") / lit(100.0) / lit(7.0) /
          count(lit(1)).cast("double")).as("seasonal"))
  }
}
