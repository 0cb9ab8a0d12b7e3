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
}
