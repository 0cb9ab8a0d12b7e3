package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ABC / Pareto classification: rank entities by a measure descending,
  * accumulate the EXACT running share of the total, and cut classes at
  * share thresholds (the 80/20 inventory analysis; here A/B/C at
  * caller-chosen cuts).
  *
  * The global running sum is the scale hazard: a naive
  * `sum() OVER (ORDER BY measure DESC)` moves every row through ONE
  * partition. This runs the two-pass distributed prefix pattern instead
  * (the [[Stats]] skyline / [[GlobalOrder]] family):
  *
  *  1. rows bucket into coarse BANDS monotone in the measure
  *     (`floor(measure) div bandWidth` — order-preserving, so band-desc
  *     + in-band-desc equals the global descending order, ties broken
  *     by the unique key which cannot cross a band);
  *  2. per-band totals (one tiny aggregate) get band-prefix offsets
  *     through a window over |bands| rows — the only ordered pass, its
  *     input thousands of rows regardless of data volume;
  *  3. each row's exact cumulative = its band's offset + an in-band
  *     running sum (parallel per-band windows).
  *
  * All accumulation is exact decimal; class cuts compare
  * cross-multiplied decimals (`cum * 100 <= total * pct`), so the
  * classification is bit-identical on any partitioning — only the
  * reported share pays one double division at the end.
  */
object Pareto {

  /** @param df        one row per entity
    * @param keyCol    unique entity key (tie-break; uniqueness is the
    *                  caller's contract, as for any deterministic rank)
    * @param measure   exact DECIMAL column (cast upstream; doubles
    *                  would make the running sums order-dependent).
    *                  Must be NON-NULL and NON-NEGATIVE: banding uses
    *                  truncating integer `div`, which is only monotone
    *                  for measures >= 0, and a null measure has no
    *                  defined rank. Violations fail the job eagerly
    *                  (one linear aggregate) before any shuffle.
    * @param bandWidth coarse band width in measure units — size so
    *                  bands ≫ cores while each band's rows fit a task
    * @param aPct      class A cut as a percent of total (inclusive)
    * @param bPct      class B cut as a percent of total (inclusive)
    */
  def abcClassify(
      df: DataFrame,
      keyCol: String,
      measure: Column,
      bandWidth: Long,
      aPct: Int = 70,
      bPct: Int = 90): DataFrame = {
    require(bandWidth >= 1, s"bandWidth must be >= 1: $bandWidth")
    require(0 < aPct && aPct < bPct && bPct < 100, s"need 0 < aPct < bPct < 100: $aPct, $bPct")
    // Pinned: the (possibly expensive) upstream plan computes ONCE and
    // feeds both the eager audit and the banding below — without the
    // pin the audit would silently re-run the whole upstream aggregate.
    val base = Lineage.pin(df.select(col(keyCol), measure.as("m")))
    // Eager audit (same pattern as Graph.coOccurrence's mega-basket cap):
    // a null measure would silently vanish in the band join, a negative
    // one silently mis-bands — both must fail loudly, not classify.
    val bad = base
      .agg(count(when(col("m").isNull || col("m") < 0, 1)).as("bad"))
      .head().getLong(0)
    require(bad == 0L,
      s"abcClassify requires non-null, non-negative measures; found $bad violating row(s)")
    // integer `div` on the FLOORED measure: exact banding, no decimal
    // division whose rounding could flip a boundary row's band.
    // Non-negative measures assumed (div truncates toward zero).
    val banded = base
      .withColumn("mfloor", floor(col("m")).cast("long"))
      .withColumn("band", expr(s"mfloor div $bandWidth"))
      .drop("mfloor")
    val bandTotals = banded.groupBy("band").agg(sum("m").as("brev"))
    // the ONLY unpartitioned window: |bands| rows, never the data
    val wBands = Window.orderBy(col("band").desc).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals.select(col("band"),
      coalesce(sum("brev").over(wBands), lit(0)).as("offset"))
    val total = base.agg(sum("m").as("total"))
    val wIn = Window.partitionBy("band")
      .orderBy(col("m").desc, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded
      .join(broadcast(offsets), "band")
      .withColumn("cum", col("offset") + sum("m").over(wIn))
      .crossJoin(broadcast(total))
      .select(
        col(keyCol), col("m").cast("double").as("measure_value"),
        (col("cum").cast("double") / col("total").cast("double")).as("cum_share"),
        when(col("cum") * 100 <= col("total") * aPct, "A")
          .when(col("cum") * 100 <= col("total") * bPct, "B")
          .otherwise("C").as("abc"))
  }
}
