package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not strictly dominated on a
  * (minimize x, minimize y) pair — the classic multi-criteria shortlist
  * operator (cheapest-AND-smallest parts, fastest-AND-freshest
  * replicas; Börzsönyi/Kossmann/Stocker, "The Skyline Operator",
  * ICDE'01 — public literature, not code).
  *
  * The naive formulation is a NOT EXISTS over an n² dominance join (the
  * oracle runs exactly that); the textbook single-node alternative is a
  * full sort + running minimum — a single-partition window at 100 TB.
  * This implementation gets the running minimum DISTRIBUTED with the
  * same two-pass trick as [[GlobalOrder]]:
  *
  *  1. reduce to one row per distinct x: g(x) = min y (one keyed
  *     shuffle — dominance within equal x is decided by min y alone);
  *  2. fixed-width-bucket the x axis from a 1-row (min, max) aggregate
  *     (broadcast, the q85 histogram pattern — no sampling pass);
  *  3. per-bucket minima (≤ nBuckets rows) collect to the driver;
  *     their EXCLUSIVE running minimum is control-plane metadata
  *     broadcast back — never a data-sized single partition;
  *  4. within each bucket, an exclusive prefix-min window over x
  *     (parallel across buckets); the global prefix-min over strictly
  *     smaller x is the min of (3) and (4).
  *
  * A point survives iff y == g(x) (not dominated within its x) and
  * g(x) < that exclusive prefix-min (not dominated by any smaller x —
  * strict, because smaller-x dominators need only y ≤). Every step is
  * selection/comparison on the original values — no arithmetic on the
  * coordinates — so results are bit-exact on any partitioning and
  * bucket count (the bucketing is pure layout; q125 hash-gates it
  * against the n² oracle).
  */
object Skyline {

  /** Rows of `df` on the (min `xCol`, min `yCol`) Pareto frontier.
    * Duplicate coordinate pairs survive together (neither strictly
    * dominates). Null coordinates are rejected — null has no place in
    * a dominance order.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")

    // one row per distinct x — dominance among equal x is min y
    val gx = df.groupBy(x.as("__x")).agg(min(y).as("__g"))

    // 1-row bounds broadcast (q85's pattern); also the null gate
    val b = df.agg(min(x), max(x), count(lit(1)), count(x), count(y)).head()
    require(b.getLong(2) == b.getLong(3) && b.getLong(2) == b.getLong(4),
      s"skyline2d: $xCol/$yCol contain nulls — a null coordinate is not comparable; filter first")
    if (b.getLong(2) == 0L) return df
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val width = if (hi > lo) (hi - lo) / nBuckets else 1.0
    val bucket = least(greatest(floor((col("__x") - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")

    val bucketed = gx.withColumn("__b", bucket)

    // control-plane collect: ≤ nBuckets rows; exclusive running min
    val bmins = bucketed.groupBy("__b").agg(min(col("__g")).as("__bm"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val prevMin = new Array[Double](nBuckets)
    var acc = Double.PositiveInfinity
    for (i <- 0 until nBuckets) {
      prevMin(i) = acc
      acc = math.min(acc, bmins.getOrElse(i, Double.PositiveInfinity))
    }
    val prevDf = df.sparkSession
      .createDataFrame(prevMin.toIndexedSeq.zipWithIndex.map { case (m, i) => (i, m) })
      .toDF("__b", "__prev")

    // exclusive in-bucket prefix min, parallel across buckets
    val w = Window.partitionBy("__b").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val annotated = bucketed
      .join(broadcast(prevDf), Seq("__b"))
      .withColumn("__pm", least(coalesce(min(col("__g")).over(w), lit(Double.PositiveInfinity)),
        col("__prev")))
      // survive iff nothing at a strictly smaller x has y <= g(x)
      .filter(col("__g") < col("__pm"))
      .select(col("__x"), col("__g"))

    df.join(annotated, x === col("__x") && y === col("__g"))
      .drop("__x", "__g")
  }
}
