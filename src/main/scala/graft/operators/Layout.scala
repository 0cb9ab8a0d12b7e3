package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering, the
  * write-side half of multi-dimensional scan pruning. Files written in
  * z-value order have small per-file bounding boxes over BOTH
  * dimensions, so a reader filtering on either (or both) columns skips
  * most files on min/max stats — the layout trick behind
  * Delta/Iceberg OPTIMIZE ZORDER, expressed here as plain Spark:
  * a pure-integer z-value expression + a range repartition + a
  * sortWithinPartitions.
  *
  * The z-value is bit interleaving: bit i of x lands at position 2i,
  * bit i of y at 2i+1. Pure integer shifts/masks — the same SQL text
  * evaluates identically in Spark and DuckDB, so the kernel is
  * oracle-checkable (q90).
  */
object Layout {

  /** SQL text for the z-value of two non-negative integer expressions
    * over `bits` low bits each (values beyond 2^bits-1 fold into the
    * top slice: callers clamp or mask first). Identical text in both
    * dialects; fully parenthesized so precedence cannot differ.
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31]: $bits")
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Cluster `df` into `nParts` z-ordered range partitions on
    * (xCol, yCol): rows are assigned by z-value range, sorted by
    * z-value within each partition. Writing the result
    * partition-per-file yields files whose (x, y) bounding boxes tile
    * the space instead of each spanning it — ScaleSpecs measures the
    * bbox-area shrinkage against a hash-shuffled baseline. One range
    * exchange (sampled on the cheap z integer, not on payload
    * columns); the sort is per-partition.
    */
  def zorder(df: DataFrame, xCol: String, yCol: String, bits: Int, nParts: Int): DataFrame = {
    require(nParts > 0, s"nParts must be positive: $nParts")
    df.withColumn("__z", expr(zValueSql(xCol, yCol, bits)))
      .repartitionByRange(nParts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
