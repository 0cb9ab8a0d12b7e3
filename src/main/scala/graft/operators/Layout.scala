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

  /** SQL text for the z-value of two integer expressions over `bits`
    * low bits each. Identical text in both dialects; fully
    * parenthesized so precedence cannot differ.
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31]: $bits")
    zValueSqlN(Seq(x, y), bits)
  }

  /** N-dimensional Morton interleaving: bit i of column j lands at
    * position i·n + j (round-robin), so `bits`·n stays within a signed
    * 64-bit value. Same engine/oracle-identical pure-integer SQL as
    * the 2-column form, which delegates here.
    *
    * Each column is SATURATING-CLAMPED into [0, 2^bits) before
    * interleaving — a weakly-monotone coarsening, so the tiling
    * property survives any input range: negatives collide at the
    * origin slice (BELOW all positives, where a raw low-bit extract
    * would wrap them above), beyond-range values collide at the top
    * slice instead of wrapping mod 2^bits. Non-negative in-range data
    * — the typical id/count/epoch track source — keeps full
    * resolution. Layout-only either way: correctness never reads the
    * z-value.
    *
    * NULL dimensions cluster at the ORIGIN slice: SQL GREATEST/LEAST
    * SKIP nulls (so a bare clamp would map NULL to the mask — the TOP
    * slice), while the write-time [[graft.sources.ZOrderFunction]]
    * clusters NULL keys at the origin; COALESCE(c, 0) BEFORE the clamp
    * keeps the SQL maintenance pass and ingest-time clustering
    * agreeing on where nullable-dimension rows land, so a mixed
    * ingest+maintain table doesn't scatter its bounding boxes.
    */
  def zValueSqlN(cols: Seq[String], bits: Int): String = {
    val n = cols.length
    require(n >= 2, s"z-order needs at least 2 columns, got $n")
    require(bits >= 1 && bits * n <= 62, s"bits*cols must fit a long: $bits*$n")
    val mask = (1L << bits) - 1
    val clamped = cols.map(c => s"GREATEST(LEAST(COALESCE(($c), 0), $mask), 0)")
    (for { i <- 0 until bits; (c, j) <- clamped.zipWithIndex } yield
      s"(((($c) >> $i) & 1) << ${i * n + j})").mkString("(", " + ", ")")
  }

  /** Idempotent partitioned ingestion: write `df` into a
    * date/key-partitioned parquet table overwriting ONLY the partitions
    * present in this batch (dynamic partition overwrite), leaving every
    * other partition untouched. This is the re-ingestion contract a
    * daily pipeline needs — replaying one day's extract must not
    * truncate the table (static overwrite mode would) and must not
    * duplicate rows (append mode would).
    *
    * The mode is set on the single write, not session-wide, via the
    * DataFrameWriter option — no global config mutation.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
  }

  /** Compact a parquet directory to ~`targetBytes` files: the
    * small-files maintenance pass every long-lived table needs (a
    * streaming sink or over-parallel write leaves thousands of KB-size
    * files; each costs a task + a footer read + namenode metadata at
    * every scan). File count = ceil(current bytes / target), data
    * re-written once via coalesce (no shuffle — partitions merge
    * without moving rows between executors more than the merge
    * requires), then a retire-and-rename swap so readers never see a
    * HALF-compacted table. The swap is two renames, not one atomic op:
    * a reader listing the path exactly between them sees it absent —
    * this is a single-writer MAINTENANCE op to schedule outside query
    * windows (the same contract as the verified-store rebucket).
    *
    * Returns (filesBefore, filesAfter). Row content is preserved
    * exactly (spec-checked); ordering within the table is not a
    * parquet contract and is not preserved.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val dir = new java.io.File(path)
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.length()).sum
    val nFiles = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    val tmp = path.stripSuffix("/") + ".compact-tmp"
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    // atomic swap: retire the old dir, move the new one in
    val old = new java.io.File(path.stripSuffix("/") + ".compact-old")
    deleteRec(old)
    require(dir.renameTo(old), s"could not retire $path")
    require(new java.io.File(tmp).renameTo(dir), s"could not install $tmp")
    deleteRec(old)
    val after = Option(dir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
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
  def zorder(df: DataFrame, xCol: String, yCol: String, bits: Int, nParts: Int): DataFrame =
    zorderN(df, Seq(xCol, yCol), bits, nParts)

  /** [[zorder]] over ANY number of dimensions (≥ 2) — Delta/Iceberg
    * `OPTIMIZE ZORDER BY (c1, ..., cn)` parity; bounding boxes tile
    * the n-dimensional space.
    */
  def zorderN(df: DataFrame, cols: Seq[String], bits: Int, nParts: Int): DataFrame = {
    require(nParts > 0, s"nParts must be positive: $nParts")
    df.withColumn("__z", expr(zValueSqlN(cols, bits)))
      .repartitionByRange(nParts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
