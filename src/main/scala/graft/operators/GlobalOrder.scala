package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + shard assignment — the export layout
  * step of a training-data pipeline: every row gets a reproducible
  * pseudo-random total order (`global_pos`) and a round-robin shard,
  * independent of engine, partitioning, or run (the reference's
  * pipeline delegates ordering to its downstream store; here it is a
  * first-class distributed op).
  *
  * The naive formulation — `row_number() OVER (ORDER BY key)` — is a
  * single-partition window: one task sorts the entire corpus, which is
  * exactly what cannot happen at 100 TB. This implementation exploits
  * the shuffle key's uniformity (md5 hex) to range-partition WITHOUT
  * sampling:
  *
  *  1. key = md5(id) — uniform over hex strings, so fixed-width hex
  *     prefixes are fixed-width key ranges. No RangePartitioner, no
  *     sample pass, no nondeterminism between the two jobs below.
  *  2. bucket = first `bucketChars` hex chars (16^bucketChars fixed
  *     ranges; 2 → 256, 3 → 4096 — set it so corpus/16^n fits a task).
  *  3. per-bucket counts (one partial-agg shuffle producing
  *     16^bucketChars rows) → cumulative offsets on the driver
  *     (control-plane metadata, like AQE's stats) → broadcast back.
  *  4. global_pos = offset(bucket) + rank within bucket; the bucket is
  *     a prefix of the key, so concatenating bucket-local orders IS
  *     the total key order.
  *
  * Work: one narrow scan for counts, one shuffle on the bucket for the
  * per-bucket sort. Every stage is deterministic, so the counts job
  * and the rank job agree without caching the input.
  */
object GlobalOrder {

  /** Adds `shuffle_key` (md5 hex of `idCol`), `global_pos` (0-based
    * dense rank in (shuffle_key, id) order) and `shard`
    * (= global_pos % nshards) to `df`. Ties on the key (md5 collisions)
    * break by id, so the order is total for distinct ids.
    */
  def shuffleShard(df: DataFrame, idCol: String, nshards: Int, bucketChars: Int = 2): DataFrame = {
    require(nshards > 0, s"nshards must be positive: $nshards")
    val keyed = df.withColumn("shuffle_key", md5(col(idCol).cast("string")))
    rankByPrefix(keyed, "shuffle_key", idCol, bucketChars, "global_pos")
      .withColumn("shard", pmod(col("global_pos"), lit(nshards.toLong)))
  }

  /** 0-based global position in `(keyCol, idCol)` order for ANY string
    * key, via the same two-pass prefix-bucket layout (bucket = first
    * `bucketChars` chars of the key; a string prefix is a key RANGE,
    * so concatenating bucket-local orders is the total order). Unlike
    * [[shuffleShard]]'s uniform md5 key, an arbitrary key's prefix
    * distribution may be skewed — each bucket sorts in one task, so
    * pick `bucketChars` to make the heaviest prefix fit one task (the
    * offsets collect stays bounded by the number of DISTINCT prefixes
    * observed, never data-sized). Ties on the key break by id: the
    * order is total for distinct ids.
    */
  def rankByPrefix(df: DataFrame, keyCol: String, idCol: String, bucketChars: Int,
                   posCol: String = "pos"): DataFrame = {
    require(bucketChars >= 1 && bucketChars <= 8, s"bucketChars in [1,8]: $bucketChars")
    val spark = df.sparkSession
    val keyed = df.withColumn("__bucket", substring(col(keyCol), 1, bucketChars))

    // Control-plane collect: one row per observed key prefix — bounded
    // by the prefix alphabet, never data-sized.
    val counts = keyed.groupBy("__bucket").count()
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0), r.getLong(1)))
    // A null key has no place in a total order (and would silently drop
    // through the null-unsafe bucket join below) — reject it by name.
    require(!counts.exists(_._1 == null),
      s"rankByPrefix: $keyCol contains nulls — a null key is not rankable; " +
        "filter or coalesce the key column first")
    // Driver-side bucket order must agree with the executor-side window
    // order, which compares UTF-8 BYTES (Spark's binary string order).
    // Scala's String ordering compares UTF-16 code units, which ranks
    // U+E000..U+FFFF ABOVE supplementary-plane chars — the opposite of
    // their UTF-8 byte order — so sort the collected prefixes by
    // unsigned UTF-8 bytes instead.
    val sorted = counts.sortWith((a, b) => utf8Less(a._1, b._1))
    val offsets = {
      var acc = 0L
      sorted.map { case (b, c) => val row = (b, acc); acc += c; row }
    }

    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__bucket", "__offset")
    val w = Window.partitionBy("__bucket").orderBy(col(keyCol), col(idCol))
    keyed
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn(posCol, col("__offset") + row_number().over(w).cast("long") - 1L)
      .drop("__bucket", "__offset")
  }

  /** Unsigned UTF-8 byte-order comparison — the driver-side mirror of
    * Spark's `UTF8String.compareTo` binary ordering.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}
