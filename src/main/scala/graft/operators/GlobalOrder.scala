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
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = {
      var acc = 0L
      counts.map { case (b, c) => val row = (b, acc); acc += c; row }
    }

    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__bucket", "__offset")
    val w = Window.partitionBy("__bucket").orderBy(col(keyCol), col(idCol))
    keyed
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn(posCol, col("__offset") + row_number().over(w).cast("long") - 1L)
      .drop("__bucket", "__offset")
  }
}
