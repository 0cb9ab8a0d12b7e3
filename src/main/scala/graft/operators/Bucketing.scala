package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) table layout — the third leg of the join
  * strategy triad next to broadcast ([[Skew.autoPlan]]'s small-dim
  * branch) and salting ([[ScaleJoins.saltedEquiJoin]]): when two big
  * tables are joined on the same key REPEATEDLY (the fact ⋈ fact shapes
  * a warehouse sync hits every run), pay the shuffle ONCE at write time.
  * `bucketBy(n, key)` hash-partitions rows into a fixed number of
  * bucket files per partition and records the layout in the catalog;
  * a join of two tables bucketed on the join key with the SAME bucket
  * count reads co-located buckets directly — the planner drops BOTH
  * Exchange nodes (and with `sortBy` at write time, both Sorts), so the
  * recurring join costs scan + merge, never a 100 TB shuffle.
  *
  * This is the layout-level answer the reference gets implicitly from
  * its warehouses' clustered indexes
  * (/root/reference/postgresql_mysql_sync_dag.py:48-50 — the sync's
  * repeated ranged joins lean on the target DB's physical order); in
  * Spark the layout is explicit and the plan visibly loses its
  * exchanges (BucketedJoinSpec pins exactly that).
  *
  * Scale notes: bucket count is the parallelism floor for bucketed
  * scans — size it like shuffle partitions at the target scale (a few
  * thousand at 100 TB), and keep both join sides at the SAME count or
  * Spark falls back to shuffling the mismatched side. One small-file
  * hazard: each writing task emits one file per non-empty bucket, so
  * repartition on the bucket key first (done here) to keep files ≈
  * buckets.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed (and sorted) on `key`.
    * Parquet + explicit path semantics are kept out: the catalog owns
    * the layout metadata — that is what lets the planner trust the
    * bucketing at read time.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      nBuckets: Int,
      sorted: Boolean = true,
  ): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    // one shuffle now so every future join skips its own; also keeps
    // output files ≈ buckets instead of tasks × buckets
    val w = df.repartition(nBuckets, df(key))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Inner equi-join of two bucketed tables on their bucket key — a
    * plain `join` call: the value is in the PLAN, which BucketedJoinSpec
    * pins to contain no Exchange (and no Sort when both sides were
    * written `sortBy`). Result is identical to joining the unbucketed
    * frames; only the physical distribution (and the absent shuffle)
    * differs.
    */
  def bucketedEquiJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String,
  ): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
