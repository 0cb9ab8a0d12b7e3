package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism sizing for CPU-heavy kernel stages.
  *
  * A small-on-disk but expensive-to-process table (documents: 7 MB of
  * parquet that tokenizes into millions of rows) reads in 1-2
  * partitions under the default 128 MB split size, so every downstream
  * map kernel (tokenize, shingle, explode) and — worse — every
  * PARTIAL AGGREGATE over near-unique keys runs 1-2 tasks wide: the
  * partial-agg hash map takes the whole table's keys in one task,
  * overflows, and falls back to sort-based aggregation with spills
  * (measured 34 s vs 4 s for the identical q217 plan; 3.0 s vs 1.2 s
  * for q109). At real cluster scale the scan is naturally wide and
  * [[widen]] never fires — it exists for the small-file/fat-kernel
  * corner, which local benches and the long tail of real tables
  * (dimension-sized inputs feeding quadratic or token-explode work)
  * both hit.
  *
  * Sizing reads the optimizer's byte estimate off the plan — no job,
  * no collect — so the exchange is only inserted when the estimated
  * bytes/partition exceed the target. Callers whose amplification is
  * knowable exactly (q217's window count) should size by OUTPUT rows
  * instead; this is the generic input-bytes form.
  */
object Par {

  /** Repartition `df` so each task holds at most ~`targetBytes` of the
    * optimizer-estimated input — a no-op (returns `df` unchanged, no
    * exchange) when the current partitioning is already at least that
    * wide.
    */
  def widen(df: DataFrame, targetBytes: Long = 256L << 10): DataFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (bytes / targetBytes).min(BigInt(1L << 20)).toInt + 1
    if (want > df.rdd.getNumPartitions) df.repartition(want) else df
  }
}
