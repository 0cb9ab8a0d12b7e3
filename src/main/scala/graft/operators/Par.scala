package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, Window}

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
    val plan = df.queryExecution.optimizedPlan
    // The byte estimate is trustworthy only when it flows from leaf
    // scans (real file sizes through project/filter). Join, aggregate,
    // window and generate outputs are row-size guesses multiplied
    // together — an inflated guess there must not buy an exchange, and
    // those operators already shuffled to spark.sql.shuffle.partitions
    // width anyway, which is the 1-2-task problem widen exists to fix
    // not having happened.
    val synthetic = plan.find {
      case _: Join | _: Aggregate | _: Window | _: Generate => true
      case _ => false
    }.isDefined
    if (synthetic) return df
    val bytes = plan.stats.sizeInBytes
    // Cap at a small multiple of the session's core count: widen fixes
    // degenerate 1-2-task stages; it must never PICK a global shuffle
    // width (a corpus at bytes >> cores*targetBytes is exactly the
    // naturally-wide-at-cluster-scale case where the premise says the
    // exchange shouldn't fire wider than the machine can run).
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val cap = math.max(cores * 4, 32)
    val want = ((bytes / targetBytes) + 1).min(BigInt(cap)).toInt
    if (want > df.rdd.getNumPartitions) df.repartition(want) else df
  }
}
