package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Session factory for the graft engine.
  *
  * Spark-native re-expression of the capability surface of
  * grohan2002/datapipeline-dags (see /root/repo/SURVEY.md). Local-mode
  * defaults here mirror a sane cluster config: AQE on, shuffle
  * partitions sized to cores (not the 200 default), UTC session time
  * so results are comparable across engines.
  */
object Engine {
  /** Single source of truth for session config — Bench and Verify build
    * their sessions here too, so a config change (e.g. nanosAsLong) can
    * never silently skew bench/verify vs engine behavior.
    */
  def session(appName: String = "graft", cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    // SPARK_GRAFT_MASTER lets a cluster deployment (spark-submit --master
    // yarn/k8s) reuse this factory; the local[] default serves the
    // driver-harness and tests
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]")
    val builder = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      // native codegen'd kernels (vec_dot, poly_hash) via the public
      // extensions hook — see graft.functions.GraftFunctions
      .withExtensions(graft.functions.GraftFunctions.register)
      // cores/4, not cores: at local scale every shuffle stage launches
      // one task per partition, and task scheduling dominates sub-GB
      // shuffles — measured r8 sweep: partitions=8 beats 32 on BOTH the
      // floor-bound subset (2.77 -> 1.71 s) and the CPU-heavy shuffle
      // subset (6.67 -> 5.82 s) at sf0.1, because AQE's skew split
      // still fans the heavy tail out across cores. A cluster
      // deployment at real scale MUST override (SPARK_GRAFT_EXTRA_CONF
      // or SPARK_GRAFT_SHUFFLE_PARTITIONS): size to ~2-3x total cores
      // with partitions sized so each fits in executor memory.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          math.max(2, cores.toIntOption.getOrElse(32) / 4).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE partition coalescing stays at the parallelismFirst=true
      // default deliberately: shuffle BYTES are a bad proxy for shuffle
      // CPU, and pure size-based coalescing (parallelismFirst=false,
      // 64 MB advisory) folded the medium-byte but CPU-heavy shingle
      // joins to 1-2 partitions — measured 2x on q26/q60. At the 100 TB
      // design point the flag is moot (every real shuffle is far above
      // advisory x parallelism); at small scale keeping cores busy wins.
      .config("spark.sql.session.timeZone", "UTC")
      // the generated-class cache defaults to 100 entries; a session
      // running the full 55-query catalog holds several codegen stages
      // per query, so at 100 the LRU thrashes and every re-run of a
      // query pays full Janino recompilation (~0.1-0.3s/stage). On a
      // long-lived cluster session the working set of compiled plans is
      // exactly what this cache is for — size it to hold it.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Truncated-lineage checkpoint blocks (Lineage.pin /
      // localCheckpoint — the iterative operators and the pinned
      // posting frames) are reclaimed by ContextCleaner only after
      // their RDD object is garbage-collected, and the driver's
      // periodic GC defaults to every 30 MINUTES — so on a session
      // cycling many pin-carrying queries the dead blocks pile up in
      // storage memory (not evictable by execution demand: a
      // truncated-lineage block cannot be recomputed), squeezing
      // aggregates and joins into earlier spills. A 30 s periodic GC
      // keeps the reclaim prompt on exactly such sessions — measured
      // r20, sf1 8-query mix: 68.2 -> 61.6 s (q160 0.81x, q217 0.86x,
      // q108 0.83x) with sf0.1 neutral. Same reasoning holds for a
      // long-lived cluster driver; note the cost is a driver-side
      // System.gc() per interval, so a deployment with a very large
      // driver heap and few pin-cycling operators should RAISE this
      // (2-5min) via SPARK_GRAFT_PERIODIC_GC / SPARK_GRAFT_EXTRA_CONF —
      // the win is specific to sessions that cycle truncated-lineage
      // blocks faster than the 30min default reclaims them.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "30s"))
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read as long and rebuild micros in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Deployment escape hatch: semicolon-separated k=v pairs, applied
    // last so a cluster submit (or a perf experiment) can override any
    // default above without a code change.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { s =>
      s.split(';').iterator.filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Lazy handles on the driver-provided TESTDATA parquet tables
  * (see /root/repo/TESTDATA.md). Reads are plain parquet scans so
  * Catalyst can push filters and prune columns into the file source.
  */
object Tables {
  /** DataFrames are immutable logical plans, so one handle per
    * (session, dir, table) is safe to share. Without this cache every
    * query construction re-lists the directory and re-reads parquet
    * footers for schema inference — a fixed per-query cost that
    * dominates at bench scale and is pure waste on a long-lived
    * cluster session. Keyed on the session instance so a stopped and
    * recreated session never sees a stale handle.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** A handle caches the FILE LISTING made at first read: table dirs are
    * treated as immutable for the lifetime of a session (the TESTDATA
    * contract). A dir rewritten in place mid-session must be
    * invalidated or the cached handle serves stale/missing files.
    */
  def invalidate(dir: String): Unit =
    cache.keySet.removeIf(_._2 == dir)

  /** Entries for stopped sessions are dead weight (a stopped session's
    * plans/file indexes can never be reused) and a strong-keyed map
    * would retain them forever in a long-lived JVM that cycles
    * sessions — e.g. the test suites. Swept on every lookup, BEFORE the
    * computeIfAbsent: the CHM contract forbids a mapping function from
    * mutating the map it runs inside (undefined behavior when a stale
    * key hashes into the bin being computed). The map holds a handful
    * of (session, dir, table) keys, so the sweep is a few pointer
    * reads, never a listing.
    */
  private[graft] def sweepStopped(): Unit =
    cache.keySet.removeIf(_._1.sparkContext.isStopped)
}

final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = {
    Tables.sweepStopped()
    Tables.cache.computeIfAbsent((spark, dir, name), { _ =>
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // TESTDATA timestamps have shipped as both isAdjustedToUTC µs
      // (reads as TimestampType) and naive µs (reads as TIMESTAMP_NTZ);
      // the engine's contract is TimestampType in the UTC session zone,
      // where both encodings denote the same wall-clock instant. Cast
      // NTZ arrivals once at the source so every operator, window and
      // watermark downstream sees one type regardless of which writer
      // produced the files.
      raw.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
      }.foldLeft(raw) { (df, c) =>
        df.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
      }
    })
  }
  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** ts is TIMESTAMP(NANOS) in the parquet footer; Spark reads it as long
    * (nanosAsLong). Rebuild a TimestampType with integer FLOOR division —
    * double division would lose precision above 2^53 ns, and `div` alone
    * truncates toward zero (off-by-1µs for pre-1970 nanos). Sub-µs
    * precision is intentionally dropped; queries ordering on ts tie-break
    * on event_id, so the drop is observable-safe.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          expr("timestamp_micros((ts - ((ts % 1000) + 1000) % 1000) div 1000)"))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** Cross-engine-deterministic numeric helpers.
  *
  * Double summation is order-dependent, so `sum(double)` differs in the
  * last bits between engines (and between shuffle layouts). All TESTDATA
  * money columns are 2-decimal values, so summing them as exact decimals
  * and casting the exact result back to double is bit-identical in any
  * engine and any partitioning — this is also the right answer at 100 TB,
  * where partial-aggregate ordering is nondeterministic by design.
  */
/** Sort placement for expensive row-wise projections.
  *
  * `project(base).orderBy(keys)` executes the WHOLE projected plan
  * twice: Spark's global sort range-partitions its child, and the range
  * boundaries come from a sampling pass over that child before the real
  * pass runs (shuffle-less children are recomputed, not reused). When
  * the projection is expensive per row (JSON round trips, tokenization,
  * feature extraction) and the sort keys already exist on the base,
  * sampling the projection is pure waste — at any scale.
  *
  * `Sorting.projected` range-partitions the CHEAP base on the sort keys
  * (the sampling pass then touches only the narrow scan), applies the
  * projection once per row post-shuffle, and sorts within partitions.
  * Range partition i holds keys <= partition i+1's, so the result is
  * the same total order orderBy produces.
  *
  * Contract: `project` must be row-wise (no shuffle/agg inside) and
  * must not need the pre-shuffle partitioning; `keys` must be columns
  * of `base`.
  */
object Sorting {
  def projected(base: DataFrame, keys: Column*)(project: DataFrame => DataFrame): DataFrame = {
    // EXPLICIT partition count: AQE coalesces a no-N range repartition
    // by the BASE's byte size, and a few MB of text coalesce to one
    // partition — running the expensive projection (the whole reason
    // this helper exists) on one core. The projection's cost is
    // invisible to AQE's byte-based advisory; a user-specified N is
    // never coalesced. (Measured on the WAV-codec path: 32x-wide vs
    // single-core at the sf1 slope point.)
    //
    // TRULY-TINY bases skip the exchange entirely: the range
    // repartition's fixed machinery — a sampling job over the base
    // plus a shuffle stage — buys nothing when the whole corpus is a
    // few tens of KB. Below the threshold: merge to ONE partition
    // (narrow, no shuffle), local sort, then project — row-wise
    // projection preserves order, so the single partition IS the total
    // order, with zero exchange jobs. A non-file base whose stats are
    // the default-huge guess simply takes the parallel path — the safe
    // direction. (The r18 first cut set this threshold at 2 MB chasing
    // a WAV regression; the real cause was the codec trying AIFF/AU
    // readers per row — exception construction per non-matching
    // provider — fixed at the root in Multimodal.WavCodec, after which
    // WIDE wins for every codec at a 600 KB corpus.)
    val spark = base.sparkSession
    val bytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
    val threshold = spark.conf.get(
      "spark.graft.projected.singleCoreBytes", Sorting.singleCoreBytes.toString).toLong
    if (bytes <= threshold) {
      project(base.coalesce(1).sortWithinPartitions(keys: _*))
    } else {
      // wide path, sized to the base's planning-time bytes at a FAR
      // smaller per-partition target than AQE's 64 MB advisory (the
      // projection multiplies per-byte cost ~50x: real codec passes,
      // JSON round trips); never above the session's shuffle
      // parallelism. Measured at sf0.1 (600 KB of documents): PNG
      // enc+dec 0.62 s at 1-way vs 0.36 s at 8-way — the fan-out pays
      // for its exchange well below 1 MB of compressed text.
      val cap = spark.sessionState.conf.numShufflePartitions
      val target = spark.conf.get(
        "spark.graft.projected.targetBytes", Sorting.targetBytesPerPartition.toString).toLong
      val parts = (bytes + target - 1) / target
      val n = math.max(2, if (parts > cap) cap else parts.toInt)
      project(base.repartitionByRange(n, keys: _*)).sortWithinPartitions(keys: _*)
    }
  }

  /** Base-plan size below which [[projected]] runs single-partition:
    * a corpus this small projects in less than the fixed cost of a
    * range exchange on the local job floor, and on a cluster a base
    * this small never needed a fan-out.
    */
  private[graft] val singleCoreBytes: Long = 64L * 1024

  /** The wide path's per-partition byte target — deliberately tiny
    * next to AQE's 64 MB advisory because the projection behind this
    * helper is 10-100x costlier per byte than the scan.
    */
  private[graft] val targetBytesPerPartition: Long = 64L * 1024
}

object Num {
  /** Exact order-independent sum of a decimal-precision double column.
    *
    * Semantics: CAST(sum(CAST(c AS DECIMAL(_, scale))) AS DOUBLE) —
    * every row rounded HALF_UP at `scale`, summed exactly, one
    * correctly-rounded conversion at the end, so the value is
    * bit-identical in any engine and any partitioning. Executed on the
    * engine's 128-bit integer accumulator
    * ([[graft.functions.DecimalSum128]]): ~2x the throughput of
    * Spark's BigDecimal-backed decimal Sum on the TPC-H Q1 shape, same
    * exact result (equivalence pinned by NumSpecs).
    *
    * Domain: the input is evaluated as DOUBLE (a decimal or long column
    * is cast first, so integers above 2^53 lose exactness before
    * rounding), and each row must satisfy |v·10^scale| < 2^63 — at the
    * default scale 2 that is |v| < ~9.2e16 per row (the 128-bit bound
    * applies to the running SUM, which overflows-checked at ~1.7e36).
    * Rows beyond the per-row bound throw ArithmeticException rather
    * than silently wrapping; money-valued columns never approach it.
    * For exact sums of wide decimal/long columns use Spark's builtin
    * `sum(col.cast("decimal(38,s)"))` instead.
    */
  def dsum(c: Column, scale: Int = 2): Column = dsumRaw(c, scale).cast("double")

  /** The aggregate Column BEFORE the final double cast — for window
    * frames, where `.over(w)` must attach to the aggregate itself
    * (`dsumRaw(c).over(w).cast("double")`).
    */
  def dsumRaw(c: Column, scale: Int = 2): Column =
    call_function("graft_dsum128",
      call_function("graft_unscaled", c.cast("double"), lit(scale)), lit(scale))

  /** Exact mean: decimal sum divided by count, evaluated in double. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))
}
