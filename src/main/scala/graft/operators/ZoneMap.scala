package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps (min/max data skipping) as a first-class operator.
  *
  * A 100 TB table answers a selective range predicate fast only if the
  * engine can SKIP data, not scan-and-filter it. Parquet gives this per
  * row group on the columns the file happens to be sorted by; a zone map
  * generalizes it: pick a clustering expression (ingest day, tenant
  * bucket, z-value — anything coarse and deterministic), collect min/max
  * of the queried columns per zone once, and at query time consult the
  * tiny zone-map table first — only zones whose [min,max] envelope
  * overlaps the predicate are read. The same structure a warehouse
  * maintains implicitly (the reference's Postgres BRIN-style skip
  * indexes on its sync targets), expressed as two DataFrame transforms.
  *
  * The map is an aggregate (one shuffle at build time, map-side partial)
  * whose size is O(zones), e.g. a few thousand rows for calendar-month
  * zones over years of data — always broadcastable at query time.
  */
object ZoneMap {

  /** Build the zone map: per distinct `zone` value, row count and
    * min/max of every tracked column. `zone` must be a deterministic
    * pure function of the row (it is re-evaluated at prune time).
    */
  def build(df: DataFrame, zone: Column, track: Seq[String]): DataFrame = {
    val stats = track.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("zone_rows")
    df.groupBy(zone.as("zone")).agg(stats.head, stats.tail: _*)
  }

  /** Merge two zone maps built with the same zone expression and
    * tracked columns — min-of-mins / max-of-maxes / sum-of-counts per
    * zone. min/max/sum are associative and commutative, so a zone map
    * maintains INCREMENTALLY: build one over each arriving batch
    * (map-only over the new data) and fold with merge, never re-scanning
    * history. This is the same fold contract as
    * [[graft.pipeline.ViewMaintain.foldBatches]]; a streaming ingest
    * calls it per micro-batch from foreachBatch. Tracked-column names
    * are recovered from the schema (`min_*` / `max_*` / `zone_rows`),
    * so callers can't accidentally merge maps with different specs —
    * mismatched schemas fail the union loudly.
    *
    * Deletes are the documented limit, as for any min/max sketch: a
    * removed row can leave a zone envelope wider than the live data,
    * which keeps pruning CORRECT (envelopes only over-approximate) but
    * less selective; rebuild affected zones to re-tighten.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val stats = a.schema.fieldNames.toSeq.collect {
      case c if c.startsWith("min_") => min(col(c)).as(c)
      case c if c.startsWith("max_") => max(col(c)).as(c)
      case "zone_rows" => sum(col("zone_rows")).as("zone_rows")
    }
    a.unionByName(b).groupBy("zone").agg(stats.head, stats.tail: _*)
  }

  /** Scan `df` for rows with `lo <= trackedCol <= hi`, reading only the
    * zones whose envelope overlaps [lo, hi].
    *
    * The zone map is filtered to overlapping zones (a few rows), then
    * semi-joined back on the zone expression — Catalyst broadcasts the
    * tiny side, so the big scan is gated by a broadcast hash semi join
    * on the zone id: the per-row work is one coarse key probe instead of
    * the full predicate, and on a layout where `zone` is a partition
    * column this collapses to real partition pruning (the scan never
    * opens non-overlapping files). The exact predicate still runs on the
    * surviving zones — zone skipping is an OPTIMIZATION, bit-identical
    * to the plain filter, which is what makes it safe to apply
    * mechanically. A row whose zone expression evaluates to null (e.g. a
    * null tenant bucket) belongs to the null-zone envelope [[build]]
    * keeps (groupBy retains a null group) — zone and tracked column are
    * independent, so such rows must survive whenever trackedCol is in
    * range. A single null-safe `<=>` join would express that but defeats
    * dynamic partition pruning (DPP requires a null-intolerant key), so
    * the gate splits: non-null zones keep the `===` broadcast semi join
    * (DPP fires on partitioned layouts), and the null group unions in
    * through its own branch, kept iff a live null-zone envelope exists —
    * a trivially-true semi probe against a <= 1-row broadcast, and on a
    * zone-partitioned layout the `isNull` filter statically prunes that
    * branch to the lone null partition.
    */
  def prunedScan(
      df: DataFrame,
      zone: Column,
      zoneMap: DataFrame,
      trackedCol: String,
      lo: Column,
      hi: Column): DataFrame = {
    val live = zoneMap
      .filter(col(s"max_$trackedCol") >= lo && col(s"min_$trackedCol") <= hi)
      .select(col("zone"))
    val liveNonNull = live.filter(col("zone").isNotNull)
    val keptNonNull = df.join(broadcast(liveNonNull), zone === liveNonNull("zone"), "left_semi")
    val liveNull = live.filter(col("zone").isNull)
    val keptNull = df.filter(zone.isNull).join(broadcast(liveNull), lit(true), "left_semi")
    keptNonNull.unionByName(keptNull).filter(col(trackedCol).between(lo, hi))
  }
}
