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
    * The zone map is filtered to overlapping zones and COLLECTED — the
    * map is control-plane-sized by construction (O(zones), "a few
    * thousand rows for calendar-month zones over years of data"), the
    * same boundedness class as VerifiedStream's touched-bucket list, so
    * this is a metadata read, never a data collect. The gate is then a
    * single LITERAL filter on the zone expression: `zone IN (live
    * zones)` (an `InSet` once the list is non-tiny), plus `zone IS
    * NULL` iff a live null-zone envelope exists (a null tenant bucket
    * with in-range rows must survive — zone and tracked column are
    * independent). On a layout where `zone` is a partition column the
    * IN lands in the scan's PartitionFilters as STATIC partition
    * pruning — non-overlapping files are never opened, with none of
    * the broadcast/DPP machinery a semi-join gate needs (r10 shipped
    * that design; the literal gate evaluates the map ONCE, prunes at
    * PLANNING time rather than runtime, and handles the null zone in
    * the same filter). The exact predicate still runs on the surviving
    * zones — zone skipping is an OPTIMIZATION, bit-identical to the
    * plain filter, which is what makes it safe to apply mechanically.
    *
    * Eager: the zone-map plan executes at call time (one tiny job);
    * persisted/streaming-maintained maps ([[ZoneMapStream]]) make that
    * a footer-sized parquet read.
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
      .collect().map(_.get(0))
    val (nullZone, liveZones) = live.partition(_ == null)
    val gate =
      if (liveZones.isEmpty && nullZone.isEmpty) lit(false)
      else if (liveZones.isEmpty) zone.isNull
      else if (nullZone.isEmpty) zone.isin(liveZones.toIndexedSeq: _*)
      else zone.isin(liveZones.toIndexedSeq: _*) || zone.isNull
    df.filter(gate).filter(col(trackedCol).between(lo, hi))
  }
}
