package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage

/** Incremental JOIN-view maintenance: keep a materialized fact ⋈ dim
  * view current under batches of keyed upserts and tombstone deletes,
  * re-joining ONLY the touched keys — the delta-join member of the
  * incremental-materialization family next to [[graft.streaming
  * .AggMaintain]] (aggregates) and the SCD2/point-in-time operators
  * ([[graft.operators.Cdc]]).
  *
  * Per batch, with Δ = the batch's keys:
  *
  *   fact' = fact ⊖ Δ  ∪  LWW(fact|Δ ∪ batch) \ tombstones
  *   view' = view ⊖ Δ  ∪  (fact'|Δ ⋈ dim)
  *
  * The dim join — the expensive step the view exists to amortize —
  * costs O(|Δ|) rows per batch, never O(|fact|); a full recompute pays
  * the whole fact ⋈ dim every time. LWW resolution is per-key
  * max-(seq, payload) (seq ties broken on the payload struct so
  * resolution is deterministic even under a malformed duplicate
  * (key, seq); the correct-usage contract is unique seq per key),
  * identical to the verified-update applier's cross-batch guard
  * ([[VerifiedUpdates]]) — so replaying a batch resolves to identical
  * rows: the step is idempotent.
  *
  * Scale shape: the ⊖/| operations are keyed semi/anti joins,
  * co-partitioned with the union that follows — one shuffle each in
  * this algebraic (in-memory/parquet-snapshot) form. Deployed against
  * the hash-bucketed store layout ([[graft.streaming.VerifiedStream]]:
  * `bucket = pmod(hash(key), n)` dirs, atomic per-bucket swap,
  * crash-recovery markers), they become partition-pruned reads and
  * touched-bucket-only rewrites — a 1-key batch rewrites one fact
  * bucket and one view bucket however large the table. The algebra
  * here is what q141 hash-verifies; the storage protocol is spec'd on
  * its own store.
  *
  * The reference replays its whole source table per sync run
  * (postgresql_mysql_sync_dag.py:48-50 ranged full scans [inferred]);
  * this operator is the incremental form of that sync's join step.
  */
object ViewMaintain {

  /** Broadcast-or-not decision per dim FRAME, memoized: the dim is the
    * maintenance loop's invariant — its size cannot change between
    * folds/micro-batches of one session by definition — but
    * `optimizedPlan.stats` runs a full driver-side analyze+optimize of
    * the dim plan, so estimating it inside [[applyBatch]] charged that
    * planning cost once PER FOLD (r19 verdict #3: the per-fold estimate
    * showed up at sf1 as ~0.5 s across q141's 4 folds). Keyed on the
    * DataFrame instance (identity — DataFrame doesn't override equals)
    * with weak keys so retired frames don't pin their plans; a caller
    * that constructs a fresh dim frame per batch simply re-estimates,
    * which is the old behavior. The decision caches the session conf
    * (`spark.graft.viewMaintain.broadcastDimBytes`) read at first use
    * for that frame — flipping the conf mid-loop applies from the next
    * distinct dim frame, documented here.
    */
  private val dimSideMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, java.lang.Boolean]())

  private def dimSideOf(dim: DataFrame): DataFrame = {
    // Memoize the DECISION (a boxed Boolean), never the frame: a value
    // that references the key (directly, or via a broadcast() wrapper
    // over its plan) would make the weak entry strongly reachable from
    // itself and leak retired dim plans for the JVM lifetime.
    val shouldBroadcast = dimSideMemo.computeIfAbsent(dim, { d =>
      // the hint is GATED on estimated dim size: an unconditional
      // broadcast of a dim larger than driver/executor memory OOMs
      // where the adaptive plan would shuffle — past the cap, fall back
      // to the planner's choice (the delta side is O(|Δ|); with AQE it
      // usually broadcasts the DELTA instead, the right inversion).
      val capBytes = d.sparkSession.conf
        .get("spark.graft.viewMaintain.broadcastDimBytes", (256L << 20).toString).toLong
      val dimSize = d.queryExecution.optimizedPlan.stats.sizeInBytes
      java.lang.Boolean.valueOf(dimSize <= BigInt(capBytes))
    })
    if (shouldBroadcast) broadcast(dim) else dim
  }

  /** One maintenance step. `fact`/`view` are the current states
    * (`fact`: key ++ payload ++ seq, LWW-resolved, tombstones already
    * gone; `view`: fact columns ++ dim columns). `batch` carries
    * key ++ payload ++ seq ++ `deletedCol` (true = tombstone). `dim`
    * must not share column names with the fact. Returns (fact',
    * view'); the caller persists/localCheckpoints between folds to
    * keep the iterated plan flat.
    */
  def applyBatch(
      fact: DataFrame,
      view: DataFrame,
      batch: DataFrame,
      keyCol: String,
      seqCol: String,
      deletedCol: String,
      dim: DataFrame,
      factJoinCol: String,
      dimJoinCol: String,
  ): (DataFrame, DataFrame) = {
    val payload = batch.columns.filterNot(c => c == keyCol || c == seqCol || c == deletedCol)
    require(payload.nonEmpty, "batch has no payload columns")
    require(dim.columns.intersect(batch.columns).isEmpty,
      s"dim/fact column collision: ${dim.columns.intersect(batch.columns).mkString(",")}")

    val touched = batch.select(keyCol).distinct()
    val factTouched = fact.join(touched, Seq(keyCol), "left_semi")
      .withColumn(deletedCol, lit(false))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc, struct(payload.map(col).toIndexedSeq: _*).desc)
    val resolved = factTouched.unionByName(batch.select(factTouched.columns.map(col): _*))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      .filter(!col(deletedCol)).drop(deletedCol)

    val fact2 = fact.join(touched, Seq(keyCol), "left_anti").unionByName(resolved)
    // the dim side is the INVARIANT of the maintenance loop: broadcast
    // it explicitly so every fold's delta join is a map-side hash probe
    // with no dim-side shuffle, whatever the session threshold says
    // (the view exists to amortize dim-join work to O(|Δ|); shuffling
    // the dim per fold would charge O(|dim|) per batch anyway). Size
    // gate + memoization in [[dimSideOf]]; escape hatch:
    // spark.graft.viewMaintain.broadcastDimBytes.
    val delta = resolved.join(dimSideOf(dim), col(factJoinCol) === col(dimJoinCol))
    val view2 = view.join(touched, Seq(keyCol), "left_anti")
      .unionByName(delta.select(view.columns.map(col): _*))
    (fact2, view2)
  }

  /** Fold a deterministic batch sequence from empty state — the batch
    * form q141 verifies (a stream deployment wires [[applyBatch]] into
    * foreachBatch exactly like AggMaintain.start).
    */
  def foldBatches(
      batches: Seq[DataFrame],
      keyCol: String,
      seqCol: String,
      deletedCol: String,
      dim: DataFrame,
      factJoinCol: String,
      dimJoinCol: String,
  ): (DataFrame, DataFrame) = {
    require(batches.nonEmpty, "need at least one batch")
    val factSchema = batches.head.drop(deletedCol)
    val emptyFact = factSchema.limit(0)
    val emptyView = factSchema.join(dim, col(factJoinCol) === col(dimJoinCol)).limit(0)
    // Pin (localCheckpoint) every SECOND fold — the PageRank cadence
    // ([[graft.operators.PageRank]] flattens every 8th hop), scaled to
    // the deeper per-fold plan here (window + 3 keyed joins): each pin
    // is an EAGER job paying the scheduler floor twice (fact + view),
    // so pinning all k folds serializes 2k fixed costs; one unpinned
    // level costs at most one bounded recompute of cheap keyed algebra
    // (fact' feeds the next fold's semi + anti probes). Always pin the
    // LAST fold so callers receive materialized, reusable state.
    batches.zipWithIndex.foldLeft((emptyFact, emptyView)) { case ((f, v), (b, i)) =>
      val (f2, v2) = applyBatch(f, v, b, keyCol, seqCol, deletedCol, dim, factJoinCol, dimJoinCol)
      if (i % 2 == 1 || i == batches.size - 1) pinPair(f2, v2)
      else (f2, v2)
    }
  }

  /** Materialize the (fact, view) pair as ONE eager job: the view's
    * columns are a superset of the fact's, so both states union into a
    * single tagged frame, localCheckpoint once, and split back with
    * two filters over the materialized partitions (no recompute). Each
    * [[Lineage.pin]] is an eager job paying the scheduler floor; the
    * maintenance loop's fixed cost is 2 jobs/fold pinned separately vs
    * 1 here — at the local job floor that halves the serialized
    * latency the fold can never parallelize away.
    */
  private def pinPair(f: DataFrame, v: DataFrame): (DataFrame, DataFrame) = {
    val dimCols = v.columns.filterNot(f.columns.contains).toIndexedSeq
    // collision-proof tag name: applyBatch accepts ARBITRARY frames
    // (unlike catalog tables, where __ names are refused at create),
    // so a fact that already carries "__state" must not be shadowed —
    // suffix until free
    val tag = Iterator.iterate("__state")(_ + "_").find(!v.columns.contains(_)).get
    val fWide = f.select((f.columns.map(col).toIndexedSeq ++
        dimCols.map(c => lit(null).cast(v.schema(c).dataType).as(c))): _*)
      .withColumn(tag, lit(0))
    val vWide = v.select((f.columns.map(col).toIndexedSeq ++ dimCols.map(col)): _*)
      .withColumn(tag, lit(1))
    val pinned = Lineage.pin(fWide.unionByName(vWide))
    (pinned.filter(col(tag) === 0).select(f.columns.map(col).toIndexedSeq: _*),
      pinned.filter(col(tag) === 1).select(v.columns.map(col).toIndexedSeq: _*))
  }
}
