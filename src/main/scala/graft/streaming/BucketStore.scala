package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The hash-bucketed parquet state-table protocol, extracted from
  * [[VerifiedStream]] (r10) so every incremental maintainer shares ONE
  * storage discipline instead of re-inventing crash safety per
  * operator — the same consolidation [[SnapshotChain]] did for the
  * snapshot-chained stores (AggMaintain / ZoneMapStream).
  *
  * Layout: `path/bucket=N/` parquet dirs + a `_nbuckets` marker pinning
  * the routing (`pmod(hash(keyCols), n)`) across restarts — a changed
  * default can never split a key over two buckets. A batch rewrites
  * ONLY the buckets its keys fall in, so a point-update tick costs
  * O(touched buckets) however large the table; at 100 TB you bootstrap
  * with a few thousand buckets and each rewrite unit stays small.
  *
  * Crash windows, all covered and spec-able:
  *  - bucket swap = stage to a hidden dir, `bucket=N` -> `.bN.old`,
  *    staged -> `bucket=N`, clear `.old`; [[recoverBuckets]] restores a
  *    `.bN.old` whose live bucket is missing and clears leftovers.
  *  - root swap (bootstrap/migration) = stage at `path.tmp`, root ->
  *    `path.old`, tmp -> root; [[recoverRoot]] restores/clears.
  * The un-committed streaming checkpoint replays the interrupted batch;
  * appliers must be idempotent per batch (LWW seq guards upstream).
  */
private[streaming] object BucketStore {

  def hadoopFs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new Path(path).toUri, spark.sparkContext.hadoopConfiguration)

  /** Key -> bucket routing: Murmur3 over the key columns, mod the pinned
    * count. Deterministic across sessions and restarts (fixed-seed
    * [[org.apache.spark.sql.functions.hash]]). hash() is TYPE-sensitive
    * (hash(1) != hash(1L)) — normalize batch key dtypes to the stored
    * table's ([[storedSchema]]) before routing.
    */
  def bucketCol(keyCols: Seq[String], nb: Int): Column =
    pmod(hash(keyCols.map(col): _*), lit(nb)).cast("int")

  /** The data schema rows of `path` actually carry (first bucket dir's
    * footers), or `fallback` for an empty/missing table.
    */
  def storedSchema(spark: SparkSession, fs: FileSystem, path: String, fallback: StructType): StructType = {
    val dirs = bucketDirs(fs, path)
    if (dirs.nonEmpty) spark.read.parquet(dirs.head.toString).schema else fallback
  }

  def bucketDirs(fs: FileSystem, path: String): Array[Path] = {
    val p = new Path(path)
    if (fs.exists(p))
      fs.listStatus(p).map(_.getPath).filter(_.getName.startsWith("bucket=")).sortBy(_.getName)
    else Array.empty[Path]
  }

  /** Root-level recovery for an interrupted bootstrap or flat->bucketed
    * migration swap: a missing table with a surviving `.old` restores the
    * old table; a stray `.old` NEXT TO a live table is a post-swap
    * leftover and is cleared; a leftover `.tmp` is an incomplete write
    * and is discarded (the streaming checkpoint replays its batch).
    * Hadoop rename/delete report failure by RETURNING false — each is
    * checked, so a failed recovery fails the batch instead of silently
    * proceeding on half a table.
    */
  def recoverRoot(fs: FileSystem, path: String): Unit = {
    val p = new Path(path)
    val old = new Path(path + ".old")
    if (!fs.exists(p) && fs.exists(old)) require(fs.rename(old, p), s"recovery rename failed: $old -> $p")
    if (fs.exists(p) && fs.exists(old)) require(fs.delete(old, true), s"could not clear $old")
    val tmp = new Path(path + ".tmp")
    if (fs.exists(tmp)) require(fs.delete(tmp, true), s"could not clear $tmp")
  }

  /** Per-bucket recovery: `.bN.old` with no live `bucket=N` means the
    * crash hit between the two swap renames — restore it; `.bN.old`
    * next to a live bucket is a post-swap leftover — clear it; any
    * `.bN.tmp`/staging leftovers are incomplete writes — discard.
    */
  def recoverBuckets(fs: FileSystem, path: String): Unit = {
    val Old = """^\.b(\d+)\.old$""".r
    fs.listStatus(new Path(path)).foreach { st =>
      st.getPath.getName match {
        case Old(b) =>
          val target = new Path(s"$path/bucket=$b")
          if (!fs.exists(target)) require(fs.rename(st.getPath, target), s"recovery rename failed: ${st.getPath} -> $target")
          else require(fs.delete(st.getPath, true), s"could not clear ${st.getPath}")
        case name if name == ".batch.tmp" || (name.startsWith(".b") && name.endsWith(".tmp")) =>
          require(fs.delete(st.getPath, true), s"could not clear ${st.getPath}")
        case _ => ()
      }
    }
  }

  /** Ensure `path` is a bucketed table, returning its pinned bucket
    * count. Three cases: an existing bucketed table reads its
    * `_nbuckets` marker (the marker, not the session default, routes);
    * a legacy FLAT table is migrated in one crash-safe root swap after
    * `normalizeFlat` (schema upgrades — every bucket of a table must
    * share one schema); a missing table bootstraps empty with
    * `bootstrap`'s schema.
    */
  def ensureBucketed(
      spark: SparkSession,
      fs: FileSystem,
      path: String,
      nBuckets: Int,
      keyCols: Seq[String],
      bootstrap: => DataFrame,
      normalizeFlat: DataFrame => DataFrame = identity,
  ): Int = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val root = new Path(path)
    val marker = new Path(s"$path/_nbuckets")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
    } else if (fs.exists(root)) {
      val upgraded = normalizeFlat(spark.read.parquet(path))
      val tmp = s"$path.tmp"
      upgraded.withColumn("bucket", bucketCol(keyCols, nBuckets))
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(tmp)
      // an empty flat table writes no partition dirs; keep one
      // footer-only bucket so the table stays readable
      if (!fs.listStatus(new Path(tmp)).exists(_.getPath.getName.startsWith("bucket=")))
        upgraded.limit(0).write.mode(SaveMode.Overwrite).parquet(s"$tmp/bucket=0")
      writeMarker(fs, new Path(s"$tmp/_nbuckets"), nBuckets)
      val old = new Path(path + ".old")
      require(fs.rename(root, old), s"rename failed: $root -> $old")
      require(fs.rename(new Path(tmp), root), s"rename failed: $tmp -> $root")
      require(fs.delete(old, true), s"could not clear $old")
      nBuckets
    } else {
      val tmp = s"$path.tmp"
      bootstrap.limit(0).write.mode(SaveMode.Overwrite).parquet(s"$tmp/bucket=0")
      writeMarker(fs, new Path(s"$tmp/_nbuckets"), nBuckets)
      require(fs.rename(new Path(tmp), root), s"rename failed: $tmp -> $root")
      nBuckets
    }
  }

  def writeMarker(fs: FileSystem, at: Path, nBuckets: Int): Unit = {
    val out = fs.create(at, true)
    try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
  }

  /** A completed staging write awaiting its swap ([[stage]] ->
    * [[swapStaged]]). Splitting the two lets a multi-table applier
    * (fact + view) MATERIALIZE every table's new state before any
    * swap — the new states' plans read the old bucket files, so
    * swapping table A first would pull A's files out from under
    * table B's still-lazy plan.
    */
  final case class Staged(
      spark: SparkSession,
      path: String,
      tmpRoot: String,
      stagedIds: Seq[Int],
      touched: Seq[Int],
      schema: StructType)

  /** Write `newState` (the full new content of the touched buckets) into
    * hidden staging partitioned by bucket (dot-prefixed => invisible to
    * Spark file listings) and verify the staged ⊆ touched invariant.
    * A staged bucket OUTSIDE `touched` means routing drifted between
    * the touched computation and the write (nondeterministic key
    * exprs); its base rows were never loaded, so swapping it in would
    * lose data — fail the batch loudly BEFORE any rename.
    */
  def stage(
      fs: FileSystem,
      path: String,
      newState: DataFrame,
      keyCols: Seq[String],
      nb: Int,
      touched: Seq[Int],
  ): Staged = {
    val tmpRoot = s"$path/.batch.tmp"
    newState.withColumn("bucket", bucketCol(keyCols, nb))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(tmpRoot)
    val stagedIds = fs.listStatus(new Path(tmpRoot)).map(_.getPath)
      .filter(_.getName.startsWith("bucket=")).map(_.getName.stripPrefix("bucket=").toInt)
      .sorted.toIndexedSeq
    val touchedSet = touched.toSet
    val stray = stagedIds.filterNot(touchedSet)
    require(stray.isEmpty,
      s"staged buckets ${stray.mkString(",")} not in touched set " +
        s"${touched.mkString(",")} — nondeterministic routing, refusing to swap")
    Staged(newState.sparkSession, path, tmpRoot, stagedIds, touched, newState.schema)
  }

  /** Swap a completed staging in, bucket by bucket, atomically. A crash
    * between swaps leaves every bucket individually consistent; the
    * replayed batch re-applies as a no-op under the applier's
    * idempotence guard.
    *
    * A touched bucket the staging write produced NO dir for is handled
    * per `emptyTouchedIsDelete`:
    *  - `false` (UPDATE semantics, [[VerifiedStream]]): the base bucket
    *    is left alone — updates to absent keys change nothing.
    *  - `true` (full-state semantics, [[ViewMaintainStream]]): the new
    *    content of that bucket IS empty (e.g. a tombstone removed its
    *    last key), so the live bucket is retired through the same
    *    `.bN.old` window; if that empties the whole table, a
    *    footer-only `bucket=0` keeps it readable.
    */
  def swapStaged(fs: FileSystem, staged: Staged, emptyTouchedIsDelete: Boolean): Unit = {
    staged.stagedIds.foreach { b =>
      swapIn(fs, staged.path, b.toString, Some(new Path(s"${staged.tmpRoot}/bucket=$b")))
    }
    if (emptyTouchedIsDelete) {
      val stagedSet = staged.stagedIds.toSet
      staged.touched.filterNot(stagedSet).foreach { b =>
        swapIn(fs, staged.path, b.toString, None)
      }
      if (bucketDirs(fs, staged.path).isEmpty)
        staged.spark
          .createDataFrame(staged.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], staged.schema)
          .write.mode(SaveMode.Overwrite).parquet(s"${staged.path}/bucket=0")
    }
    require(fs.delete(new Path(staged.tmpRoot), true) || !fs.exists(new Path(staged.tmpRoot)),
      s"could not clear ${staged.tmpRoot}")
  }

  /** [[stage]] + [[swapStaged]] for the single-table case. */
  def stageAndSwap(
      fs: FileSystem,
      path: String,
      newState: DataFrame,
      keyCols: Seq[String],
      nb: Int,
      touched: Seq[Int],
      emptyTouchedIsDelete: Boolean,
  ): Unit =
    swapStaged(fs, stage(fs, path, newState, keyCols, nb, touched), emptyTouchedIsDelete)

  /** Replace (src = Some) or retire (src = None) one live bucket through
    * the `.bN.old` crash window.
    */
  private def swapIn(fs: FileSystem, path: String, b: String, src: Option[Path]): Unit = {
    val dst = new Path(s"$path/bucket=$b")
    val old = new Path(s"$path/.b$b.old")
    if (fs.exists(dst)) require(fs.rename(dst, old), s"rename failed: $dst -> $old")
    src.foreach(s => require(fs.rename(s, dst), s"rename failed: $s -> $dst"))
    if (fs.exists(old)) require(fs.delete(old, true), s"could not clear $old")
  }
}
