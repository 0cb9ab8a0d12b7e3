package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming-read position over a manifest table: the last manifest
  * VERSION whose rows have been delivered, plus whether the initial
  * snapshot (the table content as of the stream's starting version)
  * has been emitted yet. Manifest versions are the natural streaming
  * offset — they are totally ordered, durable, and each one names its
  * file delta exactly — the same choice Delta's streaming source made.
  */
final case class GraftStreamOffset(version: Long, snapshotDone: Boolean) extends Offset {
  override def json(): String =
    s"""{"version":$version,"snapshotDone":$snapshotDone}"""
}

object GraftStreamOffset {
  def fromJson(s: String): GraftStreamOffset = {
    import org.json4s.jackson.JsonMethods
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val j = JsonMethods.parse(s)
    import org.json4s.jvalue2extractable
    GraftStreamOffset((j \ "version").extract[Long], (j \ "snapshotDone").extract[Boolean])
  }
}

/** `spark.readStream.table("graft.lake.t")` — the manifest table as a
  * NATIVE DataSource V2 streaming source (the read half of the
  * catalog's streaming story; `writeStream.toTable` is the write
  * half). Semantics follow Delta's streaming source:
  *
  *  - The first batch delivers the INITIAL SNAPSHOT — every row of the
  *    table as of the version the stream started at — then each
  *    subsequent batch delivers exactly the files APPENDED by commits
  *    the stream has not yet seen. `option("startingVersion", N)`
  *    skips the snapshot and starts with commit N's appends instead.
  *    A snapshot with PENDING merge-on-read tombstones delivers the
  *    APPLIED view: both delete kinds convert to per-file doomed row
  *    positions driver-side (affected files only, capped by
  *    `option("maxSnapshotTombstones", N)`, default 1M) and affected
  *    files read through position-skipping readers — Delta-parity
  *    snapshot semantics without materializing first. ABOVE the cap
  *    the stream degrades instead of refusing: the applied view
  *    materializes once (distributed anti-join plan, no driver doom
  *    set) under the checkpoint and serves as batch 0, reclaimed on
  *    commit.
  *  - STATE-PRESERVING maintenance commits (`materializeDeletes`,
  *    `compactSmall` — op-marked, applied view bit-identical to the
  *    parent) are skipped silently: their added files carry only rows
  *    the stream already delivered, so streaming them would duplicate.
  *  - A CHANGE commit (row-level delete/update/merge, replace,
  *    restore — anything that removed files or added tombstones) is
  *    REFUSED loudly by default: an append-only consumer would
  *    otherwise silently miss retractions. `option("skipChangeCommits",
  *    "true")` opts into skipping them wholesale (Delta's
  *    `skipChangeCommits` contract); consumers that want the
  *    retractions themselves subscribe to the change feed
  *    ([[graft.streaming.ChangeFeedStream]]) instead.
  *  - Exactly-once across restarts comes from the offset log: a batch
  *    is defined purely by its (start, end] version range, so replay
  *    plans the identical file list.
  *
  * Scale shape: an idle poll is ONE head resolution ([[ManifestTable.latestVersion]]);
  * a drain is O(commits drained) metadata reads plus the appended
  * files' bytes — never a table rescan. The stream registers a CURSOR
  * PIN at its processed version on every commit (the same retention
  * contract as the change-feed consumer), so `expireSnapshots` cannot
  * drop a lagging stream's unread commits out from under it.
  *
  * Reading rides Spark's own parquet machinery: each batch's file list
  * becomes `FilePartition`s planned by `ParquetScanBuilder` with the
  * table's committed schema, and one shared reader factory serves all
  * batches — so vectorized decoding and row-group pushdown behave
  * exactly as on the batch path. Files written before an additive
  * schema evolution read the added columns as NULL, same as batch.
  *
  * SCHEMA EVOLUTION ACROSS RENAME/DROP: the stream captures its schema
  * at (re)start, and files from OLDER name eras read through per-era
  * scan templates (the committed rename chain is the column-mapping
  * metadata — [[GraftEraReaderFactory]]), so a starting snapshot or a
  * resumed checkpoint spanning rename boundaries delivers every era
  * correctly. A rename/drop landing MID-RUN still fails loudly — the
  * running query's plan is bound to the old names — but a plain
  * RESTART on the same checkpoint re-baselines onto the new schema and
  * resumes from the exact boundary (Delta's schema-tracking restart
  * contract), exactly-once intact.
  */
final class GraftMicroBatchStream(
    spark: SparkSession, dir: String, startManifest: ManifestTable.Manifest,
    options: CaseInsensitiveStringMap,
    pushed: Seq[Expression], required: StructType,
    checkpointLocation: String) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val skipChangeCommits = options.getBoolean("skipChangeCommits", false)

  /** `Trigger.AvailableNow`'s backfill-then-stop contract: the head
    * captured HERE is the drain target — commits landing after the
    * query started are not chased (they are the next run's work), and
    * `latestOffset(start, limit)` never advances past it, so the query
    * drains whole-commit batches (honoring `maxFilesPerTrigger`) up to
    * exactly this snapshot and stops. A restart reads its start from
    * the checkpoint as always, so later commits deliver exactly-once.
    */
  @volatile private var availableNowTarget: Option[GraftStreamOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestOffset().asInstanceOf[GraftStreamOffset])

  /** `option("maxFilesPerTrigger", N)`: admission control for
    * backfills — a stream starting against a long table history drains
    * it in bounded micro-batches instead of one giant catch-up batch
    * (Delta's knob of the same name). The limit closes over whole
    * COMMITS: a batch admits versions until their cumulative appended
    * file count reaches N (at least one version always admits, so a
    * single oversized commit cannot wedge the stream). The initial
    * snapshot counts its file total the same way.
    */
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    Option(options.get("maxFilesPerTrigger"))
      .map(n => org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles(n.toInt))
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
  }

  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val head0 = ManifestTable.latestVersion(dir).getOrElse(startManifest.version)
    // AvailableNow: never admit past the head captured at query start
    val head = availableNowTarget.fold(head0)(t => math.min(head0, t.version))
    val end = GraftStreamOffset(math.max(head, startManifest.version), snapshotDone = true)
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        var budget = mf.maxFiles().toLong
        var v = s.version
        var snapDone = s.snapshotDone
        if (!snapDone) {
          // the snapshot is one indivisible admission
          budget -= ManifestTable.manifest(dir, Some(v)).files.size
          snapDone = true
        }
        var parentPaths: Set[String] =
          if (v >= 1) ManifestTable.manifest(dir, Some(v)).files.map(_.path).toSet
          else Set.empty
        while (v < end.version && budget > 0) {
          val mv = ManifestTable.manifest(dir, Some(v + 1))
          val added = mv.files.count(f => !parentPaths.contains(f.path))
          // change/maintenance commits admit freely (they stream nothing
          // or fail loudly in planInputPartitions either way)
          budget -= added
          parentPaths = mv.files.map(_.path).toSet
          v += 1
        }
        GraftStreamOffset(v, snapDone)
      case _ => end
    }
  }

  /** Pin name derived from the checkpoint location — stable across
    * restarts of the same query, distinct across queries.
    */
  private val pinName: String = {
    val h = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(checkpointLocation).toLong & 0xffffffffL)
    s"stream-$h"
  }

  // ---- durable stream baseline -------------------------------------------
  // Spark's offset WAL holds only batch END offsets: a replayed batch 0
  // (offset logged, commit missing) gets its START from initialOffset()
  // — called on a FRESH stream instance whose startManifest re-resolved
  // to the CURRENT head. Computing the baseline live would re-bind the
  // replayed snapshot to whatever the table looks like NOW: appends
  // landed in the crash window would deliver twice (inside the snapshot
  // AND again as their own commits), and a moved MoR tombstone set
  // would silently resurrect or over-delete rows. The first start
  // therefore persists its offset beside the checkpoint and every
  // restart reads it back: initialOffset is a pure function of the
  // checkpoint, like every other offset.

  private def baselinePath = new Path(checkpointLocation, "graft-baseline.json")

  private def readBaseline(): Option[GraftStreamOffset] = {
    val fs = baselinePath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(baselinePath)) None
    else {
      val in = fs.open(baselinePath)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(GraftStreamOffset.fromJson(out.toString("UTF-8")))
      } finally in.close()
    }
  }

  private def writeBaseline(off: GraftStreamOffset): Unit = {
    val fs = baselinePath.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      val o = fs.create(baselinePath, false) // no-overwrite: first writer wins
      try o.write(off.json().getBytes("UTF-8")) finally o.close()
    } catch {
      // a racing (re)start already wrote one — equally valid, read back
      case _: java.io.IOException => ()
    }
  }

  override def initialOffset(): Offset = {
    val off = readBaseline().getOrElse {
      val computed = Option(options.get("startingVersion")) match {
        case Some(v) =>
          val sv = v.toLong
          require(sv >= 1, s"startingVersion must be >= 1, got $sv")
          // commit `sv` itself is the first thing delivered
          GraftStreamOffset(sv - 1, snapshotDone = true)
        case None =>
          GraftStreamOffset(startManifest.version, snapshotDone = false)
      }
      writeBaseline(computed)
      readBaseline().getOrElse(computed)
    }
    ManifestTable.pinCursor(dir, pinName, math.max(off.version, 0L))
    off
  }

  override def latestOffset(): Offset = {
    val head = ManifestTable.latestVersion(dir).getOrElse(startManifest.version)
    GraftStreamOffset(math.max(head, startManifest.version), snapshotDone = true)
  }

  override def deserializeOffset(json: String): Offset = GraftStreamOffset.fromJson(json)

  /** The batch's file list: the starting snapshot (if not yet emitted)
    * plus the files appended by each commit in (start, end]. O(commits)
    * metadata reads; an expired commit in the range fails with the
    * retention contract spelled out (the stream's own pin prevents
    * this unless an operator dropped it).
    */
  private def manifestAt(v: Long): ManifestTable.Manifest =
    try ManifestTable.manifest(dir, Some(v))
    catch {
      case e: IllegalArgumentException =>
        throw new IllegalStateException(
          s"streaming read of $dir: version $v was expired while this stream still " +
            s"needed it (pin '$pinName' dropped, or a pre-pin expiry); restart the " +
            "stream from a fresh checkpoint to re-baseline", e)
    }

  private def batchFiles(
      start: GraftStreamOffset, end: GraftStreamOffset): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
    var parent: ManifestTable.Manifest =
      if (start.version >= 1) manifestAt(start.version) else null
    if (!start.snapshotDone) {
      require(parent != null, s"streaming read of $dir: no snapshot at v${start.version}")
      // pending MoR tombstones are fine HERE: the snapshot batch's
      // affected files route through the position-filtering readers
      // (snapshotDoomed), so the delivered rows are the APPLIED view
      out ++= parent.files.map(f => (f.path, f.seq))
    }
    ((start.version + 1) to end.version).foreach { v =>
      val mv = manifestAt(v)
      val parentPaths: Set[String] =
        if (parent == null) Set.empty else parent.files.map(_.path).toSet
      val added = mv.files.filterNot(f => parentPaths.contains(f.path))
      val removed =
        if (parent == null) Nil
        else parent.files.map(_.path).filterNot(mv.files.map(_.path).toSet)
      val newTombstones =
        if (parent == null) mv.hasMorDeletes
        else (mv.deleteFiles.map(_.path).toSet --
            parent.deleteFiles.map(_.path).toSet).nonEmpty ||
          (mv.posDeleteFiles.map(_.path).toSet --
            parent.posDeleteFiles.map(_.path).toSet).nonEmpty
      // Batches read with the schema captured at stream (re)start; the
      // per-ERA reader maps every OLDER era's physical names onto it
      // (the rename chain is the column-mapping metadata), so a restart
      // lagging across rename boundaries resumes exactly where it was.
      // A rename/drop landing mid-RUN still fails: the running query's
      // downstream plan is bound to the old names — the restart
      // RE-BASELINES onto the new schema from this exact boundary
      // (offsets preserved; Delta's schema-tracking restart contract).
      if (mv.renames.size > startManifest.renames.size ||
          mv.retired.size > startManifest.retired.size)
        throw new IllegalStateException(
          s"streaming read of $dir: commit v$v renamed or dropped a column after " +
            "this stream captured its schema; RESTART the stream on the same " +
            "checkpoint — it re-baselines onto the new schema and resumes from " +
            "this boundary (pre-rename files read via the rename chain)")
      if (mv.statePreserving) {
        // rewrite of already-delivered rows: nothing new to stream
      } else if (removed.nonEmpty || newTombstones) {
        if (!skipChangeCommits) throw new IllegalStateException(
          s"streaming read of $dir: commit v$v is not append-only (" +
            s"${removed.size} file(s) removed, newTombstones=$newTombstones); an " +
            "append stream would miss its retractions. Set option(\"skipChangeCommits\", " +
            "\"true\") to skip such commits, or consume the change feed " +
            "(graft.streaming.ChangeFeedStream) for full CDC semantics")
      } else {
        out ++= added.map(f => (f.path, f.seq))
      }
      parent = mv
    }
    out.result()
  }

  // ---- per-ERA parquet reading ------------------------------------------
  // The stream's output schema is fixed at (re)start (startManifest's
  // committed names). Files written before a rename hold their bytes
  // under the era's OLD names: each era gets its own parquet scan whose
  // required columns are the era-physical names IN THE SAME ORDER, so
  // the produced InternalRows line up positionally with the stream
  // schema — no per-row projection, one extra scan template per era,
  // bounded by the rename count, never by files. Tables that never
  // renamed take the single-scan fast path unchanged.

  private val streamSchema = DataFrameSchema.fromJson(startManifest.schemaJson)
  private val renameSteps = startManifest.renames.sortBy(_.v)
  private val currentEra = renameSteps.length

  private def eraOf(seq: Long): Int =
    renameSteps.indexWhere(_.v > seq) match {
      case -1 => currentEra
      case i  => i
    }

  /** current name -> the physical name era-`era` files carry. */
  private def eraNameMap(era: Int): Map[String, String] = {
    val applicable = renameSteps.drop(era)
    streamSchema.fieldNames.map { curName =>
      var n = curName
      applicable.reverseIterator.foreach(st => if (st.to == n) n = st.from)
      curName -> n
    }.toMap
  }

  /** A parquet Batch over exactly `paths` of one name era, with the
    * enclosing scan's pushed filters (attribute names rewritten to the
    * era; pruning is I/O-only — the plan re-evaluates every filter) and
    * pruned columns — one call plans partitions, the zero-path template
    * builds the shared reader factory.
    */
  private def parquetBatch(paths: Seq[String], era: Int, withFilters: Boolean = true): Batch = {
    val nameMap = eraNameMap(era)
    val identity = nameMap.forall { case (a, b) => a == b }
    val schema =
      if (identity) streamSchema
      else StructType(streamSchema.fields.map(f => f.copy(name = nameMap(f.name))))
    val req =
      if (identity) required
      else StructType(required.fields.map(f =>
        f.copy(name = nameMap.getOrElse(f.name, f.name))))
    val push =
      if (identity) pushed
      else pushed.map(_.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if nameMap.contains(a.name) && nameMap(a.name) != a.name =>
          a.withName(nameMap(a.name))
      })
    val idx = new InMemoryFileIndex(
      spark, paths.map(new Path(_)), Map.empty[String, String], Some(schema))
    val psb = ParquetScanBuilder(spark, idx, schema, schema, options)
    // the MoR position-filtering path plans with NO pushed filters:
    // parquet row-group/row-level skipping would desynchronize the
    // sequential row counter from _metadata.row_index; the enclosing
    // plan re-evaluates every filter, so pruning here is I/O-only
    if (withFilters) psb.pushFilters(push)
    psb.pruneColumns(req)
    psb.build().toBatch
  }

  // ---- MoR-applying initial snapshot ------------------------------------
  // A starting snapshot with pending merge-on-read tombstones delivers
  // the APPLIED view: one bounded driver-side probe converts BOTH
  // delete kinds into per-file doomed row positions (affected files
  // only, capped and refused loudly above maxSnapshotTombstones), and
  // each affected file reads as ONE whole-file partition through a
  // position-skipping reader — clean files stream through the normal
  // vectorized path untouched. Deterministic from the start manifest,
  // so a checkpoint replay of batch 0 recomputes the identical doom
  // set: exactly-once holds. Later change commits are judged exactly
  // as before (append-only refusal / skipChangeCommits), and a
  // subsequent materializeDeletes is op-marked state-preserving — its
  // rewrite carries only rows this snapshot already delivered, so the
  // stream skips it: no duplicates, no loss.
  //
  // REPLAY DETERMINISM: the doom set derives from the manifest AT THE
  // CHECKPOINTED OFFSET's version — the same manifest batchFiles plans
  // the snapshot from — never from `startManifest`, which re-resolves
  // to the CURRENT head on every (re)start. If batch 0's offset was
  // logged but uncommitted and the table advanced before restart (a
  // materializeDeletes cleared the tombstones, or a new MoR delete
  // changed the set), deriving from the head would silently resurrect
  // tombstoned rows or over-delete; deriving from the offset's own
  // manifest replans the byte-identical batch.

  private val doomCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Option[Map[String, Array[Long]]]]()

  /** The snapshot-at-`version` doom set, or None when the pending
    * tombstone volume exceeds `maxSnapshotTombstones` (default 1M) —
    * too many positions to hold driver-side. None is NOT a refusal:
    * the caller degrades to the staged applied snapshot
    * ([[stagedSnapshotFiles]]), trading a one-time whole-table rewrite
    * under the checkpoint for bounded driver memory.
    */
  private def snapshotDoomed(version: Long): Option[Map[String, Array[Long]]] =
    doomCache.computeIfAbsent(version, v => {
      val snap = if (v == startManifest.version) startManifest else manifestAt(v)
      if (!snap.hasMorDeletes) Some(Map.empty)
      else ManifestTable.morDoomedPositions(spark, snap,
        Option(options.get("maxSnapshotTombstones")).map(_.toLong).getOrElse(1000000L))
    })

  /** OVER-CAP MoR snapshot: materialize the applied view at `version`
    * (the same distributed anti-join plan batch reads use — no
    * driver-side doom set at all) as parquet under the CHECKPOINT, once,
    * and serve those files as batch 0. Staging is idempotent — a replay
    * finds the `_SUCCESS`-marked directory and reuses it byte-for-byte,
    * so exactly-once holds — and [[commit]] reclaims the space as soon
    * as the snapshot batch is committed (after which no replay can need
    * it). The trade vs the position-filtered path: one extra write+read
    * of the table, in exchange for streaming through ANY pending
    * tombstone volume; the files stage with the version's own era
    * names, so the per-era readers serve them like any manifest file.
    */
  private def stagedSnapshotFiles(version: Long): Seq[String] = {
    val stage = new Path(checkpointLocation, s"graft-snapshot-v$version")
    val fs = stage.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(stage, "_SUCCESS"))) {
      val tmp = new Path(checkpointLocation, s".graft-snapshot-v$version.tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true): Unit
      val m = if (version == startManifest.version) startManifest else manifestAt(version)
      ManifestTable.appliedRead(spark, m, m.files.map(_.path))
        .write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, stage)) {
        fs.delete(tmp, true): Unit // a racing replay staged it first
        require(fs.exists(new Path(stage, "_SUCCESS")),
          s"staging the over-cap MoR snapshot at v$version under $checkpointLocation failed")
      }
    }
    fs.listStatus(stage).map(_.getPath).filter(_.getName.startsWith("part-"))
      .map(_.toString).toSeq.sorted
  }

  /** The file as ONE sequentially-read partition: its no-filter splits
    * merged in byte order, so the reader visits rows exactly in
    * `_metadata.row_index` order and a running counter reproduces the
    * positions the doom set names.
    */
  private def wholeFilePartition(path: String, era: Int): InputPartition = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    val parts = parquetBatch(Seq(path), era, withFilters = false).planInputPartitions()
    val pfs = parts.flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"unexpected non-file parquet partition ${other.getClass} for $path")
    }.sortBy(_.start)
    FilePartition(0, pfs)
  }

  /** Plan `(path, seq)` files through the normal vectorized parquet
    * path, era-tagged when the table has rename history.
    */
  private def planClean(files: Seq[(String, Long)]): Array[InputPartition] =
    if (files.isEmpty) Array.empty
    else if (renameSteps.isEmpty)
      parquetBatch(files.map(_._1), currentEra).planInputPartitions()
    else files.groupBy { case (_, seq) => eraOf(seq) }.toArray.sortBy(_._1).flatMap {
      case (era, fs) =>
        parquetBatch(fs.map(_._1), era).planInputPartitions()
          .map(p => GraftEraInputPartition(era, p): InputPartition)
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    // retention floor: this batch (and any replay of it) needs every
    // commit AFTER s — pin before reading so expiry can't race the scan
    ManifestTable.pinCursor(dir, pinName, math.max(s.version, 0L))
    // the snapshot batch subtracts tombstoned rows from affected files
    // (basenames only a start-manifest file can carry — later commits
    // add NEW files); every other batch takes the fast path untouched
    val doomedOpt =
      if (!s.snapshotDone) snapshotDoomed(s.version)
      else Some(Map.empty[String, Array[Long]])
    val doomed = doomedOpt.getOrElse {
      // over-cap degrade: the snapshot half of batch 0 is the STAGED
      // applied view (its files carry the snapshot version's own era
      // names, so seq = snapshot version routes them correctly); the
      // incremental half — commits in (s, e] — plans exactly as usual
      val staged = stagedSnapshotFiles(s.version).map(p => (p, s.version))
      val incr = batchFiles(s.copy(snapshotDone = true), e)
      return planClean(staged ++ incr)
    }
    val allFiles = batchFiles(s, e)
    if (allFiles.isEmpty) return Array.empty
    val (aff, files) =
      allFiles.partition { case (p, _) => doomed.contains(ManifestTable.fileBasename(p)) }
    val clean: Array[InputPartition] = planClean(files)
    if (aff.isEmpty) clean
    else {
      // Spark refuses mixed row/columnar partitions within one scan:
      // the snapshot batch holding position-filtered (row-based) files
      // demotes its CLEAN siblings to row mode too — batch 0 only;
      // every later batch has no affected files and stays vectorized
      clean.map(p => GraftRowModePartition(p): InputPartition) ++
        aff.map { case (p, seq) =>
          val era = if (renameSteps.isEmpty) currentEra else eraOf(seq)
          GraftMorFilterPartition(era, doomed(ManifestTable.fileBasename(p)),
            wholeFilePartition(p, era)): InputPartition
        }
    }
  }

  private lazy val readerFactory: PartitionReaderFactory = {
    val base: PartitionReaderFactory =
      if (renameSteps.isEmpty) parquetBatch(Nil, currentEra).createReaderFactory()
      else new GraftEraReaderFactory(
        (0 to currentEra).map(e => e -> parquetBatch(Nil, e).createReaderFactory()).toMap)
    // ALWAYS MoR-capable: the factory must serve a REPLAYED batch 0
    // whose checkpointed snapshot version still had pending tombstones
    // even when the CURRENT head (startManifest) has none — gating on
    // startManifest.hasMorDeletes would strand the replay's
    // position-filtered partitions. Pass-through for clean partitions
    // (vectorized reads and pushdown untouched); the extra no-filter
    // templates cost one driver-side plan per era, never a scan.
    new GraftMorReaderFactory(base,
      (0 to currentEra).map(e =>
        e -> parquetBatch(Nil, e, withFilters = false).createReaderFactory()).toMap)
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  /** Advance the retention pin to the processed version: everything at
    * or above it stays expirable-safe for this consumer.
    */
  override def commit(end: Offset): Unit = {
    val v = end match {
      case g: GraftStreamOffset => g.version
      case o => GraftStreamOffset.fromJson(o.json()).version
    }
    ManifestTable.pinCursor(dir, pinName, math.max(v, 0L))
    // ANY commit means batch 0 (the snapshot) is durable — no replay can
    // need an over-cap staged applied view again. One exists-probe per
    // stream INSTANCE (not per epoch), keyed off the persisted baseline
    // rather than instance state, because the instance that staged may
    // have crashed and the restart instance is the one that commits.
    if (!snapshotStageCleaned) {
      snapshotStageCleaned = true
      readBaseline().foreach { b =>
        val stage = new Path(checkpointLocation, s"graft-snapshot-v${b.version}")
        val fs = stage.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(stage)) fs.delete(stage, true): Unit
      }
    }
  }

  @volatile private var snapshotStageCleaned = false

  override def stop(): Unit = ()
}

/** An input partition tagged with the NAME ERA its files belong to, so
  * the one shared streaming reader factory can route it to the scan
  * template whose required-column names match the files' bytes.
  */
final case class GraftEraInputPartition(era: Int, inner: InputPartition)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** One parquet reader factory per name era, dispatched by the
  * partition's era tag. Each delegate was planned with the era's
  * physical column names in the STREAM schema's field order, so rows
  * from every era are positionally identical — vectorized reads and
  * row-group pushdown work per era exactly as on the single-era path.
  */
final class GraftEraReaderFactory(factories: Map[Int, PartitionReaderFactory])
  extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): (PartitionReaderFactory, InputPartition) =
    p match {
      case GraftEraInputPartition(era, inner) => (factories(era), inner)
      case other => (factories(factories.keys.max), other)
    }
  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val (f, inner) = unwrap(p); f.createReader(inner)
  }
  override def createColumnarReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val (f, inner) = unwrap(p); f.createColumnarReader(inner)
  }
  override def supportColumnarReads(p: InputPartition): Boolean = {
    val (f, inner) = unwrap(p); f.supportColumnarReads(inner)
  }
}

/** One affected file of the MoR-applying snapshot batch: a whole-file
  * sequential partition plus the ASCENDING row positions its pending
  * tombstones doom. Tagged with its name era so the no-filter scan
  * template with the right physical column names decodes the bytes.
  */
final case class GraftMorFilterPartition(
    era: Int, doomed: Array[Long], inner: InputPartition) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** A clean (no tombstoned rows) partition of the MoR-applying snapshot
  * batch, demoted to row-based reads: its batch-mates are the
  * position-filtered readers, and one scan cannot mix row and columnar
  * partitions. Content-identical to the undecorated partition.
  */
final case class GraftRowModePartition(inner: InputPartition) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Routes [[GraftMorFilterPartition]]s to a NO-pushed-filter reader
  * wrapped with the position skipper (row-wise — the counter needs
  * every row in `_metadata.row_index` order, so columnar reads and
  * parquet row-level skipping are both off for exactly these
  * partitions); every other partition flows to the normal delegate
  * (vectorized, pushdown intact) untouched.
  */
final class GraftMorReaderFactory(
    delegate: PartitionReaderFactory,
    noFilter: Map[Int, PartitionReaderFactory]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    p match {
      case GraftMorFilterPartition(era, doomed, inner) =>
        new MorPositionFilterReader(noFilter(era).createReader(inner), doomed)
      case GraftRowModePartition(inner) => delegate.createReader(inner)
      case other => delegate.createReader(other)
    }
  override def createColumnarReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    delegate.createColumnarReader(p)
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case _: GraftMorFilterPartition | _: GraftRowModePartition => false
    case other => delegate.supportColumnarReads(other)
  }
}

/** Skips the rows at `doomed` positions (ascending) while counting the
  * delegate's rows — position i IS `_metadata.row_index` because the
  * enclosing partition reads its whole file sequentially with no
  * row-level skipping. One pointer into the sorted array: O(1) per row.
  */
final class MorPositionFilterReader(
    inner: org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow],
    doomed: Array[Long])
  extends org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
  private var pos = -1L
  private var di = 0
  override def next(): Boolean = {
    while (inner.next()) {
      pos += 1
      if (di < doomed.length && doomed(di) == pos) di += 1
      else return true
    }
    false
  }
  override def get(): org.apache.spark.sql.catalyst.InternalRow = inner.get()
  override def close(): Unit = inner.close()
}
