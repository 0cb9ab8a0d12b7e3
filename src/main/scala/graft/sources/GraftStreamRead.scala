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
  */
final class GraftMicroBatchStream(
    spark: SparkSession, dir: String, startManifest: ManifestTable.Manifest,
    options: CaseInsensitiveStringMap,
    pushed: Seq[Expression], required: StructType,
    checkpointLocation: String) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val skipChangeCommits = options.getBoolean("skipChangeCommits", false)

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
    val head = ManifestTable.latestVersion(dir).getOrElse(startManifest.version)
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

  override def initialOffset(): Offset = {
    val off = Option(options.get("startingVersion")) match {
      case Some(v) =>
        val sv = v.toLong
        require(sv >= 1, s"startingVersion must be >= 1, got $sv")
        // commit `sv` itself is the first thing delivered
        GraftStreamOffset(sv - 1, snapshotDone = true)
      case None =>
        require(!startManifest.hasMorDeletes && !startManifest.renamesApply,
          s"streaming read of $dir: the starting snapshot has pending merge-on-read " +
            "deletes and/or pre-rename files a streaming scan cannot read; run " +
            "ManifestTable.materializeDeletes / compact first (or start from a later " +
            "version with option(\"startingVersion\", N))")
        GraftStreamOffset(startManifest.version, snapshotDone = false)
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
  private def batchFiles(start: GraftStreamOffset, end: GraftStreamOffset): Seq[String] = {
    val out = Seq.newBuilder[String]
    def manifestAt(v: Long): ManifestTable.Manifest =
      try ManifestTable.manifest(dir, Some(v))
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalStateException(
            s"streaming read of $dir: version $v was expired while this stream still " +
              s"needed it (pin '$pinName' dropped, or a pre-pin expiry); restart the " +
              "stream from a fresh checkpoint to re-baseline", e)
      }
    var parent: ManifestTable.Manifest =
      if (start.version >= 1) manifestAt(start.version) else null
    if (!start.snapshotDone) {
      require(parent != null, s"streaming read of $dir: no snapshot at v${start.version}")
      require(!parent.hasMorDeletes && !parent.renamesApply,
        s"streaming read of $dir: starting snapshot v${start.version} has pending " +
          "merge-on-read deletes and/or pre-rename files a streaming scan cannot read")
      out ++= parent.files.map(_.path)
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
      // batches read with the schema captured at stream (re)start.
      // Additive evolution is safe either way (extra columns are
      // ignored / missing ones read NULL); a RENAME or DROP landing
      // after this stream captured its schema is not — names shifted
      // under the offsets
      if (mv.renames.size > startManifest.renames.size ||
          mv.retired.size > startManifest.retired.size)
        throw new IllegalStateException(
          s"streaming read of $dir: commit v$v renamed or dropped a column after " +
            "this stream captured its schema; restart the stream from a fresh " +
            "checkpoint (or startingVersion after the change) to pick up the new schema")
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
        // a file written BEFORE a rename this stream's schema already
        // carries cannot be read under the current names (restart
        // lagging across a rename boundary)
        val misread = added.filter(f => startManifest.renames.exists(_.v > f.seq))
        if (misread.nonEmpty) throw new IllegalStateException(
          s"streaming read of $dir: commit v$v's files predate a column rename; " +
            "this stream's checkpoint lags across the rename boundary — restart " +
            "from a fresh checkpoint (initial snapshot reads every era correctly)")
        out ++= added.map(_.path)
      }
      parent = mv
    }
    out.result()
  }

  /** A parquet Batch over exactly `paths`, with the enclosing scan's
    * pushed filters and pruned columns — one call plans partitions,
    * the zero-path template builds the shared reader factory.
    */
  private def parquetBatch(paths: Seq[String]): Batch = {
    val schema = DataFrameSchema.fromJson(startManifest.schemaJson)
    val idx = new InMemoryFileIndex(
      spark, paths.map(new Path(_)), Map.empty[String, String], Some(schema))
    val psb = ParquetScanBuilder(spark, idx, schema, schema, options)
    psb.pushFilters(pushed)
    psb.pruneColumns(required)
    psb.build().toBatch
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    // retention floor: this batch (and any replay of it) needs every
    // commit AFTER s — pin before reading so expiry can't race the scan
    ManifestTable.pinCursor(dir, pinName, math.max(s.version, 0L))
    val files = batchFiles(s, e)
    if (files.isEmpty) Array.empty else parquetBatch(files).planInputPartitions()
  }

  private lazy val readerFactory: PartitionReaderFactory =
    parquetBatch(Nil).createReaderFactory()

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
  }

  override def stop(): Unit = ()
}
