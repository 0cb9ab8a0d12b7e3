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
        require(!startManifest.hasMorDeletes,
          s"streaming read of $dir: the starting snapshot has pending merge-on-read " +
            "deletes a streaming scan cannot apply; run " +
            "ManifestTable.materializeDeletes first (or start from a later " +
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
  private def batchFiles(
      start: GraftStreamOffset, end: GraftStreamOffset): Seq[(String, Long)] = {
    val out = Seq.newBuilder[(String, Long)]
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
      require(!parent.hasMorDeletes,
        s"streaming read of $dir: starting snapshot v${start.version} has pending " +
          "merge-on-read deletes a streaming scan cannot apply")
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
  private def parquetBatch(paths: Seq[String], era: Int): Batch = {
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
    psb.pushFilters(push)
    psb.pruneColumns(req)
    psb.build().toBatch
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    // retention floor: this batch (and any replay of it) needs every
    // commit AFTER s — pin before reading so expiry can't race the scan
    ManifestTable.pinCursor(dir, pinName, math.max(s.version, 0L))
    val files = batchFiles(s, e)
    if (files.isEmpty) Array.empty
    else if (renameSteps.isEmpty)
      parquetBatch(files.map(_._1), currentEra).planInputPartitions()
    else files.groupBy { case (_, seq) => eraOf(seq) }.toArray.sortBy(_._1).flatMap {
      case (era, fs) =>
        parquetBatch(fs.map(_._1), era).planInputPartitions()
          .map(p => GraftEraInputPartition(era, p): InputPartition)
    }
  }

  private lazy val readerFactory: PartitionReaderFactory =
    if (renameSteps.isEmpty) parquetBatch(Nil, currentEra).createReaderFactory()
    else new GraftEraReaderFactory(
      (0 to currentEra).map(e => e -> parquetBatch(Nil, e).createReaderFactory()).toMap)

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
