package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES over a manifest table —
  * `` SELECT * FROM graft.lake.`ev$history` `` (same `$suffix`
  * convention as Iceberg's `t$history`/`t$files`/`t$refs`): the
  * table's own commit log, live file inventory, and named refs as
  * queryable relations, no API calls needed for operational
  * introspection (audit a WAP publish, find the version to RESTORE,
  * eyeball file-size skew before a compaction).
  *
  * All three are DRIVER-LOCAL scans ([[LocalScan]]) over already-
  * resolved manifest metadata: O(versions) / O(files) control-plane
  * rows — the same asymptotics every commit already pays — never a
  * data-file read, so they stay instant at any data scale.
  */
object GraftMetaTables {

  val Suffixes: Set[String] = Set("history", "files", "refs")

  def apply(name: String, dir: String, suffix: String): Table = suffix match {
    case "history" => HistoryTable(name, dir)
    case "files" => FilesTable(name, dir)
    case "refs" => RefsTable(name, dir)
    case other => throw new IllegalArgumentException(
      s"unknown metadata table suffix '$$$other' (known: ${Suffixes.mkString(", ")})")
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def utf8OrNull(s: Option[String]): AnyRef = s.map(utf8).orNull

  private abstract class MetaTable extends Table with SupportsRead {
    def rows(): Array[InternalRow]
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      val self = this
      new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def rows(): Array[InternalRow] = self.rows()
          override def readSchema(): StructType = self.schema()
          override def description(): String = self.name()
        }
      }
    }
  }

  /** One row per retained commit: the audit trail RESTORE and the
    * stitched feed navigate by.
    */
  private final case class HistoryTable(tableName: String, dir: String) extends MetaTable {
    override def name(): String = tableName
    override def schema(): StructType = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("parent", LongType, nullable = true),
      StructField("committed_at", TimestampType, nullable = true),
      StructField("op", StringType, nullable = true),
      StructField("txn", StringType, nullable = true),
      StructField("state_preserving", BooleanType, nullable = false),
      StructField("data_files", LongType, nullable = false),
      StructField("data_rows", LongType, nullable = false),
      StructField("delete_files", LongType, nullable = false),
      StructField("pos_delete_files", LongType, nullable = false)))
    override def rows(): Array[InternalRow] =
      ManifestTable.versions(dir).sorted.map { v =>
        val m = ManifestTable.manifest(dir, Some(v))
        InternalRow(
          m.version,
          m.parent.map(Long.box).orNull,
          m.commitTsMicros.map(Long.box).orNull,
          utf8OrNull(m.op),
          utf8OrNull(m.txn),
          m.statePreserving,
          m.files.size.toLong,
          m.files.map(_.rows).sum,
          m.deleteFiles.size.toLong,
          m.posDeleteFiles.size.toLong)
      }.toArray
  }

  /** One row per LIVE data file of the head snapshot (`VERSION AS OF`
    * on the base table travels; the files view always reflects head —
    * pass `asOfVersion` via a future option if needed).
    */
  private final case class FilesTable(tableName: String, dir: String) extends MetaTable {
    override def name(): String = tableName
    override def schema(): StructType = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("mins", MapType(StringType, StringType), nullable = false),
      StructField("maxs", MapType(StringType, StringType), nullable = false)))
    private def mapData(m: Map[String, Option[String]]) = {
      val present = m.toSeq.sortBy(_._1)
      new ArrayBasedMapData(
        new GenericArrayData(present.map(kv => utf8(kv._1)).toArray[Any]),
        new GenericArrayData(present.map(kv => utf8OrNull(kv._2)).toArray[Any]))
    }
    override def rows(): Array[InternalRow] = {
      val m = ManifestTable.manifest(dir, None)
      m.files.sortBy(_.path).map(f =>
        InternalRow(utf8(f.path), f.rows, f.seq, mapData(f.mins), mapData(f.maxs))).toArray
    }
  }

  /** Named refs: immutable tags, writable branches, and registered
    * cursor pins (the three retention anchors expiry respects).
    */
  private final case class RefsTable(tableName: String, dir: String) extends MetaTable {
    override def name(): String = tableName
    override def schema(): StructType = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    override def rows(): Array[InternalRow] = {
      val tags = ManifestTable.tags(dir).toSeq.sortBy(_._1)
        .map { case (n, v) => InternalRow(utf8(n), utf8("tag"), v) }
      val brs = ManifestTable.branches(dir).toSeq.sortBy(_._1)
        .map { case (n, v) => InternalRow(utf8(n), utf8("branch"), v) }
      val pins = ManifestTable.cursorPins(dir).toSeq.sortBy(_._1)
        .map { case (n, v) => InternalRow(utf8(n), utf8("pin"), v) }
      (tags ++ brs ++ pins).toArray
    }
  }
}
