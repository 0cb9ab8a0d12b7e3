package graft.sources

import graft.plans.ManifestSkipping
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 `TableCatalog` over [[ManifestTable]] directories —
  * the missing piece of Catalyst citizenship for the storage layer:
  * with `spark.sql.catalog.graft = graft.sources.GraftCatalog` (and
  * `...graft.warehouse = /path`), an analyst writes
  *
  * {{{
  *   SELECT ... FROM graft.lake.events WHERE ts BETWEEN ...
  *   SELECT ... FROM graft.lake.events VERSION AS OF 3
  * }}}
  *
  * with no `createView` call and no injected-rule dependency: the
  * catalog resolves `<warehouse>/<namespace...>/<name>` to a manifest
  * table, `VERSION AS OF` rides the engine's own time-travel syntax
  * into [[ManifestTable.manifest]], and the scan builder prunes files
  * through the SAME constraint machinery as the optimizer rule
  * ([[ManifestSkipping.survivors]] — envelopes + Bloom sidecars) before
  * delegating to Spark's own `ParquetScanBuilder`, so parquet-level
  * filter pushdown and column pruning still engage on the survivors.
  *
  * Scale shape: table resolution is one head read (O(segments)
  * metadata); planning consults O(files) driver-side stats rows and
  * hands the executor a pre-pruned file list — the Iceberg/Delta
  * catalog contract. Reads only (the write path is the transactional
  * commit API: `commit`/`merge`/`delete`/WAP — a SQL INSERT would
  * bypass the audit/txn surface). Pending merge-on-read deletes read
  * correctly through the injected [[graft.plans.MorApplyRewrite]]
  * resolution rule (the applied-read anti joins replace the bare scan
  * before planning); only a session missing the engine's extensions
  * refuses such tables, loudly, at planning time.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  /** Resolved per call (not frozen at initialize): the catalog
    * instance is cached by the session's CatalogManager, but tests and
    * multi-warehouse sessions re-point the conf at runtime.
    */
  private def warehouse: String =
    SparkSession.active.conf.getOption(s"spark.sql.catalog.$catName.warehouse")
      .getOrElse(throw new IllegalStateException(
        s"set spark.sql.catalog.$catName.warehouse to the lake root directory"))

  private def dirOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).foldLeft(warehouse)((a, b) => s"$a/$b")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = namespace.foldLeft(warehouse)((a, b) => s"$a/$b")
    Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && new java.io.File(d, "_manifests").isDirectory)
      .map(d => Identifier.of(namespace, d.getName))
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` / `VERSION AS OF '<tag>'` — the SQL spelling
    * of snapshot time travel; a non-numeric version string resolves as
    * an immutable named tag ([[ManifestTable.tag]]).
    */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(
      try version.toLong
      catch { case _: NumberFormatException =>
        ManifestTable.resolveTag(dirOf(ident), version).getOrElse(
          throw new IllegalArgumentException(
            s"VERSION AS OF: '$version' is neither a numeric snapshot version nor " +
              s"a tag of $ident (tags: ${ManifestTable.tags(dirOf(ident)).keys.mkString(", ")})"))
      }))

  /** `TIMESTAMP AS OF <t>` — Spark hands the literal as epoch micros;
    * resolution is the monotonized commit-clock scan
    * ([[ManifestTable.versionAt]]).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident)
    if (ManifestTable.latestVersion(dir).isEmpty) throw new NoSuchTableException(ident)
    load(ident, Some(ManifestTable.versionAt(dir, timestampMicros)))
  }

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (ManifestTable.latestVersion(dir).isEmpty) throw new NoSuchTableException(ident)
    // pending merge-on-read deletes are fine here: the injected
    // resolution rule (graft.plans.MorApplyRewrite) replaces the V2
    // relation with the applied-read plan before planning; a session
    // WITHOUT the extensions fails loudly in newScanBuilder instead of
    // returning un-applied rows
    GraftLakeTable(ident.toString, dir, ManifestTable.manifest(dir, asOf))
  }

  override def tableExists(ident: Identifier): Boolean =
    ManifestTable.latestVersion(dirOf(ident)).isDefined

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op: the graft catalog is read-only — write through the transactional " +
        "API (ManifestTable.commit/merge/delete/commitAudited), which carries " +
        "the txn/audit surface a SQL DML statement would bypass")

  // ---- namespaces: directories under the warehouse that are not
  // themselves manifest tables (SHOW NAMESPACES / USE support)
  private def isTable(d: java.io.File) = new java.io.File(d, "_manifests").isDirectory

  override def listNamespaces(): Array[Array[String]] =
    Option(new java.io.File(warehouse).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !isTable(d))
      .map(d => Array(d.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val base = namespace.foldLeft(warehouse)((a, b) => s"$a/$b")
    Option(new java.io.File(base).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !isTable(d))
      .map(d => namespace :+ d.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    val base = namespace.foldLeft(warehouse)((a, b) => s"$a/$b")
    if (!new java.io.File(base).isDirectory)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        catName +: namespace.toSeq)
    java.util.Map.of("location", base)
  }

  override def createNamespace(
      namespace: Array[String], metadata: java.util.Map[String, String]): Unit =
    readOnly("CREATE NAMESPACE")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    readOnly("ALTER NAMESPACE")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    readOnly("DROP NAMESPACE")

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

/** One resolved snapshot as a V2 table: the committed schema, batch
  * reads only, scans built by [[GraftLakeScanBuilder]].
  */
final case class GraftLakeTable(
    tableName: String, dir: String, m: ManifestTable.Manifest)
  extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = DataFrameSchema.fromJson(m.schemaJson)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def properties(): java.util.Map[String, String] =
    java.util.Map.of("provider", "graft-manifest", "location", dir,
      "version", m.version.toString)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // unreachable when graft.plans.MorApplyRewrite is injected (it
    // rewrites tombstone-carrying relations before planning); a foreign
    // session that configured the catalog without the engine's
    // extensions must fail loudly here rather than scan un-applied rows
    require(!m.hasMorDeletes,
      s"catalog table $tableName has pending merge-on-read deletes a bare V2 scan " +
        "cannot apply; build the session with graft's extensions (Engine.session / " +
        "GraftFunctions.register) or read via ManifestTable.snapshot/createView")
    new GraftLakeScanBuilder(SparkSession.active, dir, m, options)
  }
}

/** Scan builder: Catalyst filters push down here FIRST (planning-time
  * manifest pruning — envelopes + Bloom sidecars via
  * [[ManifestSkipping.survivors]]), then the surviving file list is
  * handed to Spark's own `ParquetScanBuilder` with the same filters
  * and the pruned column set, so parquet row-group skipping and
  * `ReadSchema` pruning behave exactly as on a plain parquet scan.
  * Every filter is RETURNED as post-scan (bit-identical contract —
  * skipping only removes files that cannot contribute a row).
  */
final class GraftLakeScanBuilder(
    spark: SparkSession, dir: String, m: ManifestTable.Manifest,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns {

  private val schema = DataFrameSchema.fromJson(m.schemaJson)
  private var pushed: Seq[Expression] = Nil
  private var required: StructType = schema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    filters // all retained post-scan: pruning is I/O-only, never semantic
  }

  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty // nothing is CONSUMED; the parquet scan advertises its own

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val all = m.files.map(_.path)
    val enabled = spark.conf.get("spark.graft.manifestSkipping.enabled", "true").toBoolean
    val paths = pushed.reduceOption(And) match {
      case Some(cond) if enabled =>
        val stats = m.files.map(f =>
          f.path -> ManifestSkipping.Stats(dir, m.track, f.mins, f.maxs)).toMap
        ManifestSkipping.survivors(cond, all, stats).getOrElse(all)
      case _ => all
    }
    val idx = new InMemoryFileIndex(
      spark, paths.map(new Path(_)), Map.empty[String, String], Some(schema))
    val psb = ParquetScanBuilder(spark, idx, schema, schema, options)
    psb.pushFilters(pushed)
    psb.pruneColumns(required)
    psb.build()
  }
}
