package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for lake maintenance — Spark 4's
  * `ProcedureCatalog` surface, the `CALL` statements Iceberg ships
  * (`expire_snapshots`, `rewrite_data_files`, ...), bound to the
  * engine's transactional maintenance API:
  *
  * {{{
  *   CALL graft.system.maintain(table => 'lake.events', cluster_by => 'ts')
  *   CALL graft.system.expire_snapshots(table => 'lake.events', keep_last => 3)
  *   CALL graft.system.compact(table => 'lake.events', cluster_by => 'ts', num_files => 8)
  *   CALL graft.system.materialize_deletes(table => 'lake.events')
  *   CALL graft.system.tag(table => 'lake.events', name => 'rel-1', version => 4)
  *   CALL graft.system.rollback(table => 'lake.events', version => 2)
  * }}}
  *
  * Each procedure is one call into the SAME code path the typed API
  * runs (atomic manifest swaps, conflict checks, retention pins all
  * hold), and returns its resulting head version as a one-row scan —
  * an operator can drive the whole maintenance cadence from SQL.
  */
object GraftProcedures {

  val Namespace = "system"

  def list(): Array[String] = Array(
    "maintain", "expire_snapshots", "compact", "zorder", "materialize_deletes", "tag",
    "rollback", "vacuum", "delete_by_key", "create_branch", "fast_forward", "drop_branch",
    "cherry_pick", "add_tracked_column", "delete_on_branch", "profile")

  def load(catalogName: String, warehouse: () => String, name: String): UnboundProcedure = {
    def dirOf(table: String): String =
      table.split('.').foldLeft(warehouse())((a, b) => s"$a/$b")
    def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
    name match {
      case "maintain" => proc(name,
        "run the full maintenance cadence; returns the head version. " +
          "zorder_x + zorder_y swap the incremental binpack for a full " +
          "z-order re-clustering of the pair",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("cluster_by", StringType).build(),
          ProcedureParameter.in("small_file_rows", LongType).defaultValue("100000").build(),
          ProcedureParameter.in("target_files", IntegerType).defaultValue("8").build(),
          ProcedureParameter.in("keep_last", IntegerType).defaultValue("3").build(),
          ProcedureParameter.in("zorder_by", StringType).defaultValue("''").build()),
        r => ManifestTable.maintain(SparkSession.active, dirOf(str(r, 0)), str(r, 1),
          r.getLong(2), r.getInt(3), r.getInt(4),
          zorderBy = str(r, 5).split(',').map(_.trim).filter(_.nonEmpty).toSeq))
      case "expire_snapshots" => proc(name, "drop old snapshots (tags and cursor pins retained)",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_last", IntegerType).defaultValue("3").build()),
        r => {
          ManifestTable.expireSnapshots(dirOf(str(r, 0)), r.getInt(1))
          ManifestTable.latestVersion(dirOf(str(r, 0))).getOrElse(-1L)
        })
      case "compact" => proc(name, "full clustering rewrite (also materializes pending deletes)",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("cluster_by", StringType).build(),
          ProcedureParameter.in("num_files", IntegerType).defaultValue("8").build()),
        r => ManifestTable.compact(SparkSession.active, dirOf(str(r, 0)), str(r, 1), r.getInt(2)))
      case "zorder" => proc(name,
        "full Z-ORDER re-clustering rewrite on N >= 2 comma-separated " +
          "columns (Delta/Iceberg OPTIMIZE ZORDER BY): files written in " +
          "Morton-interleaved order carry tight envelopes on EVERY listed " +
          "dimension, so any-column (and multi-column) filters prune; " +
          "content-neutral, state-preserving, materializes pending deletes " +
          "like compact",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("cols", StringType).build(),
          ProcedureParameter.in("bits", IntegerType).defaultValue("16").build(),
          ProcedureParameter.in("num_files", IntegerType).defaultValue("8").build()),
        r => ManifestTable.zorderCompact(SparkSession.active, dirOf(str(r, 0)),
          str(r, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          r.getInt(2), r.getInt(3)))
      case "materialize_deletes" => proc(name, "fold pending merge-on-read tombstones into data files",
        Seq(ProcedureParameter.in("table", StringType).build()),
        r => ManifestTable.materializeDeletes(SparkSession.active, dirOf(str(r, 0))))
      case "tag" => proc(name, "name an immutable snapshot ref (kept by expiry)",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("version", LongType).build()),
        r => {
          ManifestTable.tag(dirOf(str(r, 0)), str(r, 1), r.getLong(2))
          r.getLong(2)
        })
      case "rollback" => proc(name, "metadata-only RESTORE to an older version",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", LongType).build()),
        r => ManifestTable.restore(dirOf(str(r, 0)), r.getLong(1)))
      case "add_tracked_column" => proc(name,
        "track-spec evolution (Iceberg's ADD PARTITION FIELD): the column " +
          "gains min/max envelopes + planning-time skipping for FUTURE files, " +
          "metadata-only; pre-evolution files always scan (correct, unpruned) " +
          "until compact/maintain rewrites them into the evolved spec",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("column", StringType).build()),
        r => ManifestTable.addTrackedColumn(dirOf(str(r, 0)), str(r, 1)))
      case "create_branch" => proc(name,
        "fork a writable branch at a retained version (default: the head) — the " +
          "multi-commit write-audit-publish staging ref; read it via " +
          "VERSION AS OF '<name>', publish via fast_forward",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("version", LongType).defaultValue("-1").build()),
        r => ManifestTable.createBranch(dirOf(str(r, 0)), str(r, 1),
          Some(r.getLong(2)).filter(_ >= 0)))
      case "fast_forward" => proc(name,
        "publish a branch onto main (ancestor-only, metadata-only, " +
          "crash-resumable); returns the new main head",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build()),
        r => ManifestTable.fastForward(dirOf(str(r, 0)), str(r, 1)))
      case "cherry_pick" => proc(name,
        "replay ONE branch commit onto main (metadata-only, files shared) — " +
          "appends and copy-on-write rewrites both replay; genuine file-set " +
          "conflicts refuse. The rebase escape hatch when fast_forward " +
          "refuses a diverged base; returns the new main head",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("version", LongType).build()),
        r => ManifestTable.cherryPick(dirOf(str(r, 0)), str(r, 1), r.getLong(2)))
      case "delete_on_branch" => proc(name,
        "row-level copy-on-write DELETE staged ON A BRANCH, addressed by " +
          "name — the explicit form of what plain `DELETE FROM` does while " +
          "spark.graft.wap.branch routes (useful when correcting a branch " +
          "WITHOUT switching the session's routing): `condition` is a SQL " +
          "boolean over the table's columns, computed against the branch " +
          "head and committed as the next shadow snapshot; returns the new " +
          "branch head",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("condition", StringType).build()),
        r => ManifestTable.deleteOnBranch(SparkSession.active, dirOf(str(r, 0)), str(r, 1),
          org.apache.spark.sql.functions.expr(str(r, 2))))
      case "drop_branch" => proc(name,
        "abandon a branch: its shadow snapshots and any data only they referenced fold away",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("name", StringType).build()),
        r => {
          ManifestTable.dropBranch(dirOf(str(r, 0)), str(r, 1))
          ManifestTable.latestVersion(dirOf(str(r, 0))).getOrElse(-1L)
        })
      case "delete_by_key" => proc(name,
        "merge-on-read erasure from SQL: tombstone rows by key (O(keys) bytes " +
          "written, ZERO data files rewritten — where DELETE FROM routes to " +
          "copy-on-write). Keys come from `keys` (comma-separated literals) or " +
          "`source` (a table/view whose key_col column lists them — the " +
          "GDPR-stream path); readers apply the tombstones seq-scoped, " +
          "materialize_deletes repays the debt on the maintenance cadence",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("key_col", StringType).build(),
          ProcedureParameter.in("keys", StringType).defaultValue("''").build(),
          ProcedureParameter.in("source", StringType).defaultValue("''").build()),
        r => {
          val spark = SparkSession.active
          import org.apache.spark.sql.functions.col
          val dir = dirOf(str(r, 0))
          val keyCol = str(r, 1)
          val csv = str(r, 2)
          val source = str(r, 3)
          require(csv.nonEmpty ^ source.nonEmpty,
            "delete_by_key needs exactly one of `keys` (literal list) or `source` (view name)")
          val keyRows =
            if (source.nonEmpty) spark.table(source).select(col(keyCol))
            else {
              val ks = csv.split(',').map(_.trim).filter(_.nonEmpty).toIndexedSeq
              require(ks.nonEmpty, "empty `keys` list")
              spark.createDataset(ks)(org.apache.spark.sql.Encoders.STRING).toDF(keyCol)
            }
          // deleteByKey casts to the committed key type and refuses nulls
          // (a literal that fails its cast surfaces as the null refusal)
          ManifestTable.deleteByKey(keyRows, dir, Seq(keyCol))
        })
      case "profile" =>
        // column profiling from plain SQL — the 100 TB first-look
        // ([[graft.operators.Stats.profileApprox]]: counts, HLL ndv,
        // min/max, ONE map-side-combine pass, no Expand) reachable the
        // way zorder is. rsd <= 0 selects the EXACT twin
        // ([[graft.operators.Stats.profile]] — count(DISTINCT), the
        // Expand pass; right at audit scale, wrong at first-look
        // scale). Reads through the catalog table (MoR deltas,
        // renames, defaults all apply), returns the profile rows.
        procRows(name,
          "one-pass column profile: n, nulls, ndv (HLL at `rsd`, exact when rsd <= 0), min/max",
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("columns", StringType).build(),
            ProcedureParameter.in("rsd", DoubleType).defaultValue("0.05").build()),
          r => {
            val spark = SparkSession.active
            val df = spark.table(s"$catalogName.${str(r, 0)}")
            val cols = str(r, 1).split(',').map(_.trim).filter(_.nonEmpty).toIndexedSeq
            val rsd = r.getDouble(2)
            val out =
              if (rsd <= 0) graft.operators.Stats.profile(df, cols)
              else graft.operators.Stats.profileApprox(df, cols, rsd)
            (out.schema, out.collect().map(row => InternalRow.fromSeq(
              row.toSeq.zip(out.schema.fields).map {
                case (null, _) => null
                case (s: String, _) => UTF8String.fromString(s)
                case (v, _) => v
              })))
          })
      case "vacuum" => proc(name, "delete unreferenced data files older than min_age_hours",
        Seq(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("min_age_hours", LongType).defaultValue("24").build()),
        r => {
          ManifestTable.vacuum(dirOf(str(r, 0)), r.getLong(1) * 3600L * 1000L)
          ManifestTable.latestVersion(dirOf(str(r, 0))).getOrElse(-1L)
        })
      case other =>
        throw new IllegalArgumentException(
          s"no such procedure: $Namespace.$other (known: ${list().mkString(", ")})")
    }
  }

  /** Result-set procedure: `run` returns (schema, rows) and the CALL
    * surfaces them as a local scan — the shape a profiling/reporting
    * procedure needs (the maintenance procedures return one version
    * row via [[proc]]).
    */
  private def procRows(
      procName: String, doc: String,
      params: Seq[ProcedureParameter],
      run: InternalRow => (StructType, Array[InternalRow])): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = doc
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val (schema, rows) = run(input)
          java.util.List.of[Scan](
            new GraftRowsScan(s"graft-procedure $procName", schema, rows)).iterator()
        }
      }
    }

  private def proc(
      procName: String, doc: String,
      params: Seq[ProcedureParameter], run: InternalRow => Long): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = doc
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val v = run(input)
          java.util.List.of[Scan](new GraftAggScan(
            s"graft-procedure $procName",
            StructType(Seq(StructField("version", LongType, nullable = false))),
            InternalRow(v))).iterator()
        }
      }
    }
}
