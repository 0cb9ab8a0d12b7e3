package graft.plans

import graft.sources.{GraftLakeTable, ManifestTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Merge-on-read delete application for the DSv2 catalog path — the
  * missing half of [[graft.sources.GraftCatalog]]'s read surface: a
  * bare V2 parquet scan cannot express the sequence-scoped anti joins
  * pending equality/positional tombstones require, so (pre-r13) the
  * catalog refused such tables outright and pointed at the API reads.
  * This analyzer rule closes that gap the way Iceberg's Spark
  * integration does (its scans plan delete-file application into the
  * read): a [[DataSourceV2Relation]] whose resolved snapshot carries
  * pending tombstones is rewritten, AT RESOLUTION TIME, into the same
  * applied-read logical plan [[ManifestTable.snapshot]] builds —
  * positional tombstones anti-joined on (file, row-index), equality
  * tombstones through the sequence-scoped key join — re-aliased to the
  * relation's own output attributes so downstream references bind
  * unchanged.
  *
  * `SELECT ... FROM graft.lake.t` (and `VERSION/TIMESTAMP AS OF`) is
  * then bit-identical to the applied snapshot with NO caller-side
  * ceremony, and one retraction stream no longer forces
  * materializeDeletes before every SQL read.
  *
  * Scale shape: the rewrite itself is O(1) plan surgery per relation;
  * the resulting plan is the applied read's — tombstone side of the
  * joins is O(deleted keys) and explicitly broadcast, data side stays
  * a parquet scan that Catalyst still pushes filters/column pruning
  * into (predicates on data columns migrate through the anti joins'
  * left side). Tables WITHOUT pending tombstones never match, keeping
  * the envelope+Bloom-pruned fast path of the V2 scan builder.
  *
  * Registered via `SparkSessionExtensions.injectResolutionRule`
  * (Engine.session). A session that configures the catalog WITHOUT the
  * extensions fails loudly at planning instead of returning
  * un-applied rows — [[GraftLakeTable.newScanBuilder]] refuses
  * tombstone-carrying snapshots, which after this rule is unreachable
  * except in exactly that misconfiguration.
  */
case class MorApplyRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // row-level DML (UPDATE / MERGE / DELETE) must keep its TARGET a
    // real V2 relation: swapping it for the applied-read plan here
    // would leave Spark's rewrite rules nothing to plan against (an
    // opaque "table does not support UPDATE" failure). The target
    // refuses tombstone-carrying tables itself, with an actionable
    // message (GraftLakeTable.newRowLevelOperationBuilder); SOURCE
    // relations (e.g. MERGE USING another lake table) still rewrite
    // through the recursive apply on the source subtree.
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
      u.withNewChildren(Seq(u.table))
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
      d.withNewChildren(Seq(d.table))
    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      m.withNewChildren(Seq(m.targetTable, apply(m.sourceTable)))
    case _ => plan.resolveOperatorsUp {
      case r: DataSourceV2Relation =>
        r.table match {
          // the MERGE-ON-READ delta path's READ side (SupportsDelta —
          // graft.sources.GraftDeltaOperation): unlike the group-based
          // CoW rewrite (whose target must stay a real V2 relation for
          // the planned-file bookkeeping, and which refuses tombstoned
          // tables at analysis), a delta never swaps files — its read
          // just needs the APPLIED rows, so a tombstone-/rename-era-
          // carrying target swaps for the applied view exactly like a
          // plain SELECT. This is what lets MoR UPDATE/MERGE chain:
          // statement N's read applies statement N-1's tombstones.
          case t if org.apache.spark.sql.GraftSqlBridge.rowLevelOperationOf(t)
              .exists {
                case op: graft.sources.GraftDeltaOperation =>
                  op.m.hasMorDeletes || op.m.renamesApply
                case _ => false
              } =>
            val op = org.apache.spark.sql.GraftSqlBridge.rowLevelOperationOf(t)
              .get.asInstanceOf[graft.sources.GraftDeltaOperation]
            val applied = ManifestTable.appliedSnapshot(spark, op.m)
            val child = applied.queryExecution.analyzed
            val byName = child.output.map(a => a.name -> a).toMap
            Project(
              r.output.map(o => Alias(byName(o.name), o.name)(exprId = o.exprId)),
              child)
          // same treatment for rename-era tables: a single fixed-schema
          // scan would read pre-rename files' renamed columns as NULL;
          // the snapshot plan groups files by rename era instead
          case t: GraftLakeTable if t.m.hasMorDeletes || t.m.renamesApply =>
            // plan from the relation's RESOLVED manifest, not a version
            // re-resolution: the table may be a branch head (wap.branch
            // read routing) whose number is not a main snapshot
            val applied = ManifestTable.appliedSnapshot(spark, t.m)
            val child = applied.queryExecution.analyzed
            val byName = child.output.map(a => a.name -> a).toMap
            // keep the relation's exprIds: every downstream reference
            // resolved against the V2 relation's output must still bind
            Project(
              r.output.map(o => Alias(byName(o.name), o.name)(exprId = o.exprId)),
              child)
          case _ => r
        }
    }
  }
}
