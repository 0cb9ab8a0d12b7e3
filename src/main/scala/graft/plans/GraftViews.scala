package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedView}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL views over [[graft.sources.GraftCatalog]] tables — the DSv2
  * `ViewCatalog` wired into the session the way Iceberg wires its REST
  * view support: OSS Spark ships the catalog API but NO analyzer
  * support (`ResolveSessionCatalog` refuses `CREATE VIEW cat.ns.v`
  * for every non-session catalog unconditionally), so the engine's
  * extensions close the gap with two small pieces:
  *
  *  - a PARSER wrapper ([[GraftSqlParser]]) that rewrites the parsed
  *    `CreateView` / `DropView` / `ShowViews` nodes into runnable
  *    commands against the catalog WHEN the identifier names a graft
  *    catalog — one pattern match per statement, every other statement
  *    (and every other catalog) passes through byte-identical;
  *  - a RESOLUTION rule ([[ResolveGraftViews]]) that expands a
  *    still-unresolved relation naming a persisted view into its
  *    parsed definition text (unqualified table references qualified
  *    with the view's stored creation context), aliased under the view
  *    name — table lookups win first (the built-in resolution already
  *    ran), so a view can never shadow a real table.
  *
  * The expanded text re-plans through the catalog's own scan builder:
  * a view over a manifest table prunes files exactly like querying the
  * table directly, and the view document itself is O(1) warehouse
  * metadata ([[graft.sources.GraftView]]) that survives session
  * restarts.
  */
object GraftViewSupport {

  /** The (catalog, identifier) a multipart name targets, when its head
    * names a configured graft catalog. Views are explicit-catalog only
    * (`graft.lake.v`) — the session catalog's temp/global views keep
    * their own resolution untouched.
    */
  def viewTarget(spark: SparkSession, parts: Seq[String]): Option[(ViewCatalog, Identifier)] =
    if (parts.length < 2) None
    else if (!spark.conf.getOption(s"spark.sql.catalog.${parts.head}")
      .contains("graft.sources.GraftCatalog")) None
    else spark.sessionState.catalogManager.catalog(parts.head) match {
      case vc: ViewCatalog =>
        Some((vc, Identifier.of(parts.tail.init.toArray, parts.last)))
      case _ => None
    }
}

/** Parser wrapper (SparkSessionExtensions.injectParser): delegates all
  * parsing, then rewrites view DDL that targets a graft catalog.
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  private def parts(child: LogicalPlan): Option[Seq[String]] = child match {
    case UnresolvedIdentifier(p, _) => Some(p)
    case UnresolvedView(p, _, _, _) => Some(p)
    case _ => None
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case CreateView(child, userCols, comment, _, props, originalText, _,
        allowExisting, replace, _) =>
      (for {
        p <- parts(child)
        (cat, id) <- GraftViewSupport.viewTarget(spark, p)
      } yield {
        require(userCols.isEmpty,
          s"CREATE VIEW ${p.mkString(".")}: explicit column lists are not supported " +
            "on graft views; alias in the SELECT instead")
        val sql = originalText.getOrElse(throw new IllegalArgumentException(
          s"CREATE VIEW ${p.mkString(".")}: no view text to persist"))
        GraftCreateViewCommand(cat, id, sql, comment, props, allowExisting, replace)
          : LogicalPlan
      }).getOrElse(plan)
    case DropView(child, ifExists) =>
      (for {
        p <- parts(child)
        (cat, id) <- GraftViewSupport.viewTarget(spark, p)
      } yield GraftDropViewCommand(cat, id, ifExists): LogicalPlan).getOrElse(plan)
    case org.apache.spark.sql.catalyst.plans.logical.RenameTable(
        org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView(p, _, _),
        newName, true) =>
      (for {
        (cat, from) <- GraftViewSupport.viewTarget(spark, p)
        if cat.viewExists(from)
      } yield {
        // ALTER VIEW a RENAME TO b: a bare target keeps the source's
        // namespace (Spark's rename contract); a qualified one must
        // stay inside the same catalog
        val to =
          if (newName.length == 1) Identifier.of(from.namespace(), newName.head)
          else {
            val tp = if (newName.head == p.head) newName else p.head +: newName
            val (toCat, t) = GraftViewSupport.viewTarget(spark, tp).getOrElse(
              throw new IllegalArgumentException(
                s"RENAME VIEW cannot move across catalogs: ${newName.mkString(".")}"))
            require(toCat eq cat,
              s"RENAME VIEW cannot move across catalogs: ${newName.mkString(".")}")
            t
          }
        GraftRenameViewCommand(cat, from, to): LogicalPlan
      }).getOrElse(plan)
    case org.apache.spark.sql.catalyst.plans.logical.DescribeRelation(
        org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView(p, _, _),
        _, isExtended, output) =>
      (for {
        (cat, id) <- GraftViewSupport.viewTarget(spark, p)
        if cat.viewExists(id)
      } yield GraftDescribeViewCommand(cat, id, isExtended, output): LogicalPlan)
        .getOrElse(plan)
    case sv @ ShowViews(UnresolvedNamespace(p, _), pattern, output) =>
      (for {
        (cat, _) <- GraftViewSupport.viewTarget(spark, p :+ "*")
      } yield GraftShowViewsCommand(cat, p.tail, pattern, output): LogicalPlan)
        .getOrElse(sv)
    case other => other
  }

  // pure delegation below
  override def parsePlanWithParameters(
      sqlText: String, ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String) = rewrite(delegate.parseQuery(sqlText))
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
}

/** Resolution rule: expand a still-unresolved relation that names a
  * persisted graft view into its definition text. Runs after the
  * built-in table resolution in the same fixed point, so real tables
  * always win; subqueries resolve through the analyzer's own recursive
  * subquery resolution, which replays this rule.
  */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      GraftViewSupport.viewTarget(spark, u.multipartIdentifier)
        .filter { case (cat, id) => cat.viewExists(id) }
        .map { case (cat, id) =>
          val v = cat.loadView(id)
          val parsed = spark.sessionState.sqlParser.parsePlan(v.query)
          // the text resolves under the view's CREATION context: bare
          // single-part table names qualify with the stored catalog +
          // namespace (fully-qualified references pass through)
          val qualified = parsed.resolveOperatorsUp {
            case inner: UnresolvedRelation if inner.multipartIdentifier.length == 1 =>
              inner.copy(multipartIdentifier =
                (v.currentCatalog +: v.currentNamespace.toSeq) ++
                  inner.multipartIdentifier)
          }
          SubqueryAlias(id.name, qualified): LogicalPlan
        }.getOrElse(u)
  }
}

final case class GraftCreateViewCommand(
    catalog: ViewCatalog, ident: Identifier, viewSql: String,
    comment: Option[String], properties: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (catalog.viewExists(ident)) {
      if (allowExisting) return Nil
      if (replace) catalog.dropView(ident): Unit
    }
    // analyze the definition NOW: a typo'd view text must fail its
    // CREATE, not every later read — and the analyzed schema persists
    // with the document (the ViewCatalog contract)
    val analyzed = spark.sql(viewSql)
    import scala.jdk.CollectionConverters._
    val props = (properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)).asJava
    catalog.createView(new ViewInfo(
      ident, viewSql,
      spark.sessionState.catalogManager.currentCatalog.name(),
      spark.sessionState.catalogManager.currentNamespace,
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String], props))
    Nil
  }
}

final case class GraftDropViewCommand(
    catalog: ViewCatalog, ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

final case class GraftDescribeViewCommand(
    catalog: ViewCatalog, ident: Identifier, isExtended: Boolean,
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = catalog.loadView(ident)
    val cols = v.schema().fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, f.getComment().orNull))
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# View Information", "", ""),
      Row("View Text", v.query(), ""),
      Row("View Catalog and Namespace",
        (v.currentCatalog() +: v.currentNamespace().toSeq).mkString("."), ""))
  }
}

final case class GraftRenameViewCommand(
    catalog: ViewCatalog, from: Identifier, to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Nil
  }
}

final case class GraftShowViewsCommand(
    catalog: ViewCatalog, namespace: Seq[String], pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.listViews(namespace: _*)
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name), p).nonEmpty))
      .map(id => Row(namespace.mkString("."), id.name, false)).toSeq
  }
}
