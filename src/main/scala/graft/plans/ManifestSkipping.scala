package graft.plans

import graft.sources.{ManifestTable, MemberIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planning-time file skipping for manifest-tracked tables, injected
  * into the optimizer — the rule Iceberg/Delta ship as `PrepareScan`:
  * a SQL user who just writes `WHERE ts BETWEEN ...` over a
  * [[ManifestTable.snapshot]] view gets the same file pruning
  * [[ManifestTable.prunedScan]] gives API callers, automatically.
  *
  * Mechanics: a `Filter` directly over a parquet `LogicalRelation`
  * whose every file lives under a manifest table's `data/` layout is
  * rewritten to scan ONLY the files whose committed min/max envelope
  * can satisfy the filter's range/equality/IN conjuncts on tracked
  * columns. Equality/IN conjuncts additionally consult the per-file
  * Bloom sidecar ([[MemberIndex]]) when one exists for the column. The
  * `Filter` node itself is always retained, so the transform is
  * bit-identical by construction — pruning only removes files that
  * cannot contribute a row, decided from the same manifest stats
  * `prunedScan` consults, evaluated driver-side with Spark's own
  * `Cast` + interpreted orderings (no extra jobs at plan time).
  *
  * Safety envelope (each guard falls back to "don't touch the plan"):
  *  - only plain, non-streaming, non-partitioned parquet relations;
  *  - only when EVERY file resolves to a live manifest entry — a file
  *    with no stats (foreign file, expired manifest) keeps the scan
  *    unpruned rather than guessing;
  *  - only top-level AND-conjuncts of `<,<=,>,>=,=,<=>,IN` between a
  *    bare column and a literal of the same type — anything else
  *    (OR, IS NULL, casts, expressions) contributes no constraint;
  *  - a file whose envelope is null (no non-null value in the column)
  *    is skipped for range/equality constraints, which null rows can
  *    never satisfy — IS NULL never reaches a constraint, so files
  *    holding only nulls are prunable exactly when provably dead;
  *  - fixpoint-stable: when nothing new prunes, the plan returns
  *    unchanged (reference-equal), so the optimizer batch terminates.
  *
  * The same constraint machinery serves the DSv2 catalog path
  * ([[graft.sources.GraftCatalog]]) through [[ManifestSkipping.survivors]],
  * so `spark.sql` against a catalog table and against a snapshot view
  * prune identically.
  *
  * At 100 TB this turns "scan 40,000 files, let parquet row-group
  * stats save you at runtime" into "open the 12 overlapping files" —
  * listing, footer reads, and task scheduling all shrink with it.
  * Disable per-session with `spark.graft.manifestSkipping.enabled`.
  */
case class ManifestSkipping(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get("spark.graft.manifestSkipping.enabled", "true").toBoolean) plan
    else plan.transform {
      case f @ Filter(cond, l: LogicalRelation) =>
        l.relation match {
          case fsRel: HadoopFsRelation
              if !l.isStreaming && fsRel.partitionSchema.isEmpty =>
            prunedRelation(cond, l, fsRel).map(nl => f.copy(child = nl)).getOrElse(f)
          case _ => f
        }
    }

  /** Some(relation over fewer files) when at least one file proves
    * dead; None to leave the plan untouched.
    */
  private def prunedRelation(
      cond: Expression, l: LogicalRelation, fsRel: HadoopFsRelation): Option[LogicalRelation] = {
    val files = fsRel.location.inputFiles
    if (files.isEmpty) return None
    val stats = ManifestSkipping.statsFor(files)
    if (stats == null) return None // not (all) manifest-backed
    val survived = ManifestSkipping.survivors(cond, files.toIndexedSeq, stats)
      .getOrElse(return None)
    if (survived.length == files.length) None
    else {
      val idx = new InMemoryFileIndex(
        spark, survived.map(new Path(_)).toIndexedSeq, fsRel.options, Some(fsRel.dataSchema))
      Some(l.copy(relation = fsRel.copy(location = idx)(spark)))
    }
  }
}

object ManifestSkipping extends PredicateHelper {

  /** Per-file envelopes. A column absent from the maps but present in
    * `track` is a NULL envelope (JSON rendering omits None values —
    * the file has no non-null value there); a column not in `track`
    * has no envelope at all and can never justify a skip. Constraints
    * check [[Stats.tracked]] first and read via [[Stats.mn]]/[[Stats.mx]].
    * `dir` locates the owning table for Bloom-sidecar lookups.
    */
  final case class Stats(
      dir: String,
      track: Seq[String],
      rawMins: Map[String, Option[String]], rawMaxs: Map[String, Option[String]],
      /** Current column name -> its HISTORICAL names (newest first),
        * from the manifest's rename chain: a pre-rename file's envelope
        * is keyed under the name its bytes carry. Retired names are
        * never reused, so at most one key matches per file — the alias
        * walk cannot pick up a stranger's envelope.
        */
      aliases: Map[String, Seq[String]] = Map.empty,
      /** This FILE's entry sequence + the manifest's track-spec
        * evolution watermarks: a column tracked since a version AFTER
        * this file was written has no envelope here — `tracked` is
        * false for it, so the file is always scanned (never conflated
        * with the skippable all-null case, whose key is also absent).
        */
      fileSeq: Long = Long.MaxValue,
      trackSince: Map[String, Long] = Map.empty,
      /** Initial-default claims ([[ManifestTable.defaultSince]]):
        * CURRENT column name -> (version the column was added in, its
        * initial default as a stat string — None for NULL). A file
        * with seq < added-in version physically misses the column and
        * reads the initial default unconditionally, so it behaves as
        * min = max = default (or all-null) for skipping — WITHOUT
        * these claims every pre-add file is always scanned for
        * predicates on the evolved column.
        */
      defaults: Map[String, (Long, Option[String])] = Map.empty) {
    private def keys(col: String): Seq[String] = col +: aliases.getOrElse(col, Nil)
    private def covered(cur: String): Boolean =
      trackSince.get(cur).forall(_ <= fileSeq)
    /** `col` (possibly an era alias) resolved to its CURRENT name. */
    private def currentOf(col: String): String =
      if (defaults.contains(col) || track.contains(col)) col
      else aliases.collectFirst {
        case (cur, hs) if hs.contains(col) => cur }.getOrElse(col)
    /** This file predates the column's ADD COLUMN commit: it reads the
      * initial default unconditionally — a known-constant column.
      */
    private def preAdd(col: String): Boolean =
      defaults.get(currentOf(col)).exists(_._1 > fileSeq)
    /** A column prunes if the CURRENT name is tracked (and this file
      * postdates the column's track-spec entry), or if it is a
      * historical alias of a tracked column (filters pushed under a
      * rename-era projection arrive in era names — those hit the old
      * files' stat keys directly), or — TRACKED OR NOT — if this file
      * predates the column's ADD COLUMN commit: the initial default IS
      * the envelope then, no commit-time stats required.
      */
    def tracked(col: String): Boolean =
      preAdd(col) ||
        (track.contains(col) && covered(col)) ||
        aliases.exists { case (cur, hs) =>
          hs.contains(col) && track.contains(cur) && covered(cur) }
    def mn(col: String): Option[String] =
      keys(col).collectFirst { case k if rawMins.contains(k) => rawMins(k) } match {
        case Some(raw) => raw
        case None if preAdd(col) => defaults(currentOf(col))._2
        case None => None
      }
    def mx(col: String): Option[String] =
      keys(col).collectFirst { case k if rawMaxs.contains(k) => rawMaxs(k) } match {
        case Some(raw) => raw
        case None if preAdd(col) => defaults(currentOf(col))._2
        case None => None
      }
  }

  /** The rename-alias map for `m`'s committed schema (empty for the
    * overwhelmingly common never-renamed table).
    */
  private[graft] def aliasesOf(m: ManifestTable.Manifest): Map[String, Seq[String]] =
    ManifestTable.renameAliases(m)

  /** The files of `files` that MAY satisfy `cond` per the committed
    * envelopes + Bloom sidecars; None when the filter contributes no
    * usable constraint (caller leaves the scan alone). `files` may
    * carry a URI scheme; returned entries preserve the caller's form.
    * Shared by the injected V1 rule and the DSv2 catalog scan builder —
    * one soundness envelope, two entry points.
    */
  private[graft] def survivors(
      cond: Expression, files: Seq[String], stats: Map[String, Stats]): Option[Seq[String]] = {
    val constraints = extract(cond)
    if (constraints.isEmpty) return None
    // HIDDEN PARTITIONING: a track spec may be a transform of a source
    // column (days/bucket/truncate — graft.sources.TrackSpec). A
    // predicate on the SOURCE derives a constraint on the TRANSFORMED
    // envelope: monotone transforms derive ranges (strict bounds
    // conservatively widened to non-strict), the hash bucket derives
    // equality/IN only. Derived per owning table dir — track specs are
    // per-table.
    val derivedByDir: Map[String, Seq[Constraint]] =
      stats.values.map(s => (s.dir, s.track, s.aliases)).toSet.toSeq
        .groupBy((p: (String, Seq[String], Map[String, Seq[String]])) => p._1)
        .map { case (d, ts) =>
          val aliasUnion: Map[String, Seq[String]] = ts.flatMap(_._3)
            .groupBy(_._1).map { case (k, vs) => k -> vs.flatMap(_._2).distinct }
          val specs = ts.flatMap(_._2).distinct
            .map(t => graft.sources.TrackSpec.parse(t))
            .filterNot(_.isInstanceOf[graft.sources.TrackSpec.Identity])
          // ERA EXPANSION: a filter pushed under a rename-era projection
          // arrives in that era's SOURCE name, and each V1-rule relation
          // holds exactly one era's files — the spec re-rendered over
          // each historical source name derives the constraint under the
          // key those files' envelopes actually carry (current-name
          // filters keep deriving via the unmodified spec; the Stats
          // alias walk resolves each key against each file)
          val expanded = specs.flatMap(sp =>
            sp +: aliasUnion.getOrElse(sp.source, Nil).map(o =>
              graft.sources.TrackSpec.withSource(sp, o)))
          d -> expanded.flatMap(sp => constraints.flatMap(c => derive(c, sp)))
        }
    // equality/IN conjuncts additionally consult the Bloom sidecar
    // (MemberIndex) when one exists for the column: a point lookup on a
    // column the table is NOT clustered by has useless min/max envelopes,
    // and the membership fingerprint (no false negatives) is exactly
    // what prunes it. Index + per-value bit positions resolve ONCE per
    // (table dir, column) — position hashing runs the same xxhash64
    // expressions the build ran, evaluated driver-side.
    val memberChecks = extractMember(cond)
    val tableDirs: Seq[String] = stats.values.map(_.dir).toSet.toSeq
    val bloom: Map[(String, String), (MemberIndex.Index, Seq[Seq[Int]])] =
      tableDirs.flatMap { d =>
        memberChecks.flatMap { case (c, dt, vals) =>
          // probe values hash under the CURRENT column type — an index
          // fingerprinted under a narrower pre-widening type would
          // produce Bloom false negatives (wrongly pruned live files)
          MemberIndex.newest(d, c)
            .filter(ix => MemberIndex.typeConsistent(ix, d, dt))
            .map(ix =>
              ((d, c), (ix, vals.map(v => MemberIndex.positionsOf(ix, v, dt)))))
        }
      }.toMap
    Some(files.filter { f =>
      val p = stripScheme(f)
      val entry = stats(p)
      constraints.forall(_.mayMatch(entry)) &&
        derivedByDir.getOrElse(entry.dir, Nil).forall(_.mayMatch(entry)) &&
        memberChecks.forall { case (c, _, _) =>
          bloom.get((entry.dir, c)) match {
            case Some((ix, poss)) => poss.exists(ps => MemberIndex.mightContain(ix, p, ps))
            case None => true // no index for this column: cannot skip
          }
        }
    })
  }

  /** One per usable conjunct: can a file with this envelope hold a
    * matching row? Bounds compare with Spark's interpreted ordering
    * for the column's type; a null envelope can never satisfy a
    * range/equality/IN predicate (those are null-rejecting).
    */
  private sealed trait Constraint { def mayMatch(e: Stats): Boolean }

  private final case class Range(
      col: String, dt: DataType,
      lo: Option[Any], loStrict: Boolean,
      hi: Option[Any], hiStrict: Boolean) extends Constraint {
    private val ord = TypeUtils.getInterpretedOrdering(dt)
    def mayMatch(e: Stats): Boolean =
      if (!e.tracked(col)) true // no envelope committed: cannot skip
      else (e.mn(col), e.mx(col)) match {
        case (Some(mn), Some(mx)) =>
          val fMin = castStat(mn, dt)
          val fMax = castStat(mx, dt)
          fMin != null && fMax != null && // uncastable stat: never skip
            lo.forall(v => if (loStrict) ord.gt(fMax, v) else ord.gteq(fMax, v)) &&
            hi.forall(v => if (hiStrict) ord.lt(fMin, v) else ord.lteq(fMin, v))
        case _ => false // no non-null value in the file: range can't match
      }
  }

  private final case class InList(col: String, dt: DataType, values: Seq[Any]) extends Constraint {
    private val ord = TypeUtils.getInterpretedOrdering(dt)
    def mayMatch(e: Stats): Boolean =
      if (!e.tracked(col)) true
      else (e.mn(col), e.mx(col)) match {
        case (Some(mn), Some(mx)) =>
          val fMin = castStat(mn, dt)
          val fMax = castStat(mx, dt)
          fMin == null || fMax == null ||
            values.exists(v => ord.gteq(v, fMin) && ord.lteq(v, fMax))
        case _ => false
      }
  }

  /** A source-column constraint mapped through one hidden-partitioning
    * transform spec, targeting the spec's envelope key. Soundness:
    * monotone transforms (days, truncate) preserve ordering, so
    * `lo <= x <= hi` implies `T(lo) <= T(x) <= T(hi)` — strict source
    * bounds widen to non-strict (T collapses distinct values); the
    * hash bucket preserves only equality, so ranges derive nothing and
    * point/IN predicates map value-wise. `TrackSpec.literal` is
    * defined value-identical to the commit-time stats expression, so
    * the derived comparison is against the exact envelope domain.
    */
  private def derive(
      c: Constraint, s: graft.sources.TrackSpec.Spec): Option[Constraint] = c match {
    case Range(col, dt, lo, loS, hi, hiS) if col == s.source =>
      val ot = graft.sources.TrackSpec.outputType(s, dt)
      if (graft.sources.TrackSpec.monotone(s))
        Some(Range(s.key, ot,
          lo.map(graft.sources.TrackSpec.literal(s, _, dt)), loStrict = false,
          hi.map(graft.sources.TrackSpec.literal(s, _, dt)), hiStrict = false))
      else (lo, hi) match {
        case (Some(a), Some(b)) if !loS && !hiS && a == b =>
          val t = graft.sources.TrackSpec.literal(s, a, dt)
          Some(Range(s.key, ot, Some(t), loStrict = false, Some(t), hiStrict = false))
        case _ => None
      }
    case InList(col, dt, vs) if col == s.source =>
      Some(InList(s.key, graft.sources.TrackSpec.outputType(s, dt),
        vs.map(graft.sources.TrackSpec.literal(s, _, dt))))
    case _ => None
  }

  /** Tracked-column constraints from the filter's top-level conjuncts.
    * Only shapes whose skip decision is provably sound contribute;
    * everything else is ignored (the retained Filter still runs it).
    */
  private def extract(cond: Expression): Seq[Constraint] = {
    // orderable scalar types whose string stats round-trip through Cast
    def scalar(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | BooleanType | DateType |
           TimestampType | TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
    def name(e: Expression): Option[(String, DataType)] = e match {
      case a: AttributeReference if scalar(a.dataType) => Some((a.name, a.dataType))
      case _ => None
    }
    def lv(e: Expression): Option[Any] = e match {
      case Literal(v, _) if v != null => Some(v)
      case _ => None
    }
    splitConjunctivePredicates(cond).flatMap {
      // literal-on-the-left mirrors MUST precede the general cases: a
      // pattern like GreaterThan(a, v) binds a to ANY left child
      // (including a literal), so with the general case first the
      // mirrors would be unreachable and `WHERE 100 > id` would never
      // prune (constraint lost — still correct, silently unskipped)
      case GreaterThan(v: Literal, a) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, None, loStrict = false, Some(x), hiStrict = true)
      case GreaterThanOrEqual(v: Literal, a) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, None, loStrict = false, Some(x), hiStrict = false)
      case LessThan(v: Literal, a) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, Some(x), loStrict = true, None, hiStrict = false)
      case LessThanOrEqual(v: Literal, a) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, Some(x), loStrict = false, None, hiStrict = false)
      case GreaterThan(a, v) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, Some(x), loStrict = true, None, hiStrict = false)
      case GreaterThanOrEqual(a, v) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, Some(x), loStrict = false, None, hiStrict = false)
      case LessThan(a, v) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, None, loStrict = false, Some(x), hiStrict = true)
      case LessThanOrEqual(a, v) => for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, None, loStrict = false, Some(x), hiStrict = false)
      case EqualTo(a, v) => (for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, Some(x), loStrict = false, Some(x), hiStrict = false))
        .orElse(for ((c, t) <- name(v); x <- lv(a))
          yield Range(c, t, Some(x), loStrict = false, Some(x), hiStrict = false))
      case EqualNullSafe(a, v) => (for ((c, t) <- name(a); x <- lv(v))
        yield Range(c, t, Some(x), loStrict = false, Some(x), hiStrict = false))
        .orElse(for ((c, t) <- name(v); x <- lv(a))
          yield Range(c, t, Some(x), loStrict = false, Some(x), hiStrict = false))
      case In(a, vs) if vs.nonEmpty && vs.forall(v => lv(v).isDefined) =>
        name(a).map { case (c, t) => InList(c, t, vs.flatMap(lv)) }
      case InSet(a, hset) if hset.nonEmpty && !hset.contains(null) =>
        name(a).map { case (c, t) => InList(c, t, hset.toSeq) }
      case _ => None
    }
  }

  /** The point-lookup conjuncts (equality / IN between a bare column
    * and non-null literals) eligible for Bloom-sidecar consultation.
    * Same soundness envelope as [[extract]]'s shapes: a file is
    * skipped only when NO predicate value can be present (no false
    * negatives in the fingerprint), and the retained Filter still runs
    * the exact predicate on survivors.
    */
  private def extractMember(cond: Expression): Seq[(String, DataType, Seq[Any])] = {
    def name(e: Expression): Option[(String, DataType)] = e match {
      case a: AttributeReference => Some((a.name, a.dataType))
      case _ => None
    }
    def lv(e: Expression): Option[Any] = e match {
      case Literal(v, _) if v != null => Some(v)
      case _ => None
    }
    splitConjunctivePredicates(cond).flatMap {
      case EqualTo(a, v) => (for ((c, t) <- name(a); x <- lv(v)) yield (c, t, Seq(x)))
        .orElse(for ((c, t) <- name(v); x <- lv(a)) yield (c, t, Seq(x)))
      case EqualNullSafe(a, v) => (for ((c, t) <- name(a); x <- lv(v)) yield (c, t, Seq(x)))
        .orElse(for ((c, t) <- name(v); x <- lv(a)) yield (c, t, Seq(x)))
      case In(a, vs) if vs.nonEmpty && vs.forall(v => lv(v).isDefined) =>
        name(a).map { case (c, t) => (c, t, vs.flatMap(lv)) }
      case InSet(a, hset) if hset.nonEmpty && !hset.contains(null) =>
        name(a).map { case (c, t) => (c, t, hset.toSeq) }
      case _ => None
    }
  }

  // keyed by (tableDir, live manifest versions) so new commits refresh;
  // stale entries for the same dir are EVICTED on refresh — a streaming
  // table commits every trigger, and keeping one full per-file stats
  // map per historical version set is an unbounded driver leak
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[Long]), Map[String, Stats]]()

  /** Stats for every file, or null when any file is not resolvable to
    * a live manifest entry (foreign scan, expired snapshot) — the
    * caller then leaves the plan alone.
    */
  private[plans] def statsFor(files: Array[String]): Map[String, Stats] = {
    // cheap early-out before touching every path: almost every scan in a
    // session is NOT manifest-backed, and the rule runs on each of them
    if (tableDirOf(stripScheme(files(0))).isEmpty) return null
    val byDir = files.map(stripScheme).groupBy(tableDirOf)
    if (byDir.contains(None)) return null
    val all = byDir.keys.flatten.map { dir =>
      val key = (dir, ManifestTable.versions(dir).sorted)
      // evict superseded snapshots of this dir BEFORE the insert (CHM
      // forbids mutating inside the mapping function)
      cache.keySet.removeIf(k => k._1 == dir && k != key)
      dir -> cache.computeIfAbsent(key, { _ =>
        // ascending, so a path live in several snapshots resolves to
        // its NEWEST entry — before type widening all versions carried
        // a file's stats verbatim and order was irrelevant, but a
        // float -> double widen REWRITES the column's envelopes in
        // place (ManifestTable.widenColumn), and resolving the stale
        // narrow-era string under the widened predicate type would
        // prune the exact files the rewrite exists to keep
        ManifestTable.versions(dir).sorted.flatMap { v =>
          val m = ManifestTable.manifest(dir, Some(v))
          // hoisted: defaultSince re-parses the manifest schema JSON
          // and re-folds default SQL — per MANIFEST, never per file
          val defaults = ManifestTable.defaultSince(m)
          m.files.map(f => f.path -> Stats(dir, m.track, f.mins, f.maxs, aliasesOf(m),
            fileSeq = f.seq, trackSince = m.trackSince, defaults = defaults))
        }.toMap
      })
    }.toMap
    val resolved = files.map { f =>
      val p = stripScheme(f)
      tableDirOf(p).flatMap(all(_).get(p).map(p -> _))
    }
    if (resolved.exists(_.isEmpty)) null else resolved.flatten.toMap
  }

  /** `<table>/data/c-<uuid>/part-*.parquet` -> Some(table dir) iff the
    * table dir has a manifest log.
    */
  private def tableDirOf(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).flatMap(c => Option(c.getParent)).flatMap { dataDir =>
      Option(dataDir.getParent).collect {
        case t if dataDir.getFileName.toString == "data" &&
          p.getParent.getFileName.toString.startsWith("c-") &&
          java.nio.file.Files.isDirectory(t.resolve("_manifests")) => t.toString
      }
    }
  }

  private[graft] def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  /** A committed stat string back to the column's INTERNAL value —
    * the driver-side inverse of ManifestTable's stat serialization.
    * Instant timestamps are stored as epoch micros (zone-free), which
    * IS TimestampType's internal Long representation; everything else
    * round-trips through Spark's own cast. A malformed stat yields
    * null, which constraints treat as "never skip".
    */
  private[graft] def castStat(s: String, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(s)
    case TimestampType =>
      try java.lang.Long.valueOf(s.trim)
      catch { case _: NumberFormatException => null }
    case _ =>
      Cast(Literal(UTF8String.fromString(s), StringType), dt,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)).eval(null)
  }
}
