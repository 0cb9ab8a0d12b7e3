package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HIDDEN-PARTITIONING track specs: a manifest's `track` entry is
  * either a plain column name (identity — envelope stats on the value
  * itself) or a TRANSFORM of one (`days(ts)`, `bucket(16,id)`,
  * `truncate(4,name)`), whose envelope stats are collected on the
  * TRANSFORMED value and whose pruning constraints are DERIVED from
  * predicates on the source column. This is Iceberg's hidden
  * partitioning as an idea (the user queries `ts`, never a synthetic
  * day column, and date-range scans still prune) re-expressed over
  * this engine's envelope machinery — no directory fan-out, no
  * user-visible partition column, the transform lives only in the
  * manifest metadata. (Reference surface: the engine's storage layer;
  * design per the published Iceberg partition-transform spec, own
  * implementation and hash/semantics choices.)
  *
  * Engine-determinism contract (the same discipline as
  * [[graft.operators.VectorKit]]): every transform has one Spark-SQL
  * form (used by commit-time stats collection) and one driver-side
  * form over Catalyst literal values (used by planning-time constraint
  * derivation), defined to be value-identical:
  *
  *  - `days(ts)`: floorDiv(epoch micros, 86_400_000_000) — the UTC day
  *    ordinal, zone-free (DATE columns use their day ordinal as is).
  *    MONOTONE, so range predicates on the source derive range
  *    constraints on the envelope. `hours(ts)` is the same floorDiv at
  *    hour granularity (TIMESTAMP only); `months(ts)`/`years(ts)` map
  *    the UTC day through the proleptic Gregorian civil calendar
  *    (months-since-1970-01 / years-since-1970 — `LocalDate` driver-
  *    side, `date_from_unix_date` + `year`/`month` engine-side, the
  *    same calendar). All MONOTONE.
  *  - `truncate(w, s)`: strings truncate to `w` leading characters
  *    (UTF-8 byte order is code-point order, so a character prefix is
  *    monotone); integrals floor to the nearest multiple of `w`
  *    (floorMod, exact for negatives). MONOTONE.
  *  - `bucket(n, c)`: floorMod(xxhash64(c), n) — the engine's one hash
  *    family (seed 42, same as the Bloom sidecars). NOT monotone:
  *    only equality/IN predicates derive constraints, exactly
  *    Iceberg's bucket-pruning rule.
  *
  * Strict source bounds derive as NON-strict transformed bounds — the
  * transform collapses distinct values, so conservativeness is the
  * only sound direction. Pruning stays bit-identical by construction:
  * a derived constraint can only REMOVE files that provably hold no
  * matching source value, and the exact predicate still runs on
  * survivors.
  */
object TrackSpec {

  sealed trait Spec {
    /** The manifest/track key this spec's envelopes live under. */
    def key: String
    /** The source column the transform reads. */
    def source: String
  }
  final case class Identity(source: String) extends Spec { def key: String = source }
  final case class Days(source: String) extends Spec { def key: String = s"days($source)" }
  final case class Hours(source: String) extends Spec { def key: String = s"hours($source)" }
  final case class Months(source: String) extends Spec { def key: String = s"months($source)" }
  final case class Years(source: String) extends Spec { def key: String = s"years($source)" }
  final case class Bucket(n: Int, source: String) extends Spec {
    def key: String = s"bucket($n,$source)"
  }
  final case class Truncate(w: Int, source: String) extends Spec {
    def key: String = s"truncate($w,$source)"
  }

  private val DaysRe = """days\(\s*([^(),\s]+)\s*\)""".r
  private val HoursRe = """hours\(\s*([^(),\s]+)\s*\)""".r
  private val MonthsRe = """months\(\s*([^(),\s]+)\s*\)""".r
  private val YearsRe = """years\(\s*([^(),\s]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r

  /** Parse a track entry; anything that is not a recognized transform
    * is an identity column name (the overwhelmingly common case, and
    * every pre-existing manifest).
    */
  def parse(s: String): Spec = s.trim match {
    case DaysRe(c) => Days(c)
    case HoursRe(c) => Hours(c)
    case MonthsRe(c) => Months(c)
    case YearsRe(c) => Years(c)
    case BucketRe(n, c) =>
      require(n.toInt >= 1, s"bucket count must be >= 1: $s"); Bucket(n.toInt, c)
    case TruncRe(w, c) =>
      require(w.toInt >= 1, s"truncate width must be >= 1: $s"); Truncate(w.toInt, c)
    case other => Identity(other)
  }

  def isTransform(s: String): Boolean = !parse(s).isInstanceOf[Identity]

  /** The same spec re-rendered over a renamed source column —
    * `days(ts)` becomes `days(event_ts)`. How hidden partitioning
    * SURVIVES a source rename: the committed envelopes stay keyed by
    * the spec string they were written under, and the rename-alias
    * chain maps the current key back to them (Iceberg gets this from
    * field ids; this engine's manifests are name-keyed, so the alias
    * walk is the binding).
    */
  def withSource(spec: Spec, src: String): Spec = spec match {
    case Identity(_) => Identity(src)
    case Days(_) => Days(src)
    case Hours(_) => Hours(src)
    case Months(_) => Months(src)
    case Years(_) => Years(src)
    case Bucket(n, _) => Bucket(n, src)
    case Truncate(w, _) => Truncate(w, src)
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** The envelope's value type for a spec over a source of `srcType`. */
  def outputType(spec: Spec, srcType: DataType): DataType = spec match {
    case Identity(_) => srcType
    case Days(_) | Hours(_) | Months(_) | Years(_) => LongType
    case Bucket(_, _) => LongType
    case Truncate(_, _) => srcType match {
      case StringType => StringType
      case _ => LongType
    }
  }

  /** Validate spec-vs-source-type at declaration time, loudly. */
  def validate(spec: Spec, srcType: DataType): Unit = spec match {
    case Identity(_) => ()
    case Days(c) => requireTemporal("days", c, srcType)
    case Months(c) => requireTemporal("months", c, srcType)
    case Years(c) => requireTemporal("years", c, srcType)
    case Hours(c) => require(srcType == TimestampType,
      s"hours($c) needs a TIMESTAMP source, got ${srcType.simpleString} " +
        "(a DATE has no hour; TIMESTAMP_NTZ has no zone-free epoch)")
    case Bucket(_, c) => require(integral(srcType) || srcType == StringType,
      s"bucket(n,$c) needs an integral or string source, got ${srcType.simpleString}")
    case Truncate(_, c) => require(integral(srcType) || srcType == StringType,
      s"truncate(w,$c) needs an integral or string source, got ${srcType.simpleString}")
  }

  private def requireTemporal(kind: String, c: String, srcType: DataType): Unit = require(
    srcType == TimestampType || srcType == DateType,
    s"$kind($c) needs a TIMESTAMP or DATE source, got ${srcType.simpleString} " +
      "(TIMESTAMP_NTZ has no zone-free epoch; cast it explicitly first)")

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The transform as a Spark Column over the source — what commit-time
    * stats collection aggregates (value-identical to [[literal]]).
    */
  /** floorDiv of epoch micros as a SQL fragment (pmod first: `div`
    * truncates toward zero, wrong pre-1970).
    */
  private def floorDivSql(c: String, unit: Long): String =
    s"(unix_micros($c) - pmod(unix_micros($c), ${unit}L)) div ${unit}L"

  /** Epoch-DAY ordinal of the source as a SQL fragment (zone-free). */
  private def epochDaySql(c: String, srcType: DataType): String =
    if (srcType == TimestampType) floorDivSql(c, MicrosPerDay)
    else s"datediff($c, DATE'1970-01-01')"

  /** The UTC day as a DATE value, for calendar (month/year) transforms
    * — `date_from_unix_date`/`year`/`month` are zone-free on DATE, and
    * Spark 3+'s proleptic Gregorian matches `java.time.LocalDate`.
    */
  private def utcDateSql(c: String, srcType: DataType): String =
    s"date_from_unix_date(CAST(${epochDaySql(c, srcType)} AS INT))"

  def column(spec: Spec, srcType: DataType): Column = spec match {
    case Identity(c) => col(c)
    case Days(c) if srcType == TimestampType => expr(floorDivSql(c, MicrosPerDay))
    case Days(c) => datediff(col(c), to_date(lit("1970-01-01"))).cast("long")
    case Hours(c) => expr(floorDivSql(c, MicrosPerHour))
    case Months(c) =>
      val d = utcDateSql(c, srcType)
      expr(s"CAST((year($d) - 1970) * 12 + month($d) - 1 AS BIGINT)")
    case Years(c) => expr(s"CAST(year(${utcDateSql(c, srcType)}) - 1970 AS BIGINT)")
    case Bucket(n, c) => pmod(xxhash64(col(c)), lit(n.toLong))
    case Truncate(w, c) if srcType == StringType => substring(col(c), 1, w)
    case Truncate(w, c) =>
      expr(s"CAST($c AS BIGINT) - pmod(CAST($c AS BIGINT), ${w}L)")
  }

  /** The transform over one CATALYST literal value of the source type
    * (timestamps are epoch micros, dates day ordinals, strings
    * UTF8String) — what planning-time constraint derivation applies to
    * predicate bounds. Defined value-identical to [[column]].
    */
  /** Catalyst temporal literal → epoch-day ordinal (timestamps are
    * epoch micros, dates day-ordinal ints).
    */
  private def epochDay(v: Any, srcType: DataType): Long =
    if (srcType == TimestampType) Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay)
    else v.asInstanceOf[Int].toLong

  def literal(spec: Spec, v: Any, srcType: DataType): Any = spec match {
    case Identity(_) => v
    case Days(_) => epochDay(v, srcType)
    case Hours(_) => Math.floorDiv(v.asInstanceOf[Long], MicrosPerHour)
    case Months(_) =>
      val d = java.time.LocalDate.ofEpochDay(epochDay(v, srcType))
      (d.getYear - 1970).toLong * 12 + d.getMonthValue - 1
    case Years(_) =>
      (java.time.LocalDate.ofEpochDay(epochDay(v, srcType)).getYear - 1970).toLong
    case Bucket(n, _) =>
      val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(v, srcType)))
        .eval(null).asInstanceOf[Long]
      Math.floorMod(h, n.toLong)
    case Truncate(w, _) if srcType == StringType =>
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].substring(0, w)
    case Truncate(w, _) =>
      val lv = v match {
        case b: Byte => b.toLong; case s: Short => s.toLong
        case i: Int => i.toLong; case l: Long => l
      }
      lv - Math.floorMod(lv, w.toLong)
  }

  /** Is the transform monotone non-decreasing w.r.t. the source
    * ordering (so RANGE predicates derive)? Bucket is hash-scrambled:
    * equality/IN only.
    */
  def monotone(spec: Spec): Boolean = spec match {
    case Bucket(_, _) => false
    case _ => true
  }
}
