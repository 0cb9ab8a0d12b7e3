package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** `zorder(c1, ..., cn)` as a catalog [[ScalarFunction]] — the Morton
  * interleaving [[graft.operators.Layout.zValueSqlN]] computes in SQL
  * text, exposed through the DSv2 FunctionCatalog so a WRITE can
  * declare it in `RequiresDistributionAndOrdering` (Spark resolves the
  * `Expressions.apply("zorder", ...)` sort key against the table's own
  * catalog — the same mechanism Iceberg uses for its truncate/bucket
  * sort keys). Bit i of column j lands at position i·n + j, bits = 62/n
  * per column.
  *
  * Each dimension maps to an integral surrogate in [0, 2^bits) through
  * a WEAKLY-MONOTONE per-type coarsening — the only property layout
  * tiling needs (collisions inside a slice are harmless; ORDER
  * inversions are what scatter bounding boxes):
  *
  *  - integrals: saturating clamp into [0, 2^bits) — negatives collide
  *    at the origin slice, beyond-range values at the top slice; same
  *    form as the SQL kernel, so ingest-time and `CALL zorder`
  *    clustering agree on integral keys;
  *  - date: the stored epoch-day count, clamped like an integral;
  *  - timestamp (both tz and ntz): MINUTES since epoch, clamped —
  *    minute grain fits 2^31 until year ~6000 while keeping multi-year
  *    corpora fully resolved (epoch-micros' top bits barely move
  *    within a decade, so a prefix of the raw value would tile
  *    nothing);
  *  - string: the first 8 bytes big-endian as an unsigned value, top
  *    `bits` bits — monotone in binary (UTF-8 byte) order, the same
  *    order envelope min/max prune by;
  *  - float/double: the IEEE-754 total-order bit trick (sign-flipped
  *    raw bits), top `bits` bits — monotone across the whole double
  *    line including negatives.
  *
  * Used only as a write-side shuffle/sort key: the value never decides
  * a query result, so the interpreted `produceResult` path (one call
  * per written row) is the whole cost, paid where the range exchange
  * already shuffles the data.
  */
object ZOrderFunction extends UnboundFunction {
  override def name(): String = "zorder"
  override def description(): String =
    "zorder(c1, ..., cn): Morton-interleaved clustering value over >= 2 columns " +
      "(integral, date, timestamp, string, float/double)"

  /** Types a z-order dimension can derive a monotone integral
    * surrogate for — shared with the write path's eager validation
    * ([[GraftWrites]]), so a declared-but-impossible layout refuses at
    * the first INSERT with the full explanation rather than at bind.
    */
  private[sources] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => true
    case TimestampType | TimestampNTZType => true
    case StringType | FloatType | DoubleType => true
    case _ => false
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"zorder needs at least 2 columns, got ${inputType.fields.length}")
    inputType.fields.foreach(f => require(supported(f.dataType),
      s"zorder: column ${f.name} is ${f.dataType.catalogString}; no monotone " +
        "integral surrogate exists for this type — derive one in the schema " +
        "(cast, hash, prefix) and track that"))
    new Bound(inputType)
  }

  private final class Bound(in: StructType) extends ScalarFunction[java.lang.Long] {
    private val n = in.fields.length
    private val bits = 62 / n
    private val mask = (1L << bits) - 1
    private val types = in.fields.map(_.dataType)
    override def inputTypes(): Array[DataType] = types
    override def resultType(): DataType = LongType
    override def name(): String = "zorder"
    override def canonicalName(): String = s"graft.zorder.$n"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = false

    /** Saturating clamp into [0, 2^bits) — the weakly-monotone
      * coarsening: raw low-bit extraction would put negatives
      * (two's-complement high low-bits) ABOVE all positives and wrap
      * values differing only beyond bit 62/n onto each other.
      */
    private def clamp(raw: Long): Long =
      if (raw < 0L) 0L else if (raw > mask) mask else raw

    /** The integral surrogate for dimension `j` — see the object
      * scaladoc for the per-type monotonicity argument.
      */
    private def dim(input: InternalRow, j: Int): Long = types(j) match {
      case LongType => clamp(input.getLong(j))
      case IntegerType => clamp(input.getInt(j).toLong)
      case ShortType => clamp(input.getShort(j).toLong)
      case ByteType => clamp(input.getByte(j).toLong)
      case DateType => clamp(input.getInt(j).toLong) // epoch days
      case TimestampType | TimestampNTZType =>
        clamp(input.getLong(j) / 60000000L) // epoch minutes (micros / 6e7)
      case StringType =>
        val b = input.getUTF8String(j).getBytes
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L); i += 1 }
        v >>> (64 - bits) // top bits of the big-endian prefix: binary order
      case DoubleType =>
        val raw = java.lang.Double.doubleToLongBits(input.getDouble(j))
        val ordered = if (raw < 0L) ~raw else raw ^ Long.MinValue
        ordered >>> (64 - bits) // IEEE-754 total order, top bits
      case FloatType =>
        val raw = java.lang.Float.floatToIntBits(input.getFloat(j))
        val ordered = if (raw < 0) ~raw else raw ^ Int.MinValue
        // 32-bit ordered value: widen to the same top-bits form
        ((ordered.toLong & 0xffffffffL) << 32) >>> (64 - bits)
      case dt => throw new IllegalStateException(s"unreachable: $dt passed bind()")
    }

    override def produceResult(input: InternalRow): java.lang.Long = {
      var z = 0L
      var j = 0
      while (j < n) {
        val v = if (input.isNullAt(j)) 0L else dim(input, j) // nulls at the origin
        var i = 0
        while (i < bits) { z |= ((v >> i) & 1L) << (i * n + j); i += 1 }
        j += 1
      }
      java.lang.Long.valueOf(z)
    }
  }
}
