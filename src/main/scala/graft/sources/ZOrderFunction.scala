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
  * per column, identical to the SQL form, so a `CALL graft.system.zorder`
  * maintenance pass and a `write.distribution-mode = 'zorder'` ingest
  * cluster by the same value.
  *
  * Used only as a write-side shuffle/sort key: the value never decides
  * a query result, so the interpreted `produceResult` path (one call
  * per written row) is the whole cost, paid where the range exchange
  * already shuffles the data.
  */
object ZOrderFunction extends UnboundFunction {
  override def name(): String = "zorder"
  override def description(): String =
    "zorder(c1, ..., cn): Morton-interleaved clustering value over >= 2 integral columns"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"zorder needs at least 2 columns, got ${inputType.fields.length}")
    inputType.fields.foreach(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new UnsupportedOperationException(
        s"zorder: column ${f.name} is ${dt.catalogString}; z-ordering interleaves " +
          "integral bits — cast or derive an integral surrogate first")
    })
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
    override def produceResult(input: InternalRow): java.lang.Long = {
      var z = 0L
      var j = 0
      while (j < n) {
        val raw: Long =
          if (input.isNullAt(j)) 0L // nulls cluster together at the origin
          else types(j) match {
            case LongType => input.getLong(j)
            case IntegerType => input.getInt(j).toLong
            case ShortType => input.getShort(j).toLong
            case _ => input.getByte(j).toLong
          }
        // saturating clamp into [0, 2^bits) — same weakly-monotone
        // coarsening as [[graft.operators.Layout.zValueSqlN]]: raw
        // low-bit extraction would put negatives (two's-complement
        // high low-bits) ABOVE all positives and wrap values differing
        // only beyond bit 62/n onto each other, degrading the tiling
        // property for bigint keys with large or negative ranges
        val v = if (raw < 0L) 0L else if (raw > mask) mask else raw
        var i = 0
        while (i < bits) { z |= ((v >> i) & 1L) << (i * n + j); i += 1 }
        j += 1
      }
      java.lang.Long.valueOf(z)
    }
  }
}
