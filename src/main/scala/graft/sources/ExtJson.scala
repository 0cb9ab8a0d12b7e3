package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BSON Extended-JSON normalization.
  *
  * The reference round-trips records through MongoDB Extended JSON
  * (bson.json_util decode/encode at
  * /root/reference/parallelized_data_pipeline_dag.py:7,107,116,127,149):
  * `{"$oid": hex}` -> ObjectId, `{"$date": epochMillis}` -> datetime,
  * `{"$numberDecimal": "str"}` -> Decimal128. Here the decode is a
  * plan-time `from_json` with an explicit schema plus collapse
  * expressions — schema explosion from permissive inference is avoided
  * by declaring field kinds up front, and the whole normalization stays
  * inside whole-stage codegen (no UDFs, no Python round-trip).
  */
object ExtJson {

  sealed trait Kind { def wrapped: DataType }
  case object Oid extends Kind { val wrapped: DataType = StructType(Seq(StructField("$oid", StringType))) }
  case object Date extends Kind { val wrapped: DataType = StructType(Seq(StructField("$date", LongType))) }
  case object Dec extends Kind { val wrapped: DataType = StructType(Seq(StructField("$numberDecimal", StringType))) }
  case object Plain extends Kind { val wrapped: DataType = StringType }

  /** Schema for an extended-JSON document with the given field kinds. */
  def schema(fields: Seq[(String, Kind)]): StructType =
    StructType(fields.map { case (n, k) => StructField(n, k.wrapped) })

  private def kindTag(k: Kind): String = k match {
    case Oid => "oid"; case Date => "date"; case Dec => "dec"; case Plain => "plain"
  }

  /** Spec literal for the native kernels ("name:kind,..."). Names with
    * the spec's own separators can't be encoded in it — callers fall
    * back to the from_json path for those (never seen in BSON exports,
    * but correctness must not depend on that).
    */
  private def specFor(fields: Seq[(String, Kind)]): Option[Column] =
    if (fields.exists { case (n, _) => n.contains(':') || n.contains(',') }) None
    else Some(lit(fields.map { case (n, k) => s"$n:${kindTag(k)}" }.mkString(",")))

  /** Parse an ext-JSON string column and collapse each wrapper struct to
    * its scalar: $oid -> lowercase hex string, $date -> TimestampType
    * (epoch millis), $numberDecimal -> DoubleType via exact string parse.
    *
    * Fast path: one codegen'd pass per row (graft.functions.ExtJsonDecode)
    * producing the final scalars — Spark's `from_json` is CodegenFallback
    * (interpreted walk + Jackson per row) and is kept only as the
    * fallback for field names the spec literal can't carry.
    *
    * Known, documented divergences — all on inputs already outside the
    * ext-JSON export format, where the kernel's per-field behavior is
    * the contract (PropertySpecs fuzzes the in-format domain to zero
    * divergence):
    *   - MISTYPED fields (well-formed JSON with, e.g., a number where a
    *     $oid struct was declared): the kernel nulls only that field;
    *     PERMISSIVE `from_json` nulls every declared field of the row.
    *   - NON-STRING values under a Plain field: the kernel preserves the
    *     raw source text (token or nested-JSON substring, whitespace and
    *     all); Jackson re-renders (numbers as double text: -1.5e2 ->
    *     "-150.0"; nested JSON re-serialized compact) and rejects
    *     lexical forms like leading-zero numbers outright (row null).
    *   - $date millis whose micros form overflows a long: the kernel
    *     nulls the field (total); the fallback's timestamp_millis THROWS
    *     at run time.
    * Null VALUES (a present field holding JSON null) and trailing
    * garbage after the document (both paths accept it) decode
    * identically on both paths.
    */
  def normalize(js: Column, fields: Seq[(String, Kind)]): Seq[Column] =
    specFor(fields) match {
      case Some(spec) =>
        val parsed = call_function("graft_ext_json_decode", js, spec)
        fields.map { case (n, _) => parsed.getField(n).as(n) }
      case None => normalizeFallback(js, fields)
    }

  /** The from_json decode path — the fallback `normalize` takes for
    * field names the kernel spec literal can't carry. Package-visible so
    * the equivalence property can drive BOTH paths over one input.
    */
  private[graft] def normalizeFallback(js: Column, fields: Seq[(String, Kind)]): Seq[Column] = {
    val parsed = from_json(js, schema(fields))
    fields.map {
      case (n, Oid)   => lower(parsed.getField(n).getField("$oid")).as(n)
      case (n, Date)  => timestamp_millis(parsed.getField(n).getField("$date")).as(n)
      case (n, Dec)   => parsed.getField(n).getField("$numberDecimal").cast(DoubleType).as(n)
      case (n, Plain) => parsed.getField(n).cast(StringType).as(n)
    }
  }

  /** DataFrame-level normalize: decode ONCE into an intermediate struct
    * column, then extract fields from it in a second projection.
    * Catalyst keeps the two projections separate (the decode is
    * non-cheap and multiply-referenced, so CollapseProject leaves it),
    * making this a guaranteed single parse per row.
    */
  def normalizeDF(df: org.apache.spark.sql.DataFrame, js: Column, fields: Seq[(String, Kind)], keep: Seq[String]): org.apache.spark.sql.DataFrame = {
    // intermediate name chosen to never collide with an input column;
    // fields extracted with getField (not dotted paths), so field names
    // containing '.' or backticks resolve correctly
    val tmp = Iterator.from(0).map(i => s"__extjson$i").find(n => !df.columns.contains(n)).get
    val decoded = specFor(fields) match {
      case Some(spec) => call_function("graft_ext_json_decode", js, spec)
      case None => from_json(js, schema(fields))
    }
    val parsed = df.select(keep.map(col) :+ decoded.as(tmp): _*)
    val p = col(tmp)
    val extracted = specFor(fields) match {
      case Some(_) => fields.map { case (n, _) => p.getField(n).as(n) }
      case None => fields.map {
        case (n, Oid)   => lower(p.getField(n).getField("$oid")).as(n)
        case (n, Date)  => timestamp_millis(p.getField(n).getField("$date")).as(n)
        case (n, Dec)   => p.getField(n).getField("$numberDecimal").cast(DoubleType).as(n)
        case (n, Plain) => p.getField(n).cast(StringType).as(n)
      }
    }
    parsed.select(keep.map(col) ++ extracted: _*)
  }

  /** Encode canonical columns back to an ext-JSON document string (the
    * put_json_file twin, parallelized_data_pipeline_dag.py:113-119).
    * Deterministic field order = argument order. One codegen'd pass per
    * row (graft.functions.ExtJsonEncode) with proper JSON escaping
    * (quotes, backslashes, control chars) — hand-concatenation with ||
    * would silently corrupt such values into nulls on re-parse. Falls
    * back to to_json for field names the spec literal can't carry.
    */
  def encode(fields: Seq[(String, Column, Kind)]): Column = {
    specFor(fields.map { case (n, _, k) => (n, k) }) match {
      case Some(spec) =>
        val values = fields.map {
          case (_, c, Oid)   => c.cast(StringType)
          // cast accepts NTZ sources; under the engine's fixed UTC session
          // zone the NTZ->instant interpretation is the BSON $date (UTC) one.
          case (_, c, Date)  => c.cast(TimestampType)
          case (_, c, Dec)   => c.cast(StringType)
          case (_, c, Plain) => c.cast(StringType)
        }
        call_function("graft_ext_json_encode", spec +: values: _*)
      case None =>
        // null wrapper values: the isNotNull guard nulls the whole struct
        // so to_json (ignoreNullFields) omits the FIELD — matching the
        // kernel's null-slot behavior. A bare struct(null.as("$oid"))
        // would instead emit `"name":{}` (only the inner key dropped).
        val parts: Seq[Column] = fields.map {
          case (n, c, Oid) =>
            val s = c.cast(StringType)
            when(s.isNotNull, struct(s.as("$oid"))).as(n)
          case (n, c, Date) =>
            val t = c.cast(TimestampType)
            when(t.isNotNull, struct(unix_millis(t).as("$date"))).as(n)
          case (n, c, Dec) =>
            val s = c.cast(StringType)
            when(s.isNotNull, struct(s.as("$numberDecimal"))).as(n)
          case (n, c, Plain) => c.cast(StringType).as(n)
        }
        to_json(struct(parts: _*))
    }
  }
}
