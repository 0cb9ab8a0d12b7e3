package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for BSON Extended-JSON (the reference's
  * bson.json_util round-trip, /root/reference/parallelized_data_pipeline_dag.py:107-149).
  *
  * Spark's `from_json`/`to_json` are CodegenFallback: every row pays an
  * interpreted expression-tree walk plus a Jackson parser, which made the
  * ext-JSON round-trip query ~9x the oracle. These two expressions do the
  * same work as ONE hand-rolled pass per row inside whole-stage codegen:
  *
  *  - `graft_ext_json_decode(js, spec)` parses the flat ext-JSON document
  *    and returns the FINAL scalar struct directly ($oid -> lowercase hex
  *    string, $date -> timestamp, $numberDecimal -> double, plain ->
  *    string) — no separate collapse projection needed.
  *  - `graft_ext_json_encode(spec, v1, ..., vN)` writes the document
  *    string with proper JSON escaping (quotes, backslashes, control
  *    chars), matching Jackson's output for the supported field kinds.
  *
  * `spec` is a foldable string literal "name:kind,..." with kind one of
  * oid|date|dec|plain. Decode mirrors PERMISSIVE `from_json`: malformed
  * document -> null struct; missing/mistyped field -> null field. Encode
  * mirrors `to_json`'s default ignoreNullFields: null scalars are omitted.
  */
object ExtJsonSpec {
  final val Oid = 0
  final val Date = 1
  final val Dec = 2
  final val Plain = 3

  def parse(spec: String): (Array[String], Array[Int]) = {
    val parts = spec.split(',')
    val names = new Array[String](parts.length)
    val kinds = new Array[Int](parts.length)
    var i = 0
    while (i < parts.length) {
      val sep = parts(i).lastIndexOf(':')
      require(sep > 0, s"ext-json spec entry '${parts(i)}' must be name:kind")
      names(i) = parts(i).substring(0, sep)
      kinds(i) = parts(i).substring(sep + 1) match {
        case "oid" => Oid
        case "date" => Date
        case "dec" => Dec
        case "plain" => Plain
        case k => throw new IllegalArgumentException(s"unknown ext-json kind '$k'")
      }
      i += 1
    }
    (names, kinds)
  }

  def scalarType(kind: Int): DataType = kind match {
    case Oid | Plain => StringType
    case Date => TimestampType
    case Dec => DoubleType
  }

  /** Input type `graft_ext_json_encode` expects for each kind (casts are
    * applied by the ExtJson wrapper).
    */
  def encodeInputType(kind: Int): DataType = kind match {
    case Date => TimestampType
    case _ => StringType
  }

  private[functions] def foldableString(e: Expression): Option[String] =
    if (e.foldable && e.dataType == StringType) {
      Option(e.eval(null)).map(_.asInstanceOf[UTF8String].toString)
    } else None
}

case class ExtJsonDecode(js: Expression, spec: Expression)
  extends BinaryExpression {

  override def left: Expression = js
  override def right: Expression = spec
  override def prettyName: String = "graft_ext_json_decode"
  override def nullable: Boolean = true

  private lazy val (names, kinds) =
    ExtJsonSpec.parse(ExtJsonSpec.foldableString(spec).get)
  private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](names.length * 2)
    names.indices.foreach(i => m.put(names(i), i))
    m
  }

  override def dataType: DataType =
    StructType(names.zip(kinds).map { case (n, k) =>
      StructField(n, ExtJsonSpec.scalarType(k))
    })

  override def checkInputDataTypes(): TypeCheckResult =
    if (js.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string document, got ${js.dataType}")
    else if (ExtJsonSpec.foldableString(spec).isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName spec must be a non-null string literal")
    else try { val _ = names; TypeCheckResult.TypeCheckSuccess }
    catch { case e: IllegalArgumentException => TypeCheckResult.TypeCheckFailure(e.getMessage) }

  override def nullSafeEval(jsAny: Any, specAny: Any): Any =
    parseDoc(jsAny.asInstanceOf[UTF8String])

  /** One-pass recursive-descent parse of a flat ext-JSON object; public
    * because generated code calls it. Returns null for a malformed
    * document (PERMISSIVE semantics).
    */
  def parseDoc(u: UTF8String): InternalRow = {
    if (u == null) return null
    val s = u.toString
    val n = s.length
    var i = 0

    def ws(): Unit = {
      while (i < n && { val c = s.charAt(i); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1
    }
    def fail(): Nothing = throw ExtJsonDecode.Malformed
    def expect(c: Char): Unit = { if (i >= n || s.charAt(i) != c) fail(); i += 1 }

    // JSON string with standard escape handling; cursor on opening quote
    def parseString(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder()
      while (true) {
        if (i >= n) fail()
        val c = s.charAt(i)
        if (c == '"') { i += 1; return sb.toString }
        else if (c == '\\') {
          i += 1
          if (i >= n) fail()
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= n) fail()
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case _ => fail()
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      sb.toString // unreachable
    }

    // raw token text of a number/true/false/null
    def rawToken(): String = {
      val start = i
      while (i < n && { val c = s.charAt(i)
        c == '-' || c == '+' || c == '.' || c == 'e' || c == 'E' ||
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') }) i += 1
      if (i == start) fail()
      s.substring(start, i)
    }

    def skipValue(): Unit = {
      ws()
      if (i >= n) fail()
      s.charAt(i) match {
        case '"' => val _ = parseString()
        case '{' | '[' =>
          var depth = 0
          var inStr = false
          while (i < n) {
            val c = s.charAt(i)
            if (inStr) {
              if (c == '\\') i += 1
              else if (c == '"') inStr = false
            } else c match {
              case '"' => inStr = true
              case '{' | '[' => depth += 1
              case '}' | ']' =>
                depth -= 1
                if (depth == 0) { i += 1; return }
              case _ =>
            }
            i += 1
          }
          fail()
        case _ => val _ = rawToken()
      }
    }

    // wrapper object {"$key": <string|number>} -> inner value, else null
    def parseWrapped(wrapKey: String, wantString: Boolean): Any = {
      ws()
      if (i >= n || s.charAt(i) != '{') { skipValue(); return null }
      i += 1
      var result: Any = null
      ws()
      if (i < n && s.charAt(i) == '}') { i += 1; return null }
      var done = false
      while (!done) {
        ws()
        val key = parseString()
        ws(); expect(':'); ws()
        if (key == wrapKey) {
          if (wantString) {
            if (i < n && s.charAt(i) == '"') result = parseString() else skipValue()
          } else {
            if (i < n && s.charAt(i) != '"' && s.charAt(i) != '{' && s.charAt(i) != '[') result = rawToken()
            else skipValue()
          }
        } else skipValue()
        ws()
        if (i < n && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      result
    }

    def parseField(kind: Int): Any = kind match {
      case ExtJsonSpec.Oid =>
        parseWrapped("$oid", wantString = true) match {
          case str: String => UTF8String.fromString(str).toLowerCase
          case _ => null
        }
      case ExtJsonSpec.Date =>
        parseWrapped("$date", wantString = false) match {
          case tok: String =>
            // integer millis only, like from_json's LongType field.
            // multiplyExact: millis beyond the micros long range null out
            // instead of silently wrapping (timestamp_millis THROWS
            // there — total null-on-overflow is the kernel's contract)
            try java.lang.Long.valueOf(Math.multiplyExact(java.lang.Long.parseLong(tok), 1000L))
            catch { case _: NumberFormatException | _: ArithmeticException => null }
          case _ => null
        }
      case ExtJsonSpec.Dec =>
        parseWrapped("$numberDecimal", wantString = true) match {
          case str: String =>
            // string->double cast semantics: trim, parse, null on failure
            try java.lang.Double.valueOf(str.trim)
            catch { case _: NumberFormatException => null }
          case _ => null
        }
      case ExtJsonSpec.Plain =>
        ws()
        if (i < n && s.charAt(i) == '"') UTF8String.fromString(parseString())
        else if (i < n && (s.charAt(i) == '{' || s.charAt(i) == '[')) {
          // nested value under a string field: keep raw JSON text
          val start = i; skipValue(); UTF8String.fromString(s.substring(start, i))
        } else {
          val tok = rawToken()
          if (tok == "null") null else UTF8String.fromString(tok)
        }
    }

    try {
      ws()
      expect('{')
      val out = new Array[Any](names.length)
      ws()
      if (i < n && s.charAt(i) == '}') return new GenericInternalRow(out)
      var done = false
      while (!done) {
        ws()
        val key = parseString()
        ws(); expect(':')
        val idx = index.get(key)
        if (idx != null) out(idx.intValue()) = parseField(kinds(idx.intValue()))
        else skipValue()
        ws()
        if (i < n && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      new GenericInternalRow(out)
    } catch {
      case _: Exception => null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extJsonDecode", this, classOf[ExtJsonDecode].getName)
    val row = ctx.freshName("ejRow")
    nullSafeCodeGen(ctx, ev, (jsVal, _) =>
      s"""
         |InternalRow $row = $ref.parseDoc($jsVal);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ExtJsonDecode =
    copy(js = newLeft, spec = newRight)
}

object ExtJsonDecode {
  /** Pre-allocated control-flow signal: malformed input is the expected
    * failure path, so no per-row stack-trace fill.
    */
  private val Malformed: RuntimeException =
    new RuntimeException("malformed ext-json") with scala.util.control.NoStackTrace
}

case class ExtJsonEncode(children: Seq[Expression]) extends Expression {

  override def prettyName: String = "graft_ext_json_encode"
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = StringType

  private def spec: Expression = children.head
  private def vals: Seq[Expression] = children.tail
  private lazy val (names, kinds) =
    ExtJsonSpec.parse(ExtJsonSpec.foldableString(spec).get)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty || ExtJsonSpec.foldableString(spec).isEmpty)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName: first arg must be a spec string literal")
    val (ns, ks) =
      try (names, kinds)
      catch { case e: IllegalArgumentException => return TypeCheckResult.TypeCheckFailure(e.getMessage) }
    if (vals.length != ns.length)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: spec declares ${ns.length} fields but ${vals.length} values given")
    val bad = vals.zip(ks).collect {
      case (v, k) if v.dataType != ExtJsonSpec.encodeInputType(k) =>
        s"${v.dataType} where ${ExtJsonSpec.encodeInputType(k)} expected"
    }
    if (bad.nonEmpty) TypeCheckResult.TypeCheckFailure(s"$prettyName: ${bad.mkString("; ")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Jackson-compatible JSON string escaping: quote, backslash, the
    * short control escapes, \\u00XX (uppercase hex) for the rest below
    * 0x20; non-ASCII passes through (to_json default).
    */
  private def escapeInto(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04X") else sb.append(c)
      }
      i += 1
    }
  }

  /** Builds the document from already-evaluated scalars; public because
    * generated code calls it. Slots: UTF8String for oid/dec/plain, Long
    * micros for date. Null slots are omitted (to_json ignoreNullFields).
    */
  def encodeRow(slots: Array[AnyRef]): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var first = true
    var i = 0
    while (i < slots.length) {
      val v = slots(i)
      if (v != null) {
        if (!first) sb.append(',')
        first = false
        sb.append('"')
        escapeInto(names(i), sb)
        sb.append("\":")
        kinds(i) match {
          case ExtJsonSpec.Oid =>
            sb.append("{\"$oid\":\"")
            escapeInto(v.toString, sb)
            sb.append("\"}")
          case ExtJsonSpec.Date =>
            // unix_millis semantics: floor division of micros
            sb.append("{\"$date\":")
              .append(Math.floorDiv(v.asInstanceOf[java.lang.Long].longValue(), 1000L))
              .append('}')
          case ExtJsonSpec.Dec =>
            sb.append("{\"$numberDecimal\":\"")
            escapeInto(v.toString, sb)
            sb.append("\"}")
          case ExtJsonSpec.Plain =>
            sb.append('"')
            escapeInto(v.toString, sb)
            sb.append('"')
        }
      }
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  override def eval(input: InternalRow): Any = {
    val slots = new Array[AnyRef](vals.length)
    var i = 0
    while (i < vals.length) {
      slots(i) = vals(i).eval(input).asInstanceOf[AnyRef]
      i += 1
    }
    encodeRow(slots)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extJsonEncode", this, classOf[ExtJsonEncode].getName)
    val slots = ctx.freshName("ejSlots")
    val childCodes = vals.zipWithIndex.map { case (c, idx) =>
      val e = c.genCode(ctx)
      val boxed =
        if (CodeGenerator.isPrimitiveType(c.dataType))
          s"${CodeGenerator.boxedType(c.dataType)}.valueOf(${e.value})"
        else e.value
      code"""
        |${e.code}
        |$slots[$idx] = ${e.isNull} ? null : (Object) $boxed;
      """.stripMargin
    }
    val resultCode =
      code"""
        |Object[] $slots = new Object[${vals.length}];
        |${childCodes.foldLeft(code"")(_ + _)}
        |UTF8String ${ev.value} = $ref.encodeRow($slots);
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ExtJsonEncode =
    copy(children = newChildren)
}
