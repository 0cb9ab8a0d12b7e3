package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
// VecDot/PolyHash ship real generated code (per-element loops inside a
// fused stage); WordNgrams is CodegenFallback on purpose — its eval is
// already one JVM call per row building an array, where codegen buys
// nothing but Janino compile time.
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot per-row kernels.
  *
  * The portable semantics of these kernels are defined by the
  * higher-order-function folds in TextKit/VectorKit (strict left folds,
  * doubles, index order) — but HOF lambdas evaluate interpreted, one
  * function call per element. These expressions compute the IDENTICAL
  * result (bit-for-bit: same operation order, same IEEE ops) as a
  * whole-stage-codegen'd JIT loop, which is what a 64-element dot
  * product inside a 2M-pair join needs at 100 TB.
  *
  * Registered through SparkSessionExtensions (Engine.session), the
  * documented public extension point — no private Spark APIs.
  */
object GraftFunctions {

  def register(ext: SparkSessionExtensions): Unit = {
    // planning-time file skipping over manifest-tracked tables — see
    // graft.plans.ManifestSkipping (conf-gated, fall-back-safe)
    ext.injectOptimizerRule(graft.plans.ManifestSkipping.apply)
    // merge-on-read delete application for DSv2 catalog reads — see
    // graft.plans.MorApplyRewrite (tables without pending tombstones
    // never match; the V2 scan fast path is untouched)
    ext.injectResolutionRule(graft.plans.MorApplyRewrite.apply)
    // SQL views over catalog tables (DSv2 ViewCatalog) — OSS Spark
    // ships the API without analyzer support, so the engine wires it:
    // view DDL rewrites at parse time, view reads expand at resolution
    // (see graft.plans.GraftViews)
    ext.injectParser((s, delegate) => new graft.plans.GraftSqlParser(s, delegate))
    ext.injectResolutionRule(graft.plans.ResolveGraftViews.apply)
    // the sort-merge AS-OF JOIN physical operator — see graft.plans.AsofJoin
    ext.injectPlannerStrategy(graft.plans.AsofJoinStrategy.apply)
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_l2sub"),
      new ExpressionInfo(classOf[VecL2Sub].getName, "graft_vec_l2sub"),
      (children: Seq[Expression]) => {
        def litInt(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_vec_l2sub $what must be an int literal, got $other")
        }
        VecL2Sub(children(0), children(1),
          litInt(children(2), "off"), litInt(children(3), "len"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_term_tf"),
      new ExpressionInfo(classOf[TermTf].getName, "graft_term_tf"),
      (children: Seq[Expression]) => TermTf(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (children: Seq[Expression]) => WordNgrams(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_ext_json_decode"),
      new ExpressionInfo(classOf[ExtJsonDecode].getName, "graft_ext_json_decode"),
      (children: Seq[Expression]) => ExtJsonDecode(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_ext_json_encode"),
      new ExpressionInfo(classOf[ExtJsonEncode].getName, "graft_ext_json_encode"),
      (children: Seq[Expression]) => ExtJsonEncode(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_marker_count"),
      new ExpressionInfo(classOf[MarkerCount].getName, "graft_marker_count"),
      (children: Seq[Expression]) => MarkerCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSig(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashSig(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_unscaled"),
      new ExpressionInfo(classOf[UnscaledLong].getName, "graft_unscaled"),
      (children: Seq[Expression]) => UnscaledLong(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dsum128"),
      new ExpressionInfo(classOf[DecimalSum128].getName, "graft_dsum128"),
      (children: Seq[Expression]) => DecimalSum128(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_uninorm"),
      new ExpressionInfo(classOf[UniNorm].getName, "graft_uninorm"),
      (children: Seq[Expression]) => UniNorm(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, "graft_rep_stats"),
      (children: Seq[Expression]) => RepStats(children.head)))
    // Spark's own runtime-filter bloom kernels (spark-catalyst, public
    // classes), surfaced as callable functions so ScaleJoins can build
    // an EXPLICIT bloom-pruned semi join: the aggregate builds the
    // filter distributed (partial blooms merged, never a driver
    // collect), and might_contain probes it from a scalar subquery.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[aggregate.BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new aggregate.BloomFilterAggregate(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[BloomFilterMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), children(1))))
  }
}

/** Per-row word-bigram repetition stats in ONE pass:
  * `struct(n_bigrams, n_distinct_bigrams, top_bigram_n)`, or null when
  * the doc has fewer than 2 tokens (the explode+groupBy form yields no
  * row there; callers filter nulls). Value-identical to exploding
  * `graft_word_ngrams(text, 2, false)` and counting (equivalence
  * spec) — same WordNgrams tokenization (split on every single space,
  * empties kept) — but with no explode and no shuffle: the Gopher
  * repetition signals become a narrow map-only pass, which is the
  * shape a 100 TB quality-filter sweep needs. CodegenFallback like
  * WordNgrams: one JVM call per row building a small hash map; codegen
  * would buy only Janino compile time.
  */
case class RepStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_rep_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_rep_stats expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // split on every single space, keeping empty segments (limit=-1) —
    // the WordNgrams tokenization, verbatim
    val tokens = new java.util.ArrayList[String]()
    var start = 0
    var idx = s.indexOf(' ')
    while (idx >= 0) {
      tokens.add(s.substring(start, idx))
      start = idx + 1
      idx = s.indexOf(' ', start)
    }
    tokens.add(s.substring(start))
    val m = tokens.size - 1
    if (m <= 0) return null
    val counts = new java.util.HashMap[String, Long](m * 2)
    var top = 0L
    var i = 0
    while (i < m) {
      val bg = tokens.get(i) + " " + tokens.get(i + 1)
      val c = counts.getOrDefault(bg, 0L) + 1L
      counts.put(bg, c)
      if (c > top) top = c
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(m.toLong, counts.size.toLong, top)
  }

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** Unicode normalization (`java.text.Normalizer`) as a codegen'd
  * expression: `graft_uninorm(s, 'NFC'|'NFD'|'NFKC'|'NFKD')`. Spark has
  * no builtin Unicode normalizer while the curation contract (and the
  * DuckDB oracle's `nfc_normalize`) needs one — canonicalizing crawl
  * text before hashing/dedup so that composed and decomposed encodings
  * of the same visible string land in the same dedup bucket.
  *
  * The form is a compile-time literal (validated in
  * checkInputDataTypes), so codegen embeds the resolved enum constant
  * directly — one library call per row inside the fused stage, no
  * per-row dispatch. Narrow map-only kernel: safe at any scale.
  */
case class UniNorm(child: Expression, formExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = formExpr
  override def prettyName: String = "graft_uninorm"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType || formExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_uninorm expects (string, string form literal), got (${child.dataType}, ${formExpr.dataType})")
    else if (!formExpr.foldable || formExpr.eval(null) == null)
      TypeCheckResult.TypeCheckFailure("graft_uninorm: form must be a non-null string literal")
    else
      try {
        java.text.Normalizer.Form.valueOf(formExpr.eval(null).toString)
        TypeCheckResult.TypeCheckSuccess
      } catch {
        case _: IllegalArgumentException =>
          TypeCheckResult.TypeCheckFailure(
            s"graft_uninorm: unknown form '${formExpr.eval(null)}' (want NFC|NFD|NFKC|NFKD)")
      }

  private lazy val form: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(formExpr.eval(null).toString)

  override def nullSafeEval(input: Any, formAny: Any): Any =
    UTF8String.fromString(
      java.text.Normalizer.normalize(input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = form.name()
    nullSafeCodeGen(ctx, ev, (c, _) => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.$formName));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): UniNorm =
    copy(child = newLeft, formExpr = newRight)
}

/** Space-joined word n-grams of a single-space-tokenized text, built in
  * one pass per row. Value-identical to the composed form
  * `array_distinct(transform(arrays_zip(slice(split(text, ' '), ...)),
  * z -> concat_ws(' ', ...)))` (dedup=true keeps first occurrence, like
  * array_distinct; dedup=false keeps multiplicity) — but evaluated as
  * one JVM method per row instead of one expression-tree walk per
  * element. Fewer than n tokens => empty array (matching the oracle's
  * `range` form). Tokenization contract: split on every single space,
  * trailing empties kept (Spark split limit=-1 semantics).
  */
/** Per-document term frequencies computed INSIDE the row:
  * `graft_term_tf(tokens)` folds an `array<string>` of tokens into
  * `array<struct<term string, tf bigint>>` (first-occurrence order,
  * one entry per distinct token). An inverted-index tf pass built as
  * `explode(tokens)` + `groupBy(doc, term)` shuffles one row per TOKEN
  * and aggregates a near-unique key (one group per posting — the
  * partial agg reduces nothing and its map state is the whole corpus);
  * tf is a per-document property, so this kernel keeps the whole pass
  * map-side and the first shuffle downstream starts at POSTING
  * granularity with tf already attached. CodegenFallback like
  * WordNgrams: one JVM call per row building a small map — codegen
  * would buy Janino time, not throughput.
  */
case class TermTf(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_term_tf"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_term_tf expects array<string>, got $other")
  }

  override def nullSafeEval(tokensAny: Any): Any = {
    val arr = tokensAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // copy: the UTF8String may alias a reused input buffer, and
        // both the map keys and the returned array outlive this slot
        val t = arr.getUTF8String(i).copy()
        counts.put(t, counts.getOrDefault(t, 0L) + 1L)
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TermTf =
    copy(child = newChild)
}

case class WordNgrams(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "graft_word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val n: Int = second.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"n must be an integer literal, got $other")
  }
  private lazy val dedup: Boolean = third.eval(null).asInstanceOf[Boolean]

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(first.dataType == StringType && second.foldable && third.foldable &&
      (second.dataType == IntegerType || second.dataType == LongType) && third.dataType == BooleanType))
      TypeCheckResult.TypeCheckFailure(
        "graft_word_ngrams expects (string, int literal, boolean literal)")
    else if (second.eval(null) == null || third.eval(null) == null)
      TypeCheckResult.TypeCheckFailure("graft_word_ngrams: n and dedup must be non-null literals")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"graft_word_ngrams: n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(text: Any, nAny: Any, dedupAny: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    // split on every single space, keeping empty segments (limit=-1)
    val tokens = new java.util.ArrayList[String]()
    var start = 0
    var idx = s.indexOf(' ')
    while (idx >= 0) {
      tokens.add(s.substring(start, idx))
      start = idx + 1
      idx = s.indexOf(' ', start)
    }
    tokens.add(s.substring(start))
    // hot kernel: one container, chosen by the compile-time dedup flag;
    // first-occurrence order for LinkedHashSet matches array_distinct
    val m = math.max(tokens.size - n + 1, 0)
    val sink: java.util.Collection[String] =
      if (dedup) new java.util.LinkedHashSet[String](m * 2) else new java.util.ArrayList[String](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(tokens.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(tokens.get(i + j)); j += 1 }
      sink.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](sink.size)
    val it = sink.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WordNgrams =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Double dot product over two numeric arrays (float or double
  * elements), accumulated left-to-right: bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), 0.0D, (acc, v) -> acc + v)` INCLUDING the length-mismatch
  * case: zip_with null-pads the shorter side, which nulls the fold — so
  * unequal lengths return null here too (a truncated embedding yields a
  * detectable null, never a silently-partial dot product).
  * Null/NaN contract: null array -> null; null elements unsupported
  * (embedding columns are dense).
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_vec_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      val lf = elemIsFloat(left)
      val rf = elemIsFloat(right)
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("vdN")
    val s = ctx.freshName("vdS")
    val i = ctx.freshName("vdI")
    val getL = if (elemIsFloat(left)) (v: String) => s"(double) $v.getFloat($i)" else (v: String) => s"$v.getDouble($i)"
    val getR = if (elemIsFloat(right)) (v: String) => s"(double) $v.getFloat($i)" else (v: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${getL(a)} * ${getR(b)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Karp–Rabin polynomial rolling hash mod 2^31-1, base 31, over UTF-16
  * code units: bit-identical to TextKit.polySpark's fold (and the DuckDB
  * oracle's) for BMP text — the corpus contract is ASCII/BMP.
  */
case class PolyHash(child: Expression)
  extends UnaryExpression {

  override def prettyName: String = "graft_poly_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_poly_hash expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i).toLong) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("phS")
    val h = ctx.freshName("phH")
    val i = ctx.freshName("phI")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + (long) $s.charAt($i)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Count of array elements equal to any of a fixed marker set — the
  * codegen'd form of `size(filter(tok, t -> t = 'm1' OR ...))` used by
  * the language-ID and quality kernels (TextKit.markerCountSpark).
  * The HOF form evaluates its lambda INTERPRETED per element (ArrayFilter
  * is CodegenFallback), which is the dominant cost of a lang-ID pass at
  * corpus scale; this is one hash-probe per token inside the fused
  * stage. Identical semantics: multiplicity counted, null elements not
  * counted (the lambda's `t = 'm'` is null on null t, and filter drops
  * null-predicate elements).
  */
case class MarkerCount(child: Expression, markersExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = markersExpr
  override def prettyName: String = "graft_marker_count"
  override def dataType: DataType = LongType

  private lazy val markers: java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    markersExpr.eval(null).asInstanceOf[UTF8String].toString
      .split(',').foreach(m => set.add(UTF8String.fromString(m)))
    set
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if markersExpr.foldable && markersExpr.dataType == StringType =>
      markersExpr.eval(null) match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: markers literal must be non-null")
        case m =>
          // the csv carrier can't represent empty markers or markers
          // containing the delimiter — an empty segment ("a,,b" or a
          // leading/trailing comma) means the caller's marker set was
          // silently mangled upstream; fail analysis instead of counting
          // against a different set than asked for
          val spec = m.asInstanceOf[UTF8String].toString
          if (spec.isEmpty || spec.split(",", -1).exists(_.isEmpty))
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName: empty marker in spec '$spec' — markers must be non-empty and comma-free")
          else TypeCheckResult.TypeCheckSuccess
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, string-literal csv)")
  }

  /** Called from both eval and generated code. */
  def count(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && markers.contains(arr.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any = count(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerCount", this, classOf[MarkerCount].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.count($a);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MarkerCount =
    copy(child = l, markersExpr = r)
}

/** All MinHash permutation minima of a shingle array in ONE pass per
  * row: `m_i = min over shingles s of (a_i * polyhash(s) + b_i) mod P`
  * for the engine's fixed 16 permutations. Value-identical to the
  * composed form `explode(sh) -> x = graft_poly_hash(s) -> groupBy
  * min((a_i*x+b_i) % P)` — min is order-independent and the integer
  * math is the same — but computed as a scalar kernel, so signature
  * construction needs NO explode and NO shuffle: at corpus scale that
  * removes a docs x shingles row blow-up through the exchange.
  * Empty shingle arrays return null, matching the composed form where
  * explode produces no rows for the doc. NULL-ELEMENT caveat: the
  * kernel skips null shingles, so an ALL-null array also returns null
  * (and is filtered out downstream), whereas the composed form keeps
  * such a doc as a row of null m-columns — the engine's shingle
  * generators never emit null elements (containsNull=false paths), so
  * the divergence is unreachable in the catalog; it is only observable
  * if a caller hands the kernel a hand-built array with nulls.
  */
case class MinHashSig(child: Expression, permsExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = permsExpr
  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private final val P = 2147483647L

  /** perms as "a0:b0,a1:b1,..." — a foldable literal, like the other
    * kernels' spec strings, so engine and oracle share one source of
    * truth for the constants.
    */
  private lazy val perms: Array[(Long, Long)] =
    permsExpr.eval(null).asInstanceOf[UTF8String].toString
      .split(',').map { p =>
        val Array(a, b) = p.split(':')
        (a.toLong, b.toLong)
      }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if permsExpr.foldable && permsExpr.dataType == StringType &&
      scala.util.Try(perms.nonEmpty).getOrElse(false) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, 'a:b,...' literal)")
  }

  /** Called from both eval and generated code. Null when no usable
    * element (explode-of-empty semantics).
    */
  def sig(arr: ArrayData): ArrayData = {
    val k = perms.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val s = arr.getUTF8String(i).toString
        var h = 0L
        var c = 0
        while (c < s.length) { h = (h * 31L + s.charAt(c).toLong) % P; c += 1 }
        var j = 0
        while (j < k) {
          val v = (perms(j)._1 * h + perms(j)._2) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(mins.map(Long.box))
  }

  override def nullSafeEval(a: Any, b: Any): Any = sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"""
         |${ev.value} = $ref.sig($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(child = l, permsExpr = r)
}

/** SimHash signature of a feature array in ONE pass per row: per
  * feature `h = polyhash(w)`; per bit j of 31, a +-1 vote on whether
  * bit j of h is set; signature = the bits with positive vote sums.
  * Value-identical to the composed `explode -> groupBy 31 conditional
  * sums -> sign` form (integer sums are order-independent), with no
  * explode and no shuffle. Empty/all-null arrays return null
  * (explode-of-empty semantics). NULL-ELEMENT caveat: the kernel SKIPS
  * a null feature, while the composed form's CASE scores it as a -1
  * vote on every bit (a null condition falls through to ELSE) — the
  * engine's tokenizers never emit null elements, so the two agree on
  * every reachable input; the equivalence spec pins the non-null domain.
  */
case class SimHashSig(child: Expression)
  extends UnaryExpression {

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private final val P = 2147483647L
  private final val Bits = 31

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got $dt")
  }

  /** Called from both eval and generated code; MinValue = null marker. */
  def sig(arr: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val s = arr.getUTF8String(i).toString
        var h = 0L
        var c = 0
        while (c < s.length) { h = (h * 31L + s.charAt(c).toLong) % P; c += 1 }
        var j = 0
        while (j < Bits) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (!any) return Long.MinValue
    var out = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val v = sig(a.asInstanceOf[ArrayData])
    if (v == Long.MinValue) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashSig", this, classOf[SimHashSig].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $ref.sig($a);
         |if (${ev.value} == Long.MIN_VALUE) { ${ev.isNull} = true; ${ev.value} = 0L; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Subspace squared-L2 distance over the 1-based element window
  * `[off+1, off+len]` of two dense float/double arrays — the inner
  * kernel of product-quantization encode/serve
  * ([[graft.api.VectorSearch.pqEncode]]): m × k of these per row is
  * the hot loop of a corpus-wide encode sweep, so it runs as a
  * codegen'd JIT loop instead of an interpreted HOF fold. Value
  * contract is IDENTICAL to VectorKit.l2SubSparkHof (equivalence
  * spec): widen each element to double, subtract, square with the
  * same IEEE ops, accumulate in index order.
  *
  * `off`/`len` must be foldable int literals (the builder enforces
  * it): a subspace geometry is a plan-time constant, and baking it
  * into the generated code keeps the loop branch-free. A window
  * extending past either array yields null (the dense-embedding
  * contract makes that a data error worth surfacing, not padding).
  */
case class VecL2Sub(left: Expression, right: Expression, off: Int, len: Int)
  extends BinaryExpression {

  override def prettyName: String = "graft_vec_l2sub"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!(ok(left.dataType) && ok(right.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"graft_vec_l2sub expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    else if (off < 0 || len < 0)
      TypeCheckResult.TypeCheckFailure(s"graft_vec_l2sub window must be non-negative: off=$off len=$len")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (off + len > x.numElements() || off + len > y.numElements()) null
    else {
      val lf = elemIsFloat(left)
      val rf = elemIsFloat(right)
      var s = 0.0
      var i = off
      val end = off + len
      while (i < end) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        val d = xv - yv
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("l2S")
    val i = ctx.freshName("l2I")
    val d = ctx.freshName("l2D")
    val getL = if (elemIsFloat(left)) (v: String) => s"(double) $v.getFloat($i)" else (v: String) => s"$v.getDouble($i)"
    val getR = if (elemIsFloat(right)) (v: String) => s"(double) $v.getFloat($i)" else (v: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if (${off + len} > $a.numElements() || ${off + len} > $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = $off; $i < ${off + len}; $i++) {
         |    double $d = ${getL(a)} - ${getR(b)};
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecL2Sub =
    copy(left = newLeft, right = newRight)
}
