package graft

import graft.operators.{FieldMapping, MappingCompiler}
import graft.pipeline.VerifiedUpdates
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY §5.3): totality of the mapping compiler
  * over arbitrary configs, hash-range invariants, and the two algebraic
  * laws the pipeline correctness rests on — split-then-union identity
  * and keyed-upsert idempotence (the replay-safety half of §3.2).
  *
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge isn't in the offline dependency cache; fixed seeds also make
  * failures reproducible).
  */
class PropertySpecs extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  test("mapping compiler is total over arbitrary rename/cast configs and preserves arity") {
    // casts constrained to type-compatible targets: under ANSI mode a
    // mapping config with e.g. name->bigint correctly FAILS at run time,
    // so totality is only claimed over well-typed configs
    val validCasts = Map(
      "id" -> Seq("string", "bigint", "double"),
      "name" -> Seq("string"),
      "score" -> Seq("string", "double"))
    val field = for {
      src <- Gen.oneOf("id", "name", "score")
      dst <- ident
      cast <- Gen.option(Gen.oneOf(validCasts(src)))
    } yield FieldMapping(src, dst, cast)
    val cfg = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, field))
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "score")
    forAll(cfg) { mapping =>
      // distinct dst names required by select; dedup keeps the property total
      val m = mapping.distinctBy(_.dst)
      val out = MappingCompiler.transform(df, m)
      assert(out.columns.toSeq === m.map(_.dst))
      assert(out.count() === 2L)
    }
  }

  test("poly hash stays in [0, 2^31-1) for arbitrary ASCII strings") {
    forAll(Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)) { s =>
      val esc = s.replace("\\", "\\\\").replace("'", "\\'")
      val h = spark.sql(s"SELECT graft_poly_hash('$esc')").collect()(0).getLong(0)
      assert(h >= 0L && h < 2147483647L)
    }
  }

  test("split-then-union is the identity on the event stream (entity fan-out loses nothing)") {
    forAll(Gen.listOf(Gen.oneOf("click", "purchase", "signup"))) { types =>
      val ev = types.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("event_id", "event_type")
      val parts = Seq("click", "purchase", "signup").map(t => ev.filter($"event_type" === t))
      val reunited = parts.reduce(_ unionAll _)
      assert(reunited.count() === ev.count())
      assert(reunited.except(ev).isEmpty && ev.except(reunited).isEmpty)
    }
  }

  test("dsum128 is bit-identical to sum(CAST AS DECIMAL) for arbitrary doubles, all scales") {
    import org.apache.spark.sql.functions.{col, sum}
    import org.apache.spark.sql.types.DecimalType
    // mix of clean money values, knife-edge half-cases (x.xx5, x.xxxxx05),
    // negatives, zeros, nulls, and raw arbitrary doubles
    val vGen: Gen[Option[Double]] = Gen.frequency(
      4 -> Gen.choose(-99999999L, 99999999L).map(n => Some(n / 100.0)),
      2 -> Gen.choose(-9999999L, 9999999L).map(n => Some(n / 1000.0)),   // 3 decimals at scale 2 = ties
      2 -> Gen.choose(-999999999999L, 999999999999L).map(n => Some(n / 1e7)), // 7 decimals at scale 6 = ties
      // contract: per-row |v * 10^scale| must fit a long (scale 6 => |v| < 9.2e12)
      1 -> Gen.choose(-1e10, 1e10).map(Some(_)),
      1 -> Gen.const(None))
    forAll(Gen.listOfN(200, vGen), n = 5) { vals =>
      val df = vals.map(v => Tuple1(v.map(Double.box).orNull.asInstanceOf[java.lang.Double]))
        .toDF("v").selectExpr("CAST(v AS DOUBLE) AS v")
      for (scale <- Seq(0, 2, 6)) {
        val fast = df.agg(Num.dsum(col("v"), scale).as("s")).collect()(0)
        val slowRow = df.agg(sum(col("v").cast(DecimalType(30, scale))).cast("double").as("s")).collect()(0)
        assert(fast.isNullAt(0) === slowRow.isNullAt(0), s"null-ness diverged at scale $scale")
        if (!fast.isNullAt(0)) {
          val f = java.lang.Double.doubleToRawLongBits(fast.getDouble(0))
          val s = java.lang.Double.doubleToRawLongBits(slowRow.getDouble(0))
          assert(f === s, s"scale $scale: ${fast.getDouble(0)} != ${slowRow.getDouble(0)} over $vals")
        }
      }
    }
  }

  test("dsum128 carry path: sums far beyond 2^64 in the low word stay bit-identical to decimal Sum") {
    import org.apache.spark.sql.functions.{col, sum}
    import org.apache.spark.sql.types.DecimalType
    // 300 rows of ~9e16 (unscaled ~9e18, near the long edge) push the
    // accumulator through many lo-word overflows; mixed signs exercise
    // the sign-extension half of the 128-bit add
    val vals = Seq.fill(200)(9.0e16) ++ Seq.fill(100)(-8.7e16) ++ Seq(0.01, -0.01, 12345.67)
    val df = vals.toDF("v")
    val fast = df.agg(Num.dsum(col("v")).as("s")).collect()(0).getDouble(0)
    val slow = df.agg(sum(col("v").cast(DecimalType(38, 2))).cast("double").as("s")).collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(fast) === java.lang.Double.doubleToRawLongBits(slow),
      s"$fast != $slow")
  }

  test("dsum128 rejects per-row values whose scaled form exceeds the long range, loudly") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1e14).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(Num.dsum(col("v"), 6)).collect()
    }
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    assert(root(e).isInstanceOf[ArithmeticException])
  }

  test("dsum128 partitioning-independence: 1-partition and 32-partition sums agree bitwise") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir).lineitem
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(Num.dsum(col("l_extendedprice")).as("a"), Num.dsum(col("l_discount"), 6).as("b")).collect()(0)
    val one = run(li.repartition(1))
    val many = run(li.repartition(32))
    assert(java.lang.Double.doubleToRawLongBits(one.getDouble(0)) ===
      java.lang.Double.doubleToRawLongBits(many.getDouble(0)))
    assert(java.lang.Double.doubleToRawLongBits(one.getDouble(1)) ===
      java.lang.Double.doubleToRawLongBits(many.getDouble(1)))
  }

  test("ext-JSON kernel decode = from_json fallback across a fuzzed in-format grammar") {
    import graft.sources.ExtJson
    import graft.sources.ExtJson._
    import org.apache.spark.sql.functions.col

    val fields: Seq[(String, Kind)] = Seq("a" -> Oid, "b" -> Date, "c" -> Dec, "d" -> Plain)

    // JSON string rendering: minimal escapes, or everything as \uXXXX
    def jesc(s: String, escAll: Boolean): String = {
      val sb = new StringBuilder
      s.foreach {
        case c if escAll => sb ++= f"\\u${c.toInt}%04x"
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      sb.toString
    }
    val ws = Gen.oneOf("", "", "", " ", "  ", "\n", "\t ")
    val nastyChar = Gen.frequency(
      8 -> Gen.choose(32.toChar, 126.toChar),
      2 -> Gen.oneOf('"', '\\', '\n', '\t', 1.toChar, '{', '}', ',', ':', '$'),
      1 -> Gen.oneOf('é', '中', ' '))
    val nastyString = for {
      k <- Gen.choose(0, 10)
      cs <- Gen.listOfN(k, nastyChar)
      emoji <- Gen.oneOf("", "😀") // full pair, never a lone surrogate
    } yield cs.mkString + emoji
    val quoted = for {
      s <- nastyString
      all <- Gen.frequency(4 -> false, 1 -> true)
    } yield "\"" + jesc(s, all) + "\""

    val oidInner = Gen.frequency(
      3 -> Gen.listOfN(24, Gen.oneOf("0123456789abcdefABCDEF".toSeq)).map(s => "\"" + s.mkString + "\""),
      1 -> quoted)
    // micros form must fit a long on both paths (timestamp_millis throws
    // beyond it; the kernel nulls — documented out-of-domain divergence)
    val dateInner = Gen.choose(-9000000000000000L, 9000000000000000L).map(_.toString)
    val decInner = Gen.frequency(
      3 -> Gen.choose(-1e9, 1e9).map(d => "\"" + d.toString + "\""),
      1 -> Gen.oneOf("0.0", "-0.0", "1e308", "1e999", "-1e999", "  7.5  ", "0042.2500",
        "12345678901234567890123456789.5", ".5", "2.", "3e-5").map(s => "\"" + s + "\""))
    // Plain stays in-format: string values, JSON null, or compact
    // escape-free nested with integer leaves (Jackson re-renders floats
    // and whitespace — the documented raw-text divergence)
    val plainVal = Gen.frequency(
      5 -> quoted,
      1 -> Gen.oneOf("""{"k":[1,{"z":"w"}]}""", """["x",2,{"y":3}]""", """{"n":{"m":7}}"""),
      1 -> Gen.const("null"))

    // wrapper: optional extra sibling keys, optional missing $key (both
    // sides -> null), whitespace everywhere
    def wrapperGen(wkey: String, inner: Gen[String]): Gen[String] = for {
      in <- inner
      w1 <- ws; w2 <- ws; w3 <- ws
      extra <- Gen.frequency(5 -> Gen.const(None), 1 -> Gen.const(Some("\"other\":[1,\"x\"]")))
      omit <- Gen.frequency(7 -> Gen.const(false), 1 -> Gen.const(true))
      order <- Gen.oneOf(true, false)
    } yield {
      val kv = if (omit) Nil else List("\"" + wkey + "\"" + w1 + ":" + w2 + in)
      val ex = extra.toList
      "{" + w3 + (if (order) ex ++ kv else kv ++ ex).mkString(",") + w3 + "}"
    }

    val junk = for {
      name <- Gen.oneOf("zz", "q1", "a$", "$oid", "_x")
      v <- Gen.oneOf("""{"deep":[1,{"x":"}"}],"s":"a,b:c"}""", "[[[]]]",
        """"a \" junk"""", "12345", "-1.5e2", "true", "null", """{ "sp" : [ 1 , 2 ] }""")
    } yield ("\"" + name + "\"", v)

    val wellFormed: Gen[String] = for {
      a <- wrapperGen("$oid", oidInner).map(v => ("\"a\"", v))
      b <- wrapperGen("$date", dateInner).map(v => ("\"b\"", v))
      c <- wrapperGen("$numberDecimal", decInner).map(v => ("\"c\"", v))
      d <- plainVal.map(v => ("\"d\"", v))
      picks <- Gen.listOfN(4, Gen.choose(0, 5)) // which of a-d survive
      junks <- Gen.listOfN(2, junk)
      nJunk <- Gen.choose(0, 2)
      dup <- Gen.frequency(7 -> Gen.const(None), 1 -> Gen.const(Some(("\"b\"", """{"$date":1}"""))))
      shuffleSeed <- Gen.choose(0, 1000)
      w1 <- ws; w2 <- ws; w3 <- ws
      trail <- Gen.frequency(8 -> Gen.const(""), 1 -> Gen.const(" trailing-garbage"), 1 -> Gen.const("   "))
    } yield {
      val declared = Seq(a, b, c, d).zip(picks).collect { case (kv, p) if p > 0 => kv }
      val entries = declared ++ junks.take(nJunk) ++ dup.toList
      val perm = new scala.util.Random(shuffleSeed).shuffle(entries)
      perm.map { case (k, v) => w1 + k + w2 + ":" + w2 + v }
        .mkString("{", ",", w3 + "}") + trail
    }
    val malformed: Gen[String] = Gen.oneOf(
      "", "   ", "not json at all", "{", """{"a"}""", """{"a":{"$oid":"ff"""", """{"a":}""")
    val doc = Gen.frequency(9 -> wellFormed, 1 -> malformed)

    forAll(Gen.listOfN(40, doc), n = 15) { docs =>
      val df = docs.toDF("js")
      val fast = df.select(ExtJson.normalize(col("js"), fields): _*).collect()
      val slow = df.select(ExtJson.normalizeFallback(col("js"), fields): _*).collect()
      docs.lazyZip(fast).lazyZip(slow).foreach { (d, f, s) =>
        assert(f.toSeq === s.toSeq, s"kernel vs fallback diverged on doc: <$d>")
      }
    }
  }

  test("WAV codec round-trips arbitrary 16-bit sample arrays at arbitrary rates, losslessly") {
    import graft.multimodal.Multimodal
    val gen = for {
      n <- Gen.choose(0, 2000)
      samples <- Gen.listOfN(n, Gen.chooseNum(Short.MinValue, Short.MaxValue))
      rate <- Gen.oneOf(8000, 11025, 16000, 22050, 44100, 48000, 1)
    } yield (samples.map(_.toShort).toArray, rate)
    forAll(gen, n = 25) { case (samples, rate) =>
      val d = Multimodal.decodeWav(Multimodal.encodeWav(samples, rate)).get
      assert(d.sampleRate === rate)
      assert(d.samples.toSeq === samples.toSeq)
    }
  }

  test("GIF codec round-trips arbitrary frame sets losslessly (any byte values, any frame count)") {
    import graft.multimodal.Multimodal
    val framesGen = for {
      n <- Gen.choose(1, 6)
      frames <- Gen.listOfN(n, Gen.listOfN(64, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
    } yield frames
    forAll(framesGen, n = 15) { frames =>
      val gif = Multimodal.encodeGif(frames, width = 8)
      val back = Multimodal.decodeGif(gif).get
      assert(back.frames.length === frames.length)
      frames.zip(back.frames).zipWithIndex.foreach { case ((want, got), i) =>
        assert(got.pixels.toSeq === want.toSeq, s"frame $i")
      }
    }
  }

  test("chunking tiles every document: offsets stride, sizes bound, stride==size reconstructs exactly") {
    import graft.api.TextCuration
    val docGen = for {
      nTok <- Gen.choose(1, 40)
      toks <- Gen.listOfN(nTok, ident)
    } yield toks.mkString(" ")
    val paramGen = for {
      size <- Gen.choose(1, 12)
      stride <- Gen.choose(1, size)
      doc <- docGen
    } yield (size, stride, doc)
    forAll(paramGen, n = 25) { case (size, stride, doc) =>
      val df = Seq((1L, doc)).toDF("pid", "body")
      val chunks = TextCuration.chunkDocuments(df, "pid", "body", size, stride)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      val toks = doc.split(" ", -1)
      assert(chunks.nonEmpty)
      assert(chunks.map(_._2).toSeq === chunks.indices.map(_.toLong * stride), "starts stride")
      chunks.foreach { case (_, start, n, text) =>
        assert(n === math.min(size.toLong, toks.length - start))
        assert(text === toks.slice(start.toInt, start.toInt + size).mkString(" "))
      }
      if (stride == size) // exact tiling: concatenation rebuilds the doc
        assert(chunks.map(_._4).mkString(" ") === doc)
    }
  }

  test("uninorm is idempotent and agrees with java.text.Normalizer for arbitrary unicode strings") {
    // strings mixing ascii, combining marks, compatibility chars, surrogates
    val uniChar: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("́", "̈", "̧"), // combining acute/diaeresis/cedilla
      Gen.oneOf("é", "é", "ﬁ", "①", "ｱ", "½", "Å", "Å"),
      Gen.oneOf("𝒜", "😀"), // surrogate pairs
    )
    val strGen: Gen[String] = Gen.listOfN(12, uniChar).map(_.mkString)
    val forms = Seq("NFC", "NFD", "NFKC", "NFKD")
    forAll(strGen, n = 30) { s =>
      val rows = forms.map(f => s"graft_uninorm(s, '$f') AS $f")
      val r = Seq(Tuple1(s)).toDF("s").selectExpr(rows: _*).collect()(0)
      forms.zipWithIndex.foreach { case (f, i) =>
        val got = r.getString(i)
        val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(f))
        assert(got === want, s"form $f on ${s.map(_.toInt)}")
        // idempotence: normalizing a normalized string is the identity
        val again = Seq(Tuple1(got)).toDF("s").selectExpr(s"graft_uninorm(s, '$f') AS n")
          .collect()(0).getString(0)
        assert(again === got, s"$f not idempotent")
      }
    }
  }

  test("shuffleShard emits a permutation: dense positions, md5-order, for arbitrary id sets") {
    val idsGen = Gen.listOf(Gen.choose(1L, 100000L)).map(_.distinct).suchThat(_.nonEmpty)
    forAll(idsGen, n = 10) { ids =>
      val df = ids.toDF("id")
      val out = graft.operators.GlobalOrder.shuffleShard(df, "id", nshards = 4)
        .select("id", "shuffle_key", "global_pos").collect()
      assert(out.length === ids.size)
      val byPos = out.sortBy(_.getLong(2))
      assert(byPos.map(_.getLong(2)).toSeq === (0L until ids.size.toLong), "dense 0-based")
      val keysInPosOrder = byPos.map(r => (r.getString(1), r.getLong(0))).toSeq
      assert(keysInPosOrder === keysInPosOrder.sorted, "position order = (md5, id) order")
    }
  }

  test("funnel staged-min equals the greedy subsequence fold for arbitrary event streams") {
    // (ts offset seconds, code) — codes above maxStage exercise the
    // "never advances" contract; duplicate offsets exercise the
    // (ts, seq) tie-break the fold pins
    val evsGen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 12), Gen.chooseNum(0, 5)))
    forAll(evsGen, n = 12) { evs =>
      whenever(evs.nonEmpty) {
        val rows = evs.zipWithIndex.map { case ((off, code), i) =>
          (1L, new java.sql.Timestamp(1700000000000L + off * 1000L), i.toLong, code)
        }
        val out = graft.operators.Funnel.stages(
          rows.toDF("user_id", "ts", "event_id", "code"),
          "user_id", "ts", "event_id", "code", maxStage = 3).collect()(0)
        val want = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
          .foldLeft(0L)((s, c) => if (c == s + 1 && c <= 3) s + 1 else s)
        assert(out.getLong(1) === rows.length.toLong)
        assert(out.getLong(2) === want, s"events=$evs")
      }
    }
  }

  test("keyed upsert is idempotent for arbitrary update batches (replay safety)") {
    val updatesGen = Gen.listOf(for {
      key <- Gen.choose(1L, 5L)
      seq <- Gen.choose(1L, 10L)
      v <- ident
    } yield (key, seq, v))
    val base = Seq((1L, "b1"), (2L, "b2"), (3L, "b3")).toDF("k", "v")
    forAll(updatesGen) { ups =>
      whenever(ups.map(u => (u._1, u._2)).distinct.size == ups.size) {
        val u = ups.toDF("k", "seq", "v_new")
        def apply(b: org.apache.spark.sql.DataFrame) =
          VerifiedUpdates(b, u, Seq("k"), "seq", Map("v" -> "v_new"))
        val once = apply(base).orderBy("k").collect().toSeq
        val twice = apply(apply(base)).orderBy("k").collect().toSeq
        assert(once === twice)
      }
    }
  }

  test("salted join equals the plain join for arbitrary data, duplicate keys, and salt counts") {
    import org.apache.spark.sql.functions.col
    val gen = for {
      salts <- Gen.choose(1, 12)
      fact <- Gen.listOf(Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 1000000L)))
      dim <- Gen.listOf(Gen.zip(Gen.choose(0L, 10L), ident)) // keys beyond fact range + dup keys
    } yield (salts, fact, dim)
    forAll(gen, n = 15) { case (salts, fact, dim) =>
      whenever(fact.nonEmpty && dim.nonEmpty) {
        val f = fact.toDF("k", "eid")
        val d = dim.toDF("dk", "name")
        val got = graft.operators.ScaleJoins.saltedEquiJoin(f, "k", col("eid"), d, "dk", salts)
          .collect().map(_.toSeq.mkString("|")).sorted.toSeq
        val want = f.join(d, f("k") === d("dk"), "inner")
          .collect().map(_.toSeq.mkString("|")).sorted.toSeq
        assert(got === want, s"salts=$salts")
      }
    }
  }

  test("autoPlan equals the plain join for arbitrary data regardless of which branch the measurements pick") {
    import org.apache.spark.sql.functions.col
    val gen = for {
      // key range 0..3 with hot key 0: skewed enough to flip branches
      hot <- Gen.choose(0, 60)
      rest <- Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 1000000L)))
      dim <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 5L), ident))
      bcast <- Gen.oneOf(0L, 1000000L) // force past / allow the broadcast shortcut
      factor <- Gen.choose(1, 40).map(_ / 10.0)
    } yield (hot, rest, dim, bcast, factor)
    forAll(gen, n = 12) { case (hot, rest, dim, bcast, factor) =>
      val fact = (List.fill(hot)((0L, -1L)) ++ rest)
      whenever(fact.nonEmpty) {
        val f = fact.toDF("k", "eid")
        val d = dim.toDF("dk", "name")
        val (joined, dec) = graft.operators.Skew.autoPlan(
          f, "k", col("eid"), d, "dk",
          broadcastMaxRows = bcast, skewFactor = factor, maxSalts = 8)
        val got = joined.collect().map(_.toSeq.mkString("|")).sorted.toSeq
        val want = f.join(d, f("k") === d("dk"), "inner")
          .collect().map(_.toSeq.mkString("|")).sorted.toSeq
        assert(got === want, s"decision=$dec")
      }
    }
  }

  test("zone-map pruned scan equals the plain range filter for arbitrary data, zones, and ranges") {
    import org.apache.spark.sql.functions.{col, lit}
    val gen = for {
      zdiv <- Gen.choose(1L, 50L) // zone granularity
      xs <- Gen.nonEmptyListOf(Gen.choose(-500L, 500L))
      lo <- Gen.choose(-600L, 600L)
      span <- Gen.choose(0L, 400L)
    } yield (zdiv, xs, lo, lo + span)
    forAll(gen, n = 15) { case (zdiv, xs, lo, hi) =>
      val df = xs.zipWithIndex.map { case (x, i) => (x, i.toLong) }.toDF("x", "id")
      // zone is null for x in [-100,0): a null zone group must survive
      // pruning like any other (the ADVICE r10 null-gate regression)
      val zone = org.apache.spark.sql.functions
        .when(col("x") >= -100 && col("x") < 0, lit(null))
        .otherwise(col("x") / lit(zdiv)) // integer div semantics differ for negatives but ANY pure fn is a valid zone
      val zm = graft.operators.ZoneMap.build(df, zone, Seq("x"))
      val got = graft.operators.ZoneMap.prunedScan(df, zone, zm, "x", lit(lo), lit(hi))
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val want = df.filter(col("x").between(lo, hi))
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(got === want, s"zdiv=$zdiv range=[$lo,$hi]")
    }
  }

  test("TrackSpec: Spark-side transform column == driver-side literal transform (edge values)") {
    import graft.sources.TrackSpec
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    // days over timestamps: the 1970 boundary, exact day multiples, a
    // far-future point -- floorDiv on micros, zone-free on both sides
    val micros = Seq(-86400000001L, -86400000000L, -1L, 0L, 1L,
      86399999999L, 86400000000L, 1767225600123456L)
    val dSpec = TrackSpec.parse("days(ts)")
    val dSpark = micros.toDF("us").selectExpr("timestamp_micros(us) AS ts")
      .select(TrackSpec.column(dSpec, TimestampType).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(dSpark == micros.map(m =>
      TrackSpec.literal(dSpec, m, TimestampType).asInstanceOf[Long]))
    // truncate over negative/positive longs: floor-to-multiple, exact
    val longs = Seq(-15L, -8L, -7L, -1L, 0L, 1L, 6L, 7L, 8L, 999L)
    val tSpec = TrackSpec.parse("truncate(7,v)")
    val tSpark = longs.toDF("v").select(TrackSpec.column(tSpec, LongType).as("t"))
      .collect().map(_.getLong(0)).toSeq
    assert(tSpark == longs.map(v =>
      TrackSpec.literal(tSpec, v, LongType).asInstanceOf[Long]))
    // truncate over unicode strings: CHARACTER prefix on both sides
    val strs = Seq("", "a", "ab", "abcd", "h\u00e9llo", "\u65e5\u672c\u8a9e\u30c6\u30b9\u30c8")
    val sSpec = TrackSpec.parse("truncate(3,s)")
    val sSpark = strs.toDF("s").select(TrackSpec.column(sSpec, StringType).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(sSpark == strs.map(v =>
      TrackSpec.literal(sSpec, UTF8String.fromString(v), StringType).toString))
    // hours/months/years over the same timestamp edges: floorDiv and
    // proleptic-Gregorian civil calendar on both sides (LocalDate vs
    // date_from_unix_date + year/month — leap years, pre-1970)
    val hSpec = TrackSpec.parse("hours(ts)")
    val hSpark = micros.toDF("us").selectExpr("timestamp_micros(us) AS ts")
      .select(TrackSpec.column(hSpec, TimestampType).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(hSpark == micros.map(m =>
      TrackSpec.literal(hSpec, m, TimestampType).asInstanceOf[Long]))
    val calMicros = micros ++ Seq(
      -62135596800000000L + 86400000000L * 31, // year 1 CE, Feb (deep proleptic)
      951782400000000L,   // 2000-02-29 (leap day)
      4107542400000000L)  // 2100-03-01 (after the NON-leap century year)
    for (t <- Seq("months(ts)", "years(ts)")) {
      val spec = TrackSpec.parse(t)
      val got = calMicros.toDF("us").selectExpr("timestamp_micros(us) AS ts")
        .select(TrackSpec.column(spec, TimestampType).as("x"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == calMicros.map(m =>
        TrackSpec.literal(spec, m, TimestampType).asInstanceOf[Long]), t)
    }
    // and over DATE sources (day-ordinal ints on the driver side)
    val days = Seq(-719162, -1, 0, 59, 11016, 18321)
    for (t <- Seq("days(d)", "months(d)", "years(d)")) {
      val spec = TrackSpec.parse(t)
      val got = days.toDF("ord").selectExpr("date_from_unix_date(ord) AS d")
        .select(TrackSpec.column(spec, DateType).as("x"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == days.map(v =>
        TrackSpec.literal(spec, v, DateType).asInstanceOf[Long]), t)
    }
    // bucket: one hash family (xxhash64 seed 42) on both sides
    val bSpec = TrackSpec.parse("bucket(16,v)")
    val bSpark = longs.toDF("v").select(TrackSpec.column(bSpec, LongType).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(bSpark == longs.map(v =>
      TrackSpec.literal(bSpec, v, LongType).asInstanceOf[Long]))
    assert(bSpark.forall(b => b >= 0 && b < 16))
    val bsSpec = TrackSpec.parse("bucket(16,s)")
    val bsSpark = strs.toDF("s").select(TrackSpec.column(bsSpec, StringType).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(bsSpark == strs.map(v =>
      TrackSpec.literal(bsSpec, UTF8String.fromString(v), StringType).asInstanceOf[Long]))
  }
}
