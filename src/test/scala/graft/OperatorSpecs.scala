package graft

import graft.operators._
import graft.pipeline._
import graft.sources.ExtJson
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextKitSpec extends SparkSpec {
  import TextKit._

  test("polynomial hash matches the hand-computed fold and both dialect snippets agree on shape") {
    // 'abc': ((0*31+97)*31+98)*31+99 mod P = 96354
    val got = spark.sql(s"SELECT ${polySpark("'abc'")}").collect()(0).getLong(0)
    assert(got === 96354L)
  }

  test("shingles: distinct word trigrams in order, 1-based indexing") {
    val got = spark.sql(s"SELECT ${shinglesSpark("split('a b c d c b a', ' ')")}")
      .collect()(0).getSeq[String](0)
    assert(got === Seq("a b c", "b c d", "c d c", "d c b", "c b a"))
  }

  test("bigrams cover n-1 adjacent pairs") {
    val got = spark.sql(s"SELECT ${bigramsSpark("split('x y z', ' ')")}").collect()(0).getSeq[String](0)
    assert(got === Seq("x y", "y z"))
  }

  test("native rep-stats kernel equals the composed explode->two-level-count form on real corpus text + edges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .union(spark.createDataFrame(
        Seq((9001L, "single"), (9002L, ""), (9003L, "a a a a"), (9004L, "x y")))
        .toDF("doc_id", "text"))
    val kernel = docs.selectExpr("doc_id", "graft_rep_stats(text) AS r")
      .filter("r IS NOT NULL")
      .selectExpr("doc_id", "r.n_bigrams AS n", "r.n_distinct_bigrams AS d", "r.top_bigram_n AS t")
    val composed = docs
      .selectExpr("doc_id", s"explode(${textBigramsSpark("text")}) AS b")
      .groupBy("doc_id", "b").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n"), count(lit(1)).as("d"), max("count").as("t"))
    assert(kernel.exceptAll(composed).count() === 0L)
    assert(composed.exceptAll(kernel).count() === 0L)
    // the no-bigram docs drop in both forms
    assert(kernel.filter("doc_id IN (9001, 9002)").count() === 0L)
    // hand-check the degenerate repeats
    val r3 = kernel.filter("doc_id = 9003").collect()(0)
    assert((r3.getLong(1), r3.getLong(2), r3.getLong(3)) === ((3L, 1L, 3L)))
  }

  test("native word-ngrams expression is value-identical to the composed tokenize+zip form on real corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shDiff = docs.selectExpr(
      s"${textShinglesSpark("text")} AS a",
      s"${shinglesSpark(tokensSpark("text"))} AS b").filter("a <> b").count()
    assert(shDiff === 0L)
    val bgDiff = docs.selectExpr(
      s"${textBigramsSpark("text")} AS a",
      s"${bigramsSpark(tokensSpark("text"))} AS b").filter("a <> b").count()
    assert(bgDiff === 0L)
  }

  test("word-ngrams rejects n < 1 at analysis time, not with a runtime crash") {
    val e = intercept[Exception](spark.sql("SELECT graft_word_ngrams('a b c', 0, true)").collect())
    assert(e.getMessage.contains("n must be >= 1"), e.getMessage)
  }

  test("graft_term_tf equals the explode+groupBy tf on real corpus text; edge cases") {
    // equivalence on the corpus: per-(doc, term) counts identical to
    // the declarative shuffle form the kernel replaces
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", s"${graft.operators.TextKit.tokensSpark("text")} AS tok")
    val viaKernel = docs
      .selectExpr("doc_id", "explode(graft_term_tf(tok)) AS e")
      .selectExpr("doc_id", "e.term AS term", "e.tf AS tf")
    val viaShuffle = docs
      .selectExpr("doc_id", "explode(tok) AS term")
      .groupBy("doc_id", "term")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("long").as("tf"))
    assert(viaKernel.exceptAll(viaShuffle).isEmpty &&
      viaShuffle.exceptAll(viaKernel).isEmpty,
      "kernel tf must match the shuffle tf exactly")
    // edge cases: empty array -> empty; multiplicity counted;
    // first-occurrence order
    val r = spark.sql(
      "SELECT graft_term_tf(array('b', 'a', 'b', 'b')) AS e").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(x => (x.getString(0), x.getLong(1))) === Seq(("b", 3L), ("a", 1L)))
    assert(spark.sql("SELECT graft_term_tf(CAST(array() AS array<string>))").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).isEmpty)
  }

  test("native word-ngrams edge cases: short text -> empty, multiplicity kept when dedup=false") {
    assert(spark.sql("SELECT graft_word_ngrams('one two', 3, true)").collect()(0).getSeq[String](0).isEmpty)
    assert(spark.sql("SELECT graft_word_ngrams('a b a b', 2, false)").collect()(0).getSeq[String](0)
      === Seq("a b", "b a", "a b"))
    assert(spark.sql("SELECT graft_word_ngrams('a b a b', 2, true)").collect()(0).getSeq[String](0)
      === Seq("a b", "b a"))
  }

  test("native poly_hash kernel is bit-identical to the portable HOF fold on real corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diffs = docs
      .selectExpr(s"${polySpark("text")} AS a", s"${polySparkHof("text")} AS b")
      .filter("a <> b").count()
    assert(diffs === 0L)
  }

  test("native marker-count kernel equals the portable HOF filter on real corpus text + edges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val all = (langMarkers.map(_._2) :+ stopwords)
    all.foreach { ms =>
      val diffs = docs.selectExpr(s"${tokensSpark("text")} AS tok")
        .selectExpr(s"${markerCountSpark("tok", ms)} AS a", s"${markerCountSparkHof("tok", ms)} AS b")
        .filter("a <> b").count()
      assert(diffs === 0L, s"markers $ms diverged")
    }
    // edges: empty array, null elements not counted, null array -> null
    val edge = spark.sql(
      "SELECT graft_marker_count(array('the', NULL, 'x', 'the'), 'the,a') AS c, " +
        "graft_marker_count(CAST(array() AS ARRAY<STRING>), 'the') AS e, " +
        "graft_marker_count(CAST(NULL AS ARRAY<STRING>), 'the') AS n").collect()(0)
    assert(edge.getLong(0) === 2L)
    assert(edge.getLong(1) === 0L)
    assert(edge.isNullAt(2))
  }

  test("marker spec validation: empty markers rejected at analysis time, unsafe chars at build time") {
    // a stray separator means the caller's marker set was mangled — the
    // kernel must fail analysis, not silently count a different set
    val e = intercept[Exception](
      spark.sql("SELECT graft_marker_count(array('x'), 'the,,a')").collect())
    assert(e.getMessage.contains("empty marker"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_marker_count(array('x'), '')").collect())
    assert(e2.getMessage.contains("empty marker"), e2.getMessage)
    // builder-side: a marker containing the csv delimiter or SQL quote
    // cannot travel through the literal carrier — reject, don't mangle
    intercept[IllegalArgumentException](markerCountSpark("tok", Seq("a,b")))
    intercept[IllegalArgumentException](markerCountSpark("tok", Seq("it's")))
    intercept[IllegalArgumentException](markerCountSpark("tok", Seq("")))
  }

  test("native minhash kernel equals the composed explode->groupBy-min form on real corpus text") {
    import org.apache.spark.sql.functions.{col, explode, expr, min}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val aggs = (0 until MinhashK).map(i => min(expr(permExpr(i, "x"))).as(s"m$i"))
    val composed = docs
      .selectExpr("doc_id", s"${textShinglesSpark("text")} AS sh")
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("x", expr(polySpark("s")))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val kernel = graft.api.TextCuration.minhashSignatures(docs, "doc_id", "text")
    assert(kernel.count() === composed.count())
    assert(kernel.except(composed).isEmpty && composed.except(kernel).isEmpty,
      "kernel and composed signatures diverge")
    // explode-of-empty semantics: a doc with no shingles produces no row
    import spark.implicits._
    val tiny = Seq((1L, "only two"), (2L, "a b c d")).toDF("doc_id", "text")
    val sigs = graft.api.TextCuration.minhashSignatures(tiny, "doc_id", "text")
    assert(sigs.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("native simhash kernel equals the composed explode->grouped-vote form on real corpus text") {
    import org.apache.spark.sql.functions.{col, explode, expr, sum}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sums = (0 until SimhashBits).map(j =>
      sum(expr(s"CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$j"))
    val simExpr = (0 until SimhashBits).map(j =>
      s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)").mkString(" + ")
    val composed = docs
      .selectExpr("doc_id", s"${textBigramsSpark("text")} AS feats")
      .select(col("doc_id"), explode(col("feats")).as("w"))
      .withColumn("h", expr(polySpark("w")))
      .groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .selectExpr("doc_id", s"$simExpr AS sim")
    val kernel = docs
      .selectExpr("doc_id", s"${textBigramsSpark("text")} AS feats")
      .selectExpr("doc_id", "graft_simhash(feats) AS sim")
      .filter(col("sim").isNotNull)
    assert(kernel.count() === composed.count())
    assert(kernel.except(composed).isEmpty && composed.except(kernel).isEmpty,
      "kernel and composed simhash diverge")
    // no-feature docs drop; single-word text has no bigrams
    import spark.implicits._
    val sigs = Seq((1L, "loner"), (2L, "two words here")).toDF("doc_id", "text")
      .selectExpr("doc_id", s"${textBigramsSpark("text")} AS feats")
      .selectExpr("doc_id", "graft_simhash(feats) AS sim")
      .filter(col("sim").isNotNull)
    assert(sigs.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("minhash permutation params are fixed, nonzero literals") {
    assert(perms.size === MinhashK)
    assert(perms.forall { case (a, b) => a > 0 && a < P && b >= 0 && b < P })
    assert(perms.distinct.size === MinhashK)
  }
}

class VectorKitSpec extends SparkSpec {
  import VectorKit._

  test("dot product is an exact left fold in doubles") {
    val got = spark.sql(s"SELECT ${dotSpark("array(1.0F, 2.0F, 3.0F)", "array(4.0F, 5.0F, 6.0F)")}")
      .collect()(0).getDouble(0)
    assert(got === 32.0)
  }

  test("native vec_dot kernel is bit-identical to the portable HOF fold on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e2 = emb.selectExpr("vec_id", "embedding AS e1")
      .join(emb.selectExpr("vec_id + 1 AS vec_id", "embedding AS e2"), "vec_id")
    val diffs = e2
      .selectExpr(s"${dotSpark("e1", "e2")} AS a", s"${dotSparkHof("e1", "e2")} AS b")
      .filter("a <> b").count()
    assert(diffs === 0L)
  }

  test("native vec_l2sub kernel is bit-identical to the portable HOF fold across every subspace") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e2 = emb.selectExpr("vec_id", "embedding AS e1")
      .join(emb.selectExpr("vec_id + 1 AS vec_id", "embedding AS e2"), "vec_id")
    (0 until 8).foreach { j =>
      val diffs = e2
        .selectExpr(s"${l2SubSpark("e1", "e2", j * 8, 8)} AS a",
          s"${l2SubSparkHof("e1", "e2", j * 8, 8)} AS b")
        .filter("a <> b").count()
      assert(diffs === 0L, s"subspace $j")
    }
    // window past either array end: null (a data error surfaced, not padded)
    val oob = spark.sql(s"SELECT graft_vec_l2sub(array(1.0F, 2.0F), array(3.0F, 4.0F), 1, 5)").collect()(0)
    assert(oob.isNullAt(0))
  }

  test("vec_dot returns null (not a partial sum) for unequal-length arrays, like the composed form") {
    val r = spark.sql(s"SELECT ${dotSpark("array(1.0F, 2.0F)", "array(3.0F)")}").collect()(0)
    assert(r.isNullAt(0))
    val hof = spark.sql(s"SELECT ${dotSparkHof("array(1.0F, 2.0F)", "array(3.0F)")}").collect()(0)
    assert(hof.isNullAt(0))
  }

  test("lsh bucket is stable and within range") {
    val b = spark.sql(s"SELECT ${bucketSpark("array(0.5F, -0.25F, 0.125F)")}").collect()(0)
    val v = b.getInt(0)
    assert(v >= 0 && v < (1 << LshPlanes))
    val again = spark.sql(s"SELECT ${bucketSpark("array(0.5F, -0.25F, 0.125F)")}").collect()(0).getInt(0)
    assert(v === again)
  }
}

class MappingCompilerSpec extends SparkSpec {
  import spark.implicits._

  test("compile: rename, cast, expression source, default on null") {
    val df = Seq((1L, "alice", Some(10.5)), (2L, "bob", None))
      .toDF("id", "name", "score")
    val mapping = Seq(
      FieldMapping("id", "contact_id", Some("bigint")),
      FieldMapping("upper(name)", "uname"),
      FieldMapping("score", "score", Some("double"), default = Some("0.0")),
    )
    val out = MappingCompiler.transform(df, mapping).orderBy("contact_id").collect()
    assert(out.map(_.toSeq).toSeq === Seq(Seq(1L, "ALICE", 10.5), Seq(2L, "BOB", 0.0)))
  }

  test("fromJson parses tenant config incl optional fields") {
    val cfg = """[
      {"src": "a", "dst": "x"},
      {"src": "lower(b)", "dst": "y", "cast": "string", "default": "'?'"}
    ]"""
    val m = MappingCompiler.fromJson(cfg)
    assert(m === Seq(
      FieldMapping("a", "x"),
      FieldMapping("lower(b)", "y", Some("string"), Some("'?'"))))
  }

  test("fromJson rejects non-array configs") {
    intercept[IllegalArgumentException](MappingCompiler.fromJson("""{"src": "a"}"""))
  }
}

class SyncJobSpec extends SparkSpec {
  import spark.implicits._
  import SyncJob._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val table = Seq(
    (1L, ts("2020-01-01 00:00:00"), "a"),
    (2L, ts("2020-01-02 00:00:00"), "b"),
    (3L, ts("2020-01-02 00:00:00"), "c"),
    (4L, ts("2020-01-03 00:00:00"), "d"),
  ).toDF("id", "processing_ts", "payload")

  test("ranged scan: strictly-after ts, tie-broken by id") {
    val got = rangedScan(table, "processing_ts", "id", Watermark(ts("2020-01-02 00:00:00"), 2L))
      .select("id").as[Long].collect().sorted
    assert(got === Array(3L, 4L))
  }

  test("stats lifecycle: COMPLETED with range, NO_DATA on empty") {
    val live = syncStats(
      rangedScan(table, "processing_ts", "id", Watermark(ts("2020-01-01 00:00:00"), 1L)),
      "processing_ts", "id", "contact").collect()(0)
    assert(live.getAs[String]("status") === "COMPLETED")
    assert(live.getAs[Long]("records_count") === 3L)
    assert(live.getAs[Long]("from_id") === 2L && live.getAs[Long]("to_id") === 4L)

    val empty = syncStats(
      rangedScan(table, "processing_ts", "id", Watermark(ts("2030-01-01 00:00:00"), 0L)),
      "processing_ts", "id", "contact").collect()(0)
    assert(empty.getAs[String]("status") === "NO_DATA")
    assert(empty.isNullAt(empty.fieldIndex("from_id")))
  }

  test("watermark advance pairs max(ts) with the max id AT that ts, not the batch-global max id") {
    // regression: rows (10:05, id=100) and (10:06, id=5) — a later commit
    // at 10:06 with id 50 must still be seen, so lastId must be 5, not 100
    val skewed = Seq(
      (100L, ts("2020-01-01 10:05:00"), "x"),
      (5L, ts("2020-01-01 10:06:00"), "y"),
    ).toDF("id", "processing_ts", "payload")
    val wm = advance(
      syncStats(skewed, "processing_ts", "id", "contact"),
      Watermark(ts("2000-01-01 00:00:00"), 0L))
    assert(wm === Watermark(ts("2020-01-01 10:06:00"), 5L))
    val lateCommit = Seq((50L, ts("2020-01-01 10:06:00"), "late"))
      .toDF("id", "processing_ts", "payload")
    assert(rangedScan(lateCommit, "processing_ts", "id", wm).count() === 1L)
  }

  test("replay idempotence: advancing then re-scanning from the same watermark re-yields the batch; from the advanced one, nothing") {
    val wm0 = Watermark(ts("2020-01-01 00:00:00"), 1L)
    val batch = rangedScan(table, "processing_ts", "id", wm0)
    val stats = syncStats(batch, "processing_ts", "id", "contact")
    val wm1 = advance(stats, wm0)
    assert(wm1 === Watermark(ts("2020-01-03 00:00:00"), 4L))
    // crash-before-advance replay: same watermark -> identical batch (idempotent upsert absorbs it)
    val replay = rangedScan(table, "processing_ts", "id", wm0).select("id").as[Long].collect().sorted
    assert(replay === Array(2L, 3L, 4L))
    // after advance: drained
    assert(rangedScan(table, "processing_ts", "id", wm1).isEmpty)
    assert(advance(syncStats(rangedScan(table, "processing_ts", "id", wm1), "processing_ts", "id", "contact"), wm1) === wm1)
  }
}

class VerifiedUpdatesSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, 10L, "old-a", 1.0),
    (1L, 11L, "old-b", 2.0),
    (2L, 10L, "old-c", 3.0),
  ).toDF("company_id", "external_id", "verified_data", "score")

  test("last writer wins per key; unmatched rows untouched; null update value leaves base") {
    val updates = Seq(
      (1L, 10L, 1L, Some("v1"), Some(9.0)),
      (1L, 10L, 2L, Some("v2"), None), // latest: value null -> score stays
      (2L, 10L, 5L, Some("v5"), Some(7.5)),
    ).toDF("company_id", "external_id", "seq", "verified_data_new", "score_new")
    val out = VerifiedUpdates(base, updates, Seq("company_id", "external_id"), "seq",
      Map("verified_data" -> "verified_data_new", "score" -> "score_new"))
      .orderBy("company_id", "external_id").collect()
    assert(out.map(_.toSeq).toSeq === Seq(
      Seq(1L, 10L, "v2", 1.0),
      Seq(1L, 11L, "old-b", 2.0),
      Seq(2L, 10L, "v5", 7.5)))
  }

  test("applying the same update batch twice is idempotent") {
    val updates = Seq((1L, 10L, 1L, "v1")).toDF("company_id", "external_id", "seq", "verified_data_new")
    val once = VerifiedUpdates(base, updates, Seq("company_id", "external_id"), "seq",
      Map("verified_data" -> "verified_data_new"))
    val twice = VerifiedUpdates(once, updates, Seq("company_id", "external_id"), "seq",
      Map("verified_data" -> "verified_data_new"))
    assert(once.orderBy("company_id", "external_id").collect().toSeq ===
      twice.orderBy("company_id", "external_id").collect().toSeq)
  }
}

class ExtJsonSpec extends SparkSpec {
  import spark.implicits._
  import ExtJson._

  test("encode -> normalize round-trips oid/date/decimal/plain") {
    val df = Seq((java.sql.Timestamp.valueOf("2021-05-01 12:30:00"), "6058f0e72c0b5a1dc4d71abc", "42.25", "hello"))
      .toDF("created", "oid", "amount", "note")
    val fields: Seq[(String, Kind)] = Seq("_id" -> Oid, "created" -> Date, "amount" -> Dec, "note" -> Plain)
    val encoded = df.select(encode(Seq(
      ("_id", col("oid"), Oid),
      ("created", col("created"), Date),
      ("amount", col("amount"), Dec),
      ("note", col("note"), Plain))).as("js"))
    val js = encoded.collect()(0).getString(0)
    assert(js.contains(""""_id":{"$oid":"6058f0e72c0b5a1dc4d71abc"}"""))
    assert(js.contains(""""amount":{"$numberDecimal":"42.25"}"""))
    val out = encoded.select(normalize(col("js"), fields): _*).collect()(0)
    assert(out.getString(0) === "6058f0e72c0b5a1dc4d71abc")
    assert(out.getTimestamp(1) === java.sql.Timestamp.valueOf("2021-05-01 12:30:00"))
    assert(out.getDouble(2) === 42.25)
    assert(out.getString(3) === "hello")
  }

  test("encode escapes quotes/backslashes/control chars so hostile values survive the round-trip") {
    val nasty = "Acme \"West\" \\ Corp\nline2"
    val df = Seq(Tuple1(nasty)).toDF("note")
    val out = df
      .select(encode(Seq(("note", col("note"), Plain))).as("js"))
      .select(normalize(col("js"), Seq("note" -> Plain)): _*)
      .collect()(0)
    assert(out.getString(0) === nasty)
  }

  test("normalize tolerates missing fields (null, no schema explosion)") {
    val js = Seq("""{"_id": {"$oid": "ff"}}""").toDF("js")
    val out = js.select(normalize(col("js"), Seq("_id" -> Oid, "created" -> Date)): _*).collect()(0)
    assert(out.getString(0) === "ff")
    assert(out.isNullAt(1))
  }

  test("native kernels are byte-identical to the to_json/from_json fallback path") {
    // a field named with ':' forces the fallback; same data through both
    // paths must produce identical document bytes and identical scalars
    val df = Seq(
      (java.sql.Timestamp.valueOf("2021-05-01 12:30:00"), "6058F0E72C0B5A1DC4D71ABC", "0042.2500", "its \"q\"\\"),
      (java.sql.Timestamp.valueOf("1969-12-31 23:59:59"), "ff", "-1.5e2", "plain"),
      // null VALUES: every kind must encode identically on both paths
      // (field omitted, not "name":{}) and decode back to null scalars
      (null.asInstanceOf[java.sql.Timestamp], null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String]),
      (null.asInstanceOf[java.sql.Timestamp], "aa", null.asInstanceOf[String], "mixed")
    ).toDF("created", "oid", "amount", "note")
    def enc(noteName: String) = encode(Seq(
      (noteName, col("note"), Plain), ("_id", col("oid"), Oid),
      ("created", col("created"), Date), ("amount", col("amount"), Dec)))
    val fast = df.select(enc("note").as("js")).collect().map(_.getString(0))
    val slow = df.select(enc("no:te").as("js")).collect().map(_.getString(0).replace("\"no:te\"", "\"note\""))
    assert(fast.toSeq === slow.toSeq)
    // decode equivalence, driven off the fast-encoded docs
    val docs = df.select(enc("note").as("js"))
    def dec(noteName: String) = Seq(noteName -> Plain, "_id" -> Oid, "created" -> Date, "amount" -> Dec)
    val fastRows = docs.select(normalize(col("js"), dec("note")): _*).collect()
    val slowRows = docs.select(col("js"))
      .withColumn("js", expr("replace(js, '\"note\"', '\"no:te\"')"))
      .select(normalize(col("js"), dec("no:te")): _*).collect()
    fastRows.zip(slowRows).foreach { case (f, s) => assert(f.toSeq === s.toSeq) }
  }

  test("decode: malformed doc -> null struct fields; unknown fields skipped; nested values tolerated") {
    val fields: Seq[(String, Kind)] = Seq("_id" -> Oid, "created" -> Date, "amount" -> Dec)
    val out = Seq(
      """{"_id":{"$oid":"AB"},"junk":{"deep":[1,{"x":"}"}]},"created":{"$date":-1},"amount":{"$numberDecimal":" 7 "}}""",
      """not json at all""",
      """{"_id":"bare-string","created":{"$date":1.5},"amount":{"$numberDecimal":"NaNope"}}"""
    ).toDF("js").select(normalize(col("js"), fields): _*).collect()
    assert(out(0).getString(0) === "ab")                       // lowercased
    assert(out(0).getTimestamp(1).getTime === -1L)             // negative millis
    assert(out(0).getDouble(2) === 7.0)                        // trimmed cast
    assert((0 to 2).forall(out(1).isNullAt))                   // malformed -> all null
    assert(out(2).isNullAt(0) && out(2).isNullAt(1) && out(2).isNullAt(2)) // mistyped -> null fields
  }
}

class JdbcUpsertSpec extends SparkSpec {
  import JdbcUpsert._

  test("postgres upsert text") {
    assert(upsertSql(Postgres, "t", Seq("k", "a", "b"), Seq("k")) ===
      "INSERT INTO t (k, a, b) VALUES (?, ?, ?) ON CONFLICT (k) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
  }

  test("mysql upsert text") {
    assert(upsertSql(MySql, "t", Seq("k1", "k2", "v"), Seq("k1", "k2")) ===
      "INSERT INTO t (k1, k2, v) VALUES (?, ?, ?) ON DUPLICATE KEY UPDATE v = VALUES(v)")
  }

  test("keys must be subset of cols") {
    intercept[IllegalArgumentException](upsertSql(Postgres, "t", Seq("a"), Seq("k")))
  }

  test("all-key tables produce valid conflict-ignore statements, not an empty SET list") {
    assert(upsertSql(Postgres, "t", Seq("k1", "k2"), Seq("k1", "k2")) ===
      "INSERT INTO t (k1, k2) VALUES (?, ?) ON CONFLICT (k1, k2) DO NOTHING")
    assert(upsertSql(MySql, "t", Seq("k1", "k2"), Seq("k1", "k2")) ===
      "INSERT INTO t (k1, k2) VALUES (?, ?) ON DUPLICATE KEY UPDATE k1 = k1")
  }

  test("batching: full batches plus final partial") {
    val rows = (1 to 10).map(i => Row(i)).iterator
    val sizes = batches(rows, 4).map(_.size).toSeq
    assert(sizes === Seq(4, 4, 2))
  }
}

class ApproxDistinctSpec extends SparkSpec {
  test("q55 HLL++ error gate holds at every spec SF (the query emits the <=5% check; the oracle hash-gates it)") {
    // the error bound is now IN the query output (hll_within_5pct), so
    // the driver's DuckDB gate enforces it each round; this spec pins
    // it at a third scale factor
    val rows = graft.queries.QueryCatalog.byName("q55_approx_distinct")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"${r.getAs[String]("l_returnflag")}: exact=${r.getAs[Long]("exact_parts")}")
    }
  }
}

class ApproxPercentileSpec extends SparkSpec {
  test("q58 quantile-sketch error gates hold at every spec SF (the query emits the <=2% checks; the oracle hash-gates them)") {
    val rows = graft.queries.QueryCatalog.byName("q58_approx_percentile")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_2pct") && r.getAs[Boolean]("p95_within_2pct"),
        s"${r.getAs[String]("o_orderpriority")}: n=${r.getAs[Long]("n_rows")}")
    }
  }
}

class SourceSinkSpec extends SparkSpec {
  test("json and csv sinks round-trip the event rows (the reference's file source/sink surface)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("srcsink").toString
    val ev = Tables(spark, "/root/testdata/sf0.001").events
      .select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").json(s"$dir/ev_json")
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/ev_csv")
    val fromJson = spark.read.schema(ev.schema).json(s"$dir/ev_json")
    val fromCsv = spark.read.schema(ev.schema).option("header", "true").csv(s"$dir/ev_csv")
    assert(fromJson.count() === ev.count())
    assert(fromJson.except(ev).isEmpty && ev.except(fromJson).isEmpty)
    assert(fromCsv.count() === ev.count())
    assert(fromCsv.except(ev).isEmpty && ev.except(fromCsv).isEmpty)
  }

  test("CsvIO pinned dialect: hostile strings, null-vs-empty, whitespace, micros timestamps survive") {
    import spark.implicits._
    val dir = tmpDir("csvio").toString
    val rows = Seq(
      (1L, Some("""a,"b" c"""), java.sql.Timestamp.valueOf("2024-03-01 01:02:03.123456"), 1.5),
      (2L, Some("  padded  "), java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), -0.25),
      (3L, Some(""), java.sql.Timestamp.valueOf("2024-12-31 23:59:59.999999"), 1e-300),
      (4L, None, java.sql.Timestamp.valueOf("2024-06-06 06:06:06.000001"), 12345.678901),
      (5L, Some("ends in backslash\\"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.1),
    ).toDF("id", "s", "ts", "v")
    graft.sources.CsvIO.write(rows, s"$dir/rt")
    val back = graft.sources.CsvIO.read(spark, s"$dir/rt", rows.schema)
    assert(back.count() === 5L)
    assert(back.except(rows).isEmpty && rows.except(back).isEmpty,
      back.collect().toSeq.toString)
    // null and empty string remain DISTINCT through the round trip
    val m = back.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m(3L) === Some("") && m(4L) === None)
    // pinned in-band limitation: a literal string equal to the NULL
    // sentinel reads back as NULL (no COPY-style escaping in the
    // writer) — if this ever starts round-tripping, the docs can drop
    // the caveat
    val sentinel = Seq((9L, Some("\\N"))).toDF("id", "s")
    graft.sources.CsvIO.write(sentinel, s"$dir/sent")
    val sBack = graft.sources.CsvIO.read(spark, s"$dir/sent", sentinel.schema).collect()
    assert(sBack.length === 1 && sBack.head.isNullAt(1),
      "documented collision: sentinel-equal data reads as NULL")
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.multimodal.Multimodal

  test("binary payload features match direct byte math") {
    import spark.implicits._
    val docs = Seq((7L, "abc")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs)).collect()(0)
    assert(feats.doc_id === 7L)
    assert(feats.n_bytes === 3L)
    assert(feats.byte_sum === (97 + 98 + 99).toLong)
    assert(feats.head_byte === 97L)
    assert(feats.feature.toSeq === Seq(3.0, 294.0, (294 % 256).toDouble, 97.0))
  }

  test("resize downsamples the binary payload by stride, keeping the byte round-trip exact") {
    import spark.implicits._
    val docs = Seq((3L, "abcdefgh")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.asMedia(docs), factor = 3).collect()(0)
    assert(out._1 === 3L)
    assert(new String(out._2, "UTF-8") === "adg")
    assert(out._3 === 3L)
  }

  test("frame sampling strides the payload deterministically") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 130)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.asMedia(docs), stride = 64)
      .orderBy("frame_idx").collect()
    assert(frames.map(r => (r.getInt(1), r.getInt(2))).toSeq === Seq((0, 0), (1, 64), (2, 128)))
  }

  test("REAL codec: PNG encode -> ImageIO decode round-trips the exact bytes (gray8 is lossless)") {
    val bytes = (0 until 300).map(i => (i % 251).toByte).toArray
    val png = Multimodal.encodePng(bytes, width = 64)
    // it is a real PNG file, not a passthrough
    assert(png.take(8).toSeq === Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    val d = Multimodal.decodeImage(png).get
    assert(d.width === 64)
    assert(d.height === 5) // ceil(300/64), final row zero-padded
    assert(d.pixels.take(300).toSeq === bytes.toSeq)
    assert(d.pixels.drop(300).forall(_ == 0))
  }

  test("REAL codec: area-average resize computes block means (hand-checked 4x4 -> 2x2)") {
    val img = Array[Byte](
      10, 20, 30, 40,
      50, 60, 70, 80,
      90, 100, 110, 120,
      (130 & 0xff).toByte, (140 & 0xff).toByte, (150 & 0xff).toByte, (160 & 0xff).toByte)
    val png = Multimodal.encodePng(img, width = 4)
    val small = Multimodal.resizePng(png, factor = 2).get
    val d = Multimodal.decodeImage(small).get
    assert(d.width === 2 && d.height === 2)
    // block means: (10+20+50+60)/4=35, (30+40+70+80)/4=55, (90+100+130+140)/4=115, (110+120+150+160)/4=135
    assert(d.pixels.map(_ & 0xff).toSeq === Seq(35, 55, 115, 135))
  }

  test("REAL codec: undecodable payloads drop out as None / absent rows, decodable survive") {
    import spark.implicits._
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    val good = Multimodal.encodePng("hello world".getBytes, width = 8)
    val media = Seq(
      (1L, good, "image/png", 11L),
      (2L, "garbage".getBytes, "image/png", 7L),
    ).toDF("doc_id", "payload", "modality", "declared_bytes")
    val out = Multimodal.extractImageFeatures(media).collect()
    assert(out.map(_.doc_id).toSeq === Seq(1L))
    assert(out(0).luma_sum === "hello world".getBytes.map(_ & 0xff).sum.toLong)
  }

  test("dHash: brightness/contrast re-encodings land within 2 bits; banding recovers every close pair; shifted content is the documented miss") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.fill(320)((rnd.nextInt(200) + 20).toByte)
    val docs = Seq(1L -> base, 2L -> Array.fill(320)((rnd.nextInt(200) + 20).toByte))
      .map { case (id, b) => (id, Multimodal.encodePng(b, width = 64), "image/png", b.length.toLong) }
      .toDF("doc_id", "payload", "modality", "declared_bytes")
    val corpus = Multimodal.withContrastVariants(docs, mulNum = 3, mulDen = 2, idOffset = 100L)
    val hashes = Multimodal.imageDHash(corpus).collect().map(h => h.img_id -> h).toMap
    assert(hashes.keySet === Set(1L, 2L, 101L, 102L))
    def hamming(a: Multimodal.ImageHash, b: Multimodal.ImageHash): Long =
      java.lang.Long.bitCount(a.b0 ^ b.b0) + java.lang.Long.bitCount(a.b1 ^ b.b1) +
        java.lang.Long.bitCount(a.b2 ^ b.b2) + java.lang.Long.bitCount(a.b3 ^ b.b3)
    assert(hamming(hashes(1L), hashes(101L)) <= 3,
      "monotone remap preserves gradient signs up to truncation ties (within the banding radius)")
    assert(hamming(hashes(1L), hashes(2L)) > 10, "unrelated noise images stay far apart")
    val pairs = Multimodal.phashNearDups(Multimodal.imageDHash(corpus).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 101L)), s"variant pair must surface through the band join: $pairs")
    // banding is LOSSLESS at radius 3 (pigeonhole): the band join must
    // equal a brute-force hamming join over the same hashes exactly —
    // iid noise (doc 2) may flip 4+ near-tie gradients under the remap,
    // in which case BOTH joins drop it; what may never happen is the
    // band join missing a pair the brute join keeps
    val all = hashes.values.toSeq
    val brute = (for { a <- all; b <- all if a.img_id < b.img_id && hamming(a, b) <= 3 }
      yield (a.img_id, b.img_id)).toSet
    assert(pairs === brute)
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(Multimodal.imageDHash(corpus).toDF(), maxHamming = 4)
    }
    assert(e.getMessage.contains("recall"), e.getMessage)
  }

  test("audio activity: hand-computed frames — a loud and a silent window split exactly at the cross-multiplied floor") {
    import spark.implicits._
    // 4 frames of 4 samples: loud(100), quiet(10), exactly-at-floor, ragged tail
    val samples = Array[Short](100, 100, 100, 100, 10, 10, 10, 10, 70, 70, 70, 70, 100, 100)
    val wav = Multimodal.encodeWav(samples, sampleRate = 8000)
    val media = Seq((7L, wav, "audio/wav", samples.length.toLong))
      .toDF("doc_id", "payload", "modality", "declared_bytes")
    // floor 4900: frame mean-squares are 10000, 100, 4900 (boundary: NOT
    // active, strict >), and the 2-sample tail 10000
    val out = Multimodal.extractAudioActivity(media, frameLen = 4, meanSqFloor = 4900L).collect()
    assert(out.length === 1)
    val a = out.head
    assert(a.n_frames === 4L)
    assert(a.n_active === 2L, "boundary frame at exactly the floor stays silent (strict >)")
    assert(a.total_energy === (4 * 10000 + 4 * 100 + 4 * 4900 + 2 * 10000).toLong)
    assert(a.peak_energy === 40000L)
    assert(a.silence_ratio === 0.5)
  }

  test("REAL codec: WAV encode -> javax.sound decode round-trips exact 16-bit samples") {
    // full dynamic range, including negatives and the endpoints
    val samples = Array[Short](0, 1, -1, 255, 256, -256, Short.MaxValue, Short.MinValue, 12345, -12345)
    val wav = Multimodal.encodeWav(samples, sampleRate = 8000)
    // it is a real RIFF/WAVE file, not a passthrough
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val d = Multimodal.decodeWav(wav).get
    assert(d.sampleRate === 8000)
    assert(d.samples.toSeq === samples.toSeq)
  }

  test("REAL codec: stereo WAV decodes to channel 0; undecodable audio drops out as None") {
    // hand-build a stereo 16-bit PCM WAV through the same JDK writer
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val l = Array[Short](100, 200, 300)
    val r = Array[Short](-7, -8, -9)
    val bytes = new Array[Byte](l.length * 4)
    for (i <- l.indices) {
      bytes(4 * i) = (l(i) & 0xff).toByte; bytes(4 * i + 1) = ((l(i) >> 8) & 0xff).toByte
      bytes(4 * i + 2) = (r(i) & 0xff).toByte; bytes(4 * i + 3) = ((r(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, l.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val d = Multimodal.decodeWav(baos.toByteArray).get
    assert(d.samples.toSeq === l.toSeq)

    import spark.implicits._
    assert(Multimodal.decodeWav("not a wav".getBytes).isEmpty)
    val good = Multimodal.encodeWav(Array[Short](65, 66, 67), sampleRate = 8000)
    val media = Seq(
      (1L, good, "audio/wav", 3L),
      (2L, "garbage".getBytes, "audio/wav", 7L),
    ).toDF("doc_id", "payload", "modality", "declared_bytes")
    val out = Multimodal.extractAudioFeatures(media).collect()
    assert(out.map(_.doc_id).toSeq === Seq(1L))
    assert(out(0).sample_sum === (65 + 66 + 67).toLong)
    assert(out(0).head_sample === 65L)
  }

  test("encodeWav is BIT-IDENTICAL to the javax.sound writer (the direct RIFF form replaced it for the AudioSystem global lock)") {
    import javax.sound.sampled._
    def jdkWav(samples: Array[Short], rate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val cases = Seq(
      (Array[Short](), 8000),
      (Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue), 8000),
      (Array.tabulate[Short](1000)(i => ((i * 37) % 65536 - 32768).toShort), 16000),
      (Array[Short](65, 66, 67), 44100))
    cases.foreach { case (s, r) =>
      val ours = Multimodal.encodeWav(s, r)
      val jdks = jdkWav(s, r)
      assert(ours.toSeq == jdks.toSeq,
        s"RIFF bytes diverged from javax.sound for n=${s.length} rate=$r")
      // and the REAL javax.sound reader round-trips our bytes exactly
      val dec = Multimodal.decodeWav(ours).get
      assert(dec.samples.toSeq == s.toSeq && dec.sampleRate == r)
    }
  }

  test("REAL codec: multi-frame GIF round-trips every byte value 0..255 exactly (indexed gray is lossless)") {
    // 2 frames x 128 bytes covering the full byte range
    val f0 = Array.tabulate[Byte](128)(i => i.toByte)
    val f1 = Array.tabulate[Byte](128)(i => (i + 128).toByte)
    val gif = Multimodal.encodeGif(Seq(f0, f1), width = 16)
    // it is a real GIF container, not a passthrough
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"), gif.take(6).toSeq)
    val v = Multimodal.decodeGif(gif).get
    assert(v.frames.length === 2)
    assert(v.frames(0).width === 16 && v.frames(0).height === 8)
    assert(v.frames(0).pixels.toSeq === f0.toSeq)
    assert(v.frames(1).pixels.toSeq === f1.toSeq)
  }

  test("video transcode: temporal downsample keeps every k-th frame, spatial resize computes block means") {
    // 4 frames of 16x8; transcode every=2, factor=2 -> frames 0,2 at 8x4,
    // zero-padded to the codec's reliable 5-row minimum on re-encode
    val f = (0 until 4).map(k => Array.tabulate[Byte](128)(i => ((k * 40 + i) % 256).toByte))
    val gif = Multimodal.encodeGif(f, width = 16)
    val out = Multimodal.transcodeGif(gif, every = 2, factor = 2).get
    val v = Multimodal.decodeGif(out).get
    assert(v.frames.length === 2)
    assert(v.frames.forall(d => d.width === 8 && d.height === 5))
    def blockMeans(src: Array[Byte]): Seq[Int] =
      (for (oy <- 0 until 4; ox <- 0 until 8) yield {
        val vals = for (dy <- 0 until 2; dx <- 0 until 2)
          yield src((oy * 2 + dy) * 16 + ox * 2 + dx) & 0xff
        vals.sum / 4
      })
    Seq(0, 1).foreach { i =>
      val want = blockMeans(f(i * 2)) ++ Seq.fill(8)(0) // content rows + zero pad row
      assert(v.frames(i).pixels.map(_ & 0xff).toSeq === want, s"frame $i")
    }
    assert(Multimodal.transcodeGif("junk".getBytes, 2, 2).isEmpty)
  }

  test("GIF codec: frames below the JDK-reliable 5-row minimum are zero-padded, content bytes exact") {
    val tiny = Array[Byte](2, 4, 10, 12) // 2x2
    val d = Multimodal.decodeGif(Multimodal.encodeGif(Seq(tiny), width = 2)).get
    assert(d.frames(0).width === 2 && d.frames(0).height === 5)
    assert(d.frames(0).pixels.map(_ & 0xff).toSeq === Seq(2, 4, 10, 12, 0, 0, 0, 0, 0, 0))
  }

  test("video frame sampling: every 2nd frame's luma counted, all frames counted, undecodable drops out") {
    import spark.implicits._
    // 5 frames of 128 bytes -> samples frames 0,2,4
    val text = ('a' to 'z').mkString * 25 // 650 chars -> ceil(650/128) = 6 frames
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val media = Multimodal.asGifVideo(docs, frameW = 16, frameH = 8)
    val out = Multimodal.extractVideoFeatures(media, every = 2).collect()(0)
    val bytes = text.getBytes("UTF-8")
    assert(out.n_frames === 6L) // ceil(650/128)
    assert(out.n_sampled === 3L) // frames 0, 2, 4
    val expected = Seq(0, 2, 4).map { f =>
      bytes.slice(f * 128, math.min((f + 1) * 128, bytes.length)).map(_ & 0xff).sum.toLong
    }.sum
    assert(out.luma_sum === expected)
    assert(out.head_luma === 'a'.toLong)

    val bad = Seq((2L, "not a gif".getBytes, "video/gif", 9L))
      .toDF("doc_id", "payload", "modality", "declared_bytes")
    assert(Multimodal.extractVideoFeatures(bad).collect().isEmpty)
  }
}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.TimeSeries

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("rollingCorr: ±1 on linear series, constant series dropped, partial frames dropped") {
    val days = (1 to 10).map(i => java.sql.Date.valueOf(f"2024-01-$i%02d"))
    def dec(v: Double) = new java.math.BigDecimal(v).setScale(2)
    // y = 2x (corr +1); z = -x (corr -1); c constant (zero variance)
    val rows = days.zipWithIndex.map { case (d, i) =>
      (d, dec(i + 1.0), dec(2.0 * (i + 1)), dec(-(i + 1.0)), dec(5.0)) }
    val df = rows.toDF("day", "x", "y", "z", "c")
      .selectExpr("day", "CAST(x AS DECIMAL(18,2)) AS x", "CAST(y AS DECIMAL(18,2)) AS y",
        "CAST(z AS DECIMAL(18,2)) AS z", "CAST(c AS DECIMAL(18,2)) AS c")
    import graft.operators.TimeSeries
    val up = TimeSeries.rollingCorr(df, "day", "x", "y", window = 4)
      .collect().map(r => r.getDate(0) -> r.getDouble(2)).toMap
    assert(up.size === 7, "first 3 days have partial frames")
    assert(up.values.forall(v => math.abs(v - 1.0) < 1e-12), up.toString)
    val dn = TimeSeries.rollingCorr(df, "day", "x", "z", window = 4)
      .collect().map(_.getDouble(2))
    assert(dn.length === 7 && dn.forall(v => math.abs(v + 1.0) < 1e-12), dn.toSeq.toString)
    assert(TimeSeries.rollingCorr(df, "day", "x", "c", window = 4).count() === 0L,
      "zero-variance frames are dropped, not NaN")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.rollingCorr(df.withColumn("x", col("x").cast("double")), "day", "x", "y")
    }
    assert(e.getMessage.contains("DECIMAL"), e.getMessage)
  }

  test("cusum: exact fold vs a driver-side reference; bit-identical under repartitioning") {
    def tm(m: Int) = new java.sql.Timestamp(t("2020-01-01 00:00:00").getTime + m * 60000L)
    // user 1: level shift upward halfway; user 2: flat
    val vals1 = Seq(1.0, 2.0, 1.0, 2.0, 8.0, 9.0, 8.0, 9.0)
    val vals2 = Seq(5.0, 5.0, 5.0)
    val rows = vals1.zipWithIndex.map { case (v, i) => (1L, tm(i), i.toLong, v) } ++
      vals2.zipWithIndex.map { case (v, i) => (2L, tm(i), i.toLong, v) }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def reference(vs: Seq[Double]): (Double, Double, Double) = {
      // mirror the engine: mu = decimal(30,2) exact sum / n (values are
      // 2-decimal already, so plain sum is the same here)
      val mu = vs.sum / vs.size
      var (s, mx) = (0.0, 0.0)
      vs.foreach { v => s = math.max(s + v - mu, 0.0); mx = math.max(mx, s) }
      (mu, s, mx)
    }
    for (d <- Seq(df, df.repartition(7))) {
      val got = TimeSeries.cusum(d, "user_id", Seq("ts", "event_id"), "value")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      val (mu1, s1, mx1) = reference(vals1)
      val (mu2, s2, mx2) = reference(vals2)
      assert(got(1L) === ((vals1.size.toLong, mu1, s1, mx1)), got(1L).toString)
      assert(got(2L) === ((vals2.size.toLong, mu2, s2, mx2)), got(2L).toString)
    }
  }

  test("gapFillLocf: LWW under duplicate ts, on-grid inclusive, leading nulls, carry across gaps") {
    val events = Seq(
      // key a: duplicate ts -> seq 2 wins; 12:00 lands exactly ON a grid instant
      ("a", t("2024-01-01 10:30:00"), 1.0, 1L),
      ("a", t("2024-01-01 10:30:00"), 2.0, 2L),
      ("a", t("2024-01-01 12:00:00"), 5.0, 3L),
      // key b: single observation after its own truncated grid start
      ("b", t("2024-01-01 09:15:00"), 7.0, 4L),
    ).toDF("k", "ts", "v", "seq")
    val out = TimeSeries.gapFillLocf(events, "k", "ts", "v", "seq")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out === Set(
      ("a", "2024-01-01 10:00:00.0", None), // before first observation
      ("a", "2024-01-01 11:00:00.0", Some(2.0)), // LWW of the 10:30 duplicates
      ("a", "2024-01-01 12:00:00.0", Some(5.0)), // on-grid observation is visible (ts <= grid)
      ("b", "2024-01-01 09:00:00.0", None), // grid start precedes the only observation
    ))
  }

  test("gapFillLocf: a NULL observation carries NULL, matching ASOF left-join semantics") {
    // 10:30 observes null; 11:00/12:00 grid points must see THAT null,
    // not skip back to 09:30's 1.0 (observation presence, not value
    // non-nullness, drives the carry)
    val events = Seq(
      ("a", t("2024-01-01 09:30:00"), Some(1.0), 1L),
      ("a", t("2024-01-01 10:30:00"), None: Option[Double], 2L),
      ("a", t("2024-01-01 12:30:00"), Some(3.0), 3L),
    ).toDF("k", "ts", "v", "seq")
    val out = TimeSeries.gapFillLocf(events, "k", "ts", "v", "seq")
      .collect()
      .map(r => (r.getTimestamp(1).toString, Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out === Set(
      ("2024-01-01 09:00:00.0", None), // before first observation
      ("2024-01-01 10:00:00.0", Some(1.0)),
      ("2024-01-01 11:00:00.0", None), // carried from the 10:30 null observation
      ("2024-01-01 12:00:00.0", None),
    ))
  }

  test("gapFillLocf: finer steps interpolate the same carried values, never recompute") {
    val events = Seq(
      ("a", t("2024-01-01 10:30:00"), 2.0, 1L),
      ("a", t("2024-01-01 12:00:00"), 5.0, 2L),
    ).toDF("k", "ts", "v", "seq")
    val out = TimeSeries.gapFillLocf(events, "k", "ts", "v", "seq", step = "30 minutes")
      .collect()
      .map(r => (r.getTimestamp(1).toString, Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out === Set(
      ("2024-01-01 10:00:00.0", None),
      ("2024-01-01 10:30:00.0", Some(2.0)), // inclusive
      ("2024-01-01 11:00:00.0", Some(2.0)),
      ("2024-01-01 11:30:00.0", Some(2.0)),
      ("2024-01-01 12:00:00.0", Some(5.0)),
    ))
  }
}

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2History: LWW dup timestamps, no-op runs collapse, intervals chain, last version open") {
    val log = Seq(
      // key a: 10:00 has two writes (seq 2 wins -> 5.0); 11:00 repeats
      // 5.0 (no-op, collapses); 12:00 changes to 7.0
      ("a", t("2024-01-01 10:00:00"), 1.0, 1L),
      ("a", t("2024-01-01 10:00:00"), 5.0, 2L),
      ("a", t("2024-01-01 11:00:00"), 5.0, 3L),
      ("a", t("2024-01-01 12:00:00"), 7.0, 4L),
      // key b: single change -> one open version
      ("b", t("2024-01-01 09:00:00"), 2.0, 5L),
    ).toDF("k", "ts", "v", "seq")
    val out = graft.operators.Cdc.scd2History(log, "k", "ts", "v", "seq")
      .orderBy("k", "version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).toString, Option(r.getTimestamp(4)).map(_.toString), r.getBoolean(5)))
      .toSeq
    assert(out === Seq(
      ("a", 1L, 5.0, "2024-01-01 10:00:00.0", Some("2024-01-01 12:00:00.0"), false),
      ("a", 2L, 7.0, "2024-01-01 12:00:00.0", None, true),
      ("b", 1L, 2.0, "2024-01-01 09:00:00.0", None, true),
    ))
    // intervals tile: version n's valid_to is version n+1's valid_from —
    // holds by construction over the collapsed rows (checked above: the
    // 11:00 no-op never opens an interval, so v1 runs 10:00 -> 12:00)
  }

  test("scd2History: a transition TO null opens a version; null runs collapse (null-safe compare)") {
    val log = Seq(
      ("a", t("2024-01-01 10:00:00"), Some(5.0), 1L),
      ("a", t("2024-01-01 11:00:00"), None: Option[Double], 2L), // change to null -> opens v2
      ("a", t("2024-01-01 12:00:00"), None: Option[Double], 3L), // null no-op -> collapses
      ("a", t("2024-01-01 13:00:00"), Some(5.0), 4L), // back to 5.0 -> opens v3
    ).toDF("k", "ts", "v", "seq")
    val out = graft.operators.Cdc.scd2History(log, "k", "ts", "v", "seq")
      .orderBy("version").collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
      .toSeq
    assert(out === Seq(
      (1L, Some(5.0), false),
      (2L, None, false), // the null version exists and closes v1
      (3L, Some(5.0), true),
    ))
  }

  test("snapshotDiff: added/removed/changed classified; identical rows absent; nulls compare null-safe") {
    val a = Seq((1L, Some("x"), 1.0), (2L, Some("y"), 2.0), (3L, None: Option[String], 3.0), (4L, Some("z"), 4.0))
      .toDF("k", "s", "v")
    val b = Seq((1L, Some("x"), 1.0), (2L, Some("Y"), 2.0), (3L, None: Option[String], 3.0), (5L, Some("w"), 5.0))
      .toDF("k", "s", "v")
    val out = graft.operators.Cdc.snapshotDiff(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 identical -> absent; 3 identical incl. null payload -> absent
    assert(out === Map(2L -> "changed", 4L -> "removed", 5L -> "added"))
    // null payload vs value: changed, not a false match
    val b2 = Seq((3L, Some("now-set"), 3.0)).toDF("k", "s", "v")
    val d2 = graft.operators.Cdc.snapshotDiff(a.filter("k = 3"), b2, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2 === Map(3L -> "changed"))
  }

  test("pointInTime: facts see the version open AT their ts (inclusive); pre-history facts carry nulls") {
    val dim = Seq(
      ("a", t("2024-01-01 10:00:00"), 1L, 5.0),
      ("a", t("2024-01-01 12:00:00"), 2L, 7.0),
    ).toDF("k", "vfrom", "ver", "dv")
    val facts = Seq(
      (100L, "a", t("2024-01-01 09:00:00")), // before first version -> nulls
      (101L, "a", t("2024-01-01 10:00:00")), // exactly at open -> v1 (inclusive)
      (102L, "a", t("2024-01-01 11:59:59")), // between -> v1
      (103L, "a", t("2024-01-01 12:00:00")), // at v2 open -> v2
      (104L, "a", t("2024-01-01 23:00:00")), // after last -> v2
    ).toDF("fid", "k", "fts")
    val out = graft.operators.Cdc.pointInTime(facts, dim, "k", "fts", "vfrom")
      .orderBy("fid").collect()
      .map(r => (r.getLong(r.fieldIndex("fid")),
        if (r.isNullAt(r.fieldIndex("ver"))) None else Some(r.getLong(r.fieldIndex("ver")))))
      .toSeq
    assert(out === Seq(
      (100L, None), (101L, Some(1L)), (102L, Some(1L)), (103L, Some(2L)), (104L, Some(2L))))
  }

  test("pointInTime: a version is carried atomically — its NULL payload stays NULL, fields never stitch") {
    // v2 has dv = null but note = 'n2'. A fact at v2 must see (null, n2) —
    // NOT inherit v1's 5.0 for dv while taking v2's note (per-column
    // carry would stitch fields from two different versions).
    val dim = Seq(
      ("a", t("2024-01-01 10:00:00"), 1L, Some(5.0), Some("n1")),
      ("a", t("2024-01-01 12:00:00"), 2L, None: Option[Double], Some("n2")),
      ("a", t("2024-01-01 14:00:00"), 3L, Some(9.0), None: Option[String]),
    ).toDF("k", "vfrom", "ver", "dv", "note")
    val facts = Seq(
      (100L, "a", t("2024-01-01 11:00:00")), // v1 -> (5.0, n1)
      (101L, "a", t("2024-01-01 13:00:00")), // v2 -> (null, n2): dv NOT inherited from v1
      (102L, "a", t("2024-01-01 15:00:00")), // v3 -> (9.0, null): note NOT inherited from v2
    ).toDF("fid", "k", "fts")
    val out = graft.operators.Cdc.pointInTime(facts, dim, "k", "fts", "vfrom")
      .orderBy("fid").collect()
      .map(r => (r.getLong(r.fieldIndex("fid")),
        r.getLong(r.fieldIndex("ver")),
        if (r.isNullAt(r.fieldIndex("dv"))) None else Some(r.getDouble(r.fieldIndex("dv"))),
        Option(r.getAs[String]("note"))))
      .toSeq
    assert(out === Seq(
      (100L, 1L, Some(5.0), Some("n1")),
      (101L, 2L, None, Some("n2")),
      (102L, 3L, Some(9.0), None)))
  }
}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel fold: stages advance only in exact order; early/late/repeat events don't") {
    // mirror of q87's fold over hand-ordered codes
    def stage(types: Seq[String]): Long = {
      val df = types.zipWithIndex
        .map { case (t, i) => (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), i.toLong, t) }
        .toDF("user_id", "ts", "event_id", "event_type")
      df.selectExpr("user_id", "ts", "event_id",
        "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END AS code")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.expr(
          """CAST(aggregate(
             transform(sort_array(collect_list(struct(ts, event_id, code))), fe -> fe.code),
             0, (fa, fc) -> CASE WHEN fc = fa + 1 THEN fa + 1 ELSE fa END) AS BIGINT)""").as("s"))
        .collect()(0).getLong(1)
    }
    assert(stage(Seq("view", "click", "purchase")) === 3L)
    assert(stage(Seq("click", "view", "purchase")) === 1L) // click before view doesn't count
    assert(stage(Seq("view", "purchase", "click", "purchase")) === 3L) // early purchase ignored, later one lands
    assert(stage(Seq("view", "view", "click")) === 2L) // repeats don't regress or double-advance
    assert(stage(Seq("purchase")) === 0L)
    assert(stage(Seq("other", "view")) === 1L)
  }

  test("sessionPaths: gap splits sessions, step cap truncates, counts and tie-order exact") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1, session A: a>b ; 40-min gap ; session B: a>b
      (1L, t("2024-01-01 10:00:00"), 1L, "a"), (1L, t("2024-01-01 10:10:00"), 2L, "b"),
      (1L, t("2024-01-01 11:00:00"), 3L, "a"), (1L, t("2024-01-01 11:05:00"), 4L, "b"),
      // user 2, one session: a>b (same path as user 1's)
      (2L, t("2024-01-01 09:00:00"), 5L, "a"), (2L, t("2024-01-01 09:01:00"), 6L, "b"),
      // user 3: 5 events but maxSteps=3 -> truncated path c>c>c
      (3L, t("2024-01-01 09:00:00"), 7L, "c"), (3L, t("2024-01-01 09:01:00"), 8L, "c"),
      (3L, t("2024-01-01 09:02:00"), 9L, "c"), (3L, t("2024-01-01 09:03:00"), 10L, "c"),
      (3L, t("2024-01-01 09:04:00"), 11L, "c"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Funnel.sessionPaths(rows, "user_id", "ts", "event_id", "event_type",
      maxSteps = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a>b", 3L), ("c>c>c", 1L)), got.toSeq.toString)
    // exactly-30-min gap does NOT split (strict > contract)
    val edge = Seq(
      (9L, t("2024-01-01 10:00:00"), 20L, "x"), (9L, t("2024-01-01 10:30:00"), 21L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val g2 = graft.operators.Funnel.sessionPaths(edge, "user_id", "ts", "event_id", "event_type")
      .collect().map(_.getString(0))
    assert(g2.toSeq === Seq("x>y"))
  }
}

class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.GlobalOrder

  test("global_pos is the exact row_number of (md5, id) order; shard is round-robin; bucket width doesn't matter") {
    val df = (1L to 3000L).toDF("id").repartition(7)
    val expected = df.withColumn("k", md5($"id".cast("string")))
      .orderBy("k", "id").collect().map(_.getLong(0)).toSeq
    for (bucketChars <- Seq(1, 2)) {
      val out = GlobalOrder.shuffleShard(df, "id", nshards = 8, bucketChars = bucketChars)
        .select("id", "global_pos", "shard").collect()
      assert(out.length === 3000)
      val byPos = out.sortBy(_.getLong(1))
      assert(byPos.map(_.getLong(1)).toSeq === (0L until 3000L), "dense 0-based index")
      assert(byPos.map(_.getLong(0)).toSeq === expected, s"order mismatch at bucketChars=$bucketChars")
      assert(out.forall(r => r.getLong(2) === r.getLong(1) % 8), "round-robin shard")
    }
  }

  test("shards are balanced to within one row (round-robin over a dense index)") {
    val df = (1L to 1001L).toDF("id")
    val sizes = GlobalOrder.shuffleShard(df, "id", nshards = 8)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1L, sizes.toSeq)
  }
}

class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bucketized overlap join: containment, touching endpoints, multi-bucket pairs once, disjoint excluded") {
    val iv = Seq(
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 09:00:00")), // spans 8 hour-buckets
      (2L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:30:00")), // contained in 1
      (3L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")), // touches 1's end exactly
      (4L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // disjoint from all
    ).toDF("id", "s", "e")
    val out = graft.operators.TimeSeries.intervalOverlaps(iv, "id", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L)), s"pair set wrong: $out")
    assert(out((1L, 2L)) === 5400000000L, "containment overlap = the contained interval (1.5 h)")
    assert(out((1L, 3L)) === 0L, "touching closed endpoints overlap with length 0")
    // the (1,2) pair shares buckets 3 and 4 — emitted exactly once (no
    // double rows), which the Map build above would not catch
    val rows = graft.operators.TimeSeries.intervalOverlaps(iv, "id", "s", "e").count()
    assert(rows === 2L, "each pair exactly once despite shared buckets")
    // carry columns ride along suffixed
    val carried = graft.operators.TimeSeries.intervalOverlaps(
      iv.withColumn("who", concat(lit("u"), col("id"))), "id", "s", "e", carry = Seq("who"))
    assert(carried.columns.toSeq === Seq("id_a", "id_b", "who_a", "who_b", "overlap_us"))
  }

  test("runaway-interval guard: a span of > maxBucketsPerInterval buckets fails fast, not OOM") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00")), // 60 days
      (2L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")),
    ).toDF("id", "s", "e")
    val e = intercept[Exception] {
      // 1-second buckets x 60 days = ~5.2M buckets > the 1000 cap
      graft.operators.TimeSeries.intervalOverlaps(iv, "id", "s", "e",
        bucketMicros = 1000000L, maxBucketsPerInterval = 1000).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("raise bucketMicros"),
      s"unexpected error: ${e.getMessage}")
    // same data at day buckets sails through
    val ok = graft.operators.TimeSeries.intervalOverlaps(iv, "id", "s", "e",
      bucketMicros = 86400000000L).count()
    assert(ok === 1L)
  }

  test("fuzz: overlap pairs equal the naive quadratic join at every bucket width") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    // 120 random intervals, lengths from seconds to ~2 days, over a week
    val ivs = (1L to 120L).map { i =>
      val s = base + rnd.nextInt(7 * 24 * 3600) * 1000L
      val len = rnd.nextInt(3) match {
        case 0 => rnd.nextInt(60)             // seconds
        case 1 => rnd.nextInt(12 * 3600)      // up to half a day
        case _ => rnd.nextInt(2 * 24 * 3600)  // up to two days
      }
      (i, new java.sql.Timestamp(s), new java.sql.Timestamp(s + len * 1000L))
    }
    val df = ivs.toDF("id", "s", "e")
    val naive = (for {
      (ia, sa, ea) <- ivs; (ib, sb, eb) <- ivs
      if ia < ib && sa.getTime <= eb.getTime && sb.getTime <= ea.getTime
    } yield ((ia, ib), (math.min(ea.getTime, eb.getTime) - math.max(sa.getTime, sb.getTime)) * 1000L))
      .toMap
    assert(naive.nonEmpty, "fuzz corpus must actually overlap")
    for (bucket <- Seq(1000000L, 3600000000L, 86400000000L)) { // 1 s, 1 h, 1 d
      // 2-day intervals at 1 s buckets legitimately exceed the default
      // runaway cap — raise it; the guard has its own spec
      val got = graft.operators.TimeSeries.intervalOverlaps(df, "id", "s", "e",
          bucketMicros = bucket, maxBucketsPerInterval = 1 << 20)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === naive, s"bucketMicros=$bucket must not change the result")
    }
  }
}

class UniNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("s").selectExpr(s"graft_uninorm(s, '$form') AS n").collect()(0).getString(0)

  test("NFC composes decomposed sequences; NFD decomposes; NFKC folds compatibility forms") {
    assert(norm("é", "NFC") === "é") // e + combining acute -> é
    assert(norm("é", "NFD") === "é")
    assert(norm("ﬁ", "NFKC") === "fi") // ﬁ ligature
    assert(norm("①", "NFKC") === "1") // circled one
    assert(norm("", "NFC") === "")
    assert(norm("plain ascii 123", "NFC") === "plain ascii 123")
  }

  test("composed and decomposed encodings of the same visible text dedup together after NFC") {
    val docs = Seq((1L, "café au lait"), (2L, "café au lait")).toDF("id", "text")
    val canon = docs.selectExpr("graft_uninorm(text, 'NFC') AS t").distinct().count()
    assert(canon === 1L)
    assert(docs.selectExpr("text").distinct().count() === 2L)
  }

  test("null text -> null; invalid form and non-literal form rejected at analysis time") {
    val out = Seq(Tuple1(null: String)).toDF("s")
      .selectExpr("graft_uninorm(s, 'NFC') AS n").collect()(0)
    assert(out.isNullAt(0))
    val e1 = intercept[Exception] {
      Seq(Tuple1("x")).toDF("s").selectExpr("graft_uninorm(s, 'NFX')").collect()
    }
    assert(e1.getMessage.contains("NFKC") || e1.getMessage.toLowerCase.contains("uninorm"), e1.getMessage)
    val e2 = intercept[Exception] {
      Seq(("x", "NFC")).toDF("s", "f").selectExpr("graft_uninorm(s, f)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal") || e2.getMessage.toLowerCase.contains("uninorm"), e2.getMessage)
  }

  test("matches java.text.Normalizer on corpus text (interpreted and codegen'd paths agree)") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents.limit(50)
    val rows = docs.selectExpr("text", "graft_uninorm(text, 'NFKC') AS n").collect()
    rows.foreach { r =>
      assert(r.getString(1) === java.text.Normalizer.normalize(r.getString(0), java.text.Normalizer.Form.NFKC))
    }
  }
}

class CoreSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("Sorting.projected produces exactly orderBy's row order, keys first to last") {
    val base = (1L to 2000L).map(i => (i * 7919 % 1999, i)).toDF("k", "i")
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("h", md5(concat_ws(":", $"k", $"i")))
    val viaOrderBy = proj(base).orderBy("k", "i").collect().toSeq
    val projected = graft.Sorting.projected(base, col("k"), col("i"))(proj)
    assert(projected.collect().toSeq === viaOrderBy)
    // a base under the single-core threshold must take the
    // exchange-free path: ONE partition, locally sorted — row-wise
    // projection preserves the order
    assert(base.queryExecution.optimizedPlan.stats.sizeInBytes <=
      graft.Sorting.singleCoreBytes,
      "test setup: the base must sit under the single-core threshold")
    assert(projected.rdd.getNumPartitions == 1,
      "a tiny base must sort without a range exchange")
  }

  test("Sorting.projected wide path: a big base fans out and still matches orderBy") {
    // ~10 MB of planning-time bytes: well past the single-core
    // threshold, so the range-partitioned parallel path engages
    val base = spark.range(120000L)
      .selectExpr("id * 7919 % 4999 AS k", "id AS i",
        "repeat('x', 80) AS pad")
    assert(base.queryExecution.optimizedPlan.stats.sizeInBytes > (2L << 20),
      "test setup: the base must exceed the single-core threshold")
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("h", md5(concat_ws(":", $"k", $"i")))
    val projected = graft.Sorting.projected(base, col("k"), col("i"))(proj)
    assert(projected.rdd.getNumPartitions > 1,
      "a big base must range-partition the projection across cores")
    assert(projected.select("k", "i", "h").collect().toSeq ===
      proj(base).orderBy("k", "i").select("k", "i", "h").collect().toSeq)
  }

  test("Tables.invalidate drops the cached listing so a rewritten dir is re-read") {
    val dir = tmpDir("tables_inval").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/region.parquet")
    val t = Tables(spark, dir)
    assert(t.region.count() === 1L)
    // in-place rewrite: the cached handle would serve the stale listing
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Tables.invalidate(dir)
    assert(Tables(spark, dir).region.count() === 2L)
  }

  test("TopFrequent: bounds contain exact counts, above-Σeps keys always surface, truncation is real") {
    // adversarial spread: key 777 appears 3x in EVERY one of 12 shards —
    // never in a shard's top-2 (locals 4x+), but its total (36) beats
    // every local key's total (each local key lives in ONE shard)
    val rows =
      (0 until 12).flatMap { s =>
        Seq.fill(3)((s, 777L)) ++                          // the hidden heavy hitter
          (0 until 6).flatMap(j => Seq.fill(4 + j)((s, (s * 100 + j).toLong))) // shard-local keys
      }
    val df = rows.toDF("shard", "key")
    val summ = TopFrequent.shardSummaries(df, "shard", "key", c = 2)
    // truncation really dropped keys (eps > 0 on every shard)
    assert(summ.filter($"eps" <= 0L).count() == 0)
    val top = TopFrequent.topK(df, "shard", "key", c = 2, k = 3).collect()
    // every reported bound contains the exact count
    assert(top.forall(_.getAs[Boolean]("bounds_ok")))
    // Σ eps = 12 shards x (largest dropped = 7-count key... ) — key 777's
    // total 36 exceeds any possible Σ-eps hideout only if it surfaces; at
    // c=2 each shard keeps counts {9,8} and drops {7,...,4,3}: eps=7 per
    // shard, Σeps=84 > 36, so 777 may legitimately hide — the HONEST
    // contract is that anything ABOVE Σeps must appear. Make one: key
    // 999 with 8 rows in every shard (total 96 > 84) lands in every
    // shard's top-2 tie region and must be a candidate and rank first.
    val df2 = df.unionByName((0 until 12).flatMap(s => Seq.fill(8)((s, 999L))).toDF("shard", "key"))
    val top2 = TopFrequent.topK(df2, "shard", "key", c = 2, k = 3).collect()
    assert(top2.head.getAs[Long]("key") == 999L && top2.head.getAs[Long]("n") == 96L)
    assert(top2.forall(_.getAs[Boolean]("bounds_ok")))
    // the summary-only estimate ranks by lb and carries sane bounds
    val est = TopFrequent.estimateTopK(df2, "shard", "key", c = 2, k = 3).collect()
    assert(est.head.getAs[Long]("key") == 999L)
    assert(est.forall(r => r.getAs[Long]("lb") <= r.getAs[Long]("ub")))
    // exact top-k parity when nothing can hide: c large enough to keep everything
    val full = TopFrequent.topK(df2, "shard", "key", c = 100, k = 5).collect()
    val plain = df2.groupBy("key").count().orderBy($"count".desc, $"key").limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full.map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"))).toSeq == plain)
    assert(full.forall(r => r.getAs[Long]("lb") == r.getAs[Long]("n")
      && r.getAs[Long]("ub") == r.getAs[Long]("n")))
  }

}
