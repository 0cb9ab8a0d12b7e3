package graft

import graft.api.{TextCuration, VectorSearch}
import org.apache.spark.sql.functions._

/** Specs for the corpus-curation operators behind q65–q69: repetition
  * stats, pattern redaction, decontamination, sequence packing, int8
  * quantization. The catalog entries are oracle-gated at sf0.01; these
  * pin semantics on hand-computable frames with NON-documents column
  * names (API genericity) plus the invariants an oracle can't express
  * (recall vs a naive reference, error bounds, idempotence).
  */
class CurationSpecs extends SparkSpec {
  import spark.implicits._

  // ---- repetitionStats ----------------------------------------------------

  test("repetitionStats: repeated text flags repetitive, diverse text does not, single-token docs drop") {
    val corpus = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"), // 9 bigrams, all "spam spam"
      (2L, "one two three four five six seven eight nine ten"), // all distinct
      (3L, "solo"), // no bigrams -> absent
    ).toDF("pid", "body")
    val out = TextCuration.repetitionStats(corpus, "pid", "body")
      .orderBy("pid").collect()
    assert(out.length === 2)
    val r1 = out(0)
    assert(r1.getLong(1) === 9L)   // n_bigrams
    assert(r1.getLong(2) === 1L)   // n_distinct_bigrams
    assert(r1.getLong(3) === 9L)   // top_bigram_n
    assert(r1.getDouble(4) === 8.0 / 9.0) // dup_bigram_frac
    assert(r1.getDouble(5) === 1.0)       // top_bigram_frac
    assert(r1.getBoolean(6))              // repetitive
    val r2 = out(1)
    assert(r2.getLong(1) === 9L && r2.getLong(2) === 9L && r2.getLong(3) === 1L)
    assert(r2.getDouble(4) === 0.0 && !r2.getBoolean(6))
  }

  // ---- redactPatterns -----------------------------------------------------

  test("redactPatterns: PII classes hit and replace; counts are over the original text; idempotent") {
    val corpus = Seq(
      (1L, "contact bob@example.com or admin@test.org at 10.0.0.1 today"),
      (2L, "nothing sensitive here at all"),
    ).toDF("pid", "body")
    val out = TextCuration.redactPatterns(corpus, "pid", "body").orderBy("pid").collect()
    val r1 = out(0)
    assert(r1.getLong(1) === 2L) // n_email
    assert(r1.getLong(2) === 1L) // n_ipv4
    assert(r1.getString(3) === "contact [EMAIL] or [EMAIL] at [IP] today")
    assert(r1.getBoolean(4)) // changed
    val r2 = out(1)
    assert(r2.getLong(1) === 0L && r2.getLong(2) === 0L && !r2.getBoolean(4))

    // idempotence: redacting the redacted text changes nothing
    val redacted = Seq((1L, r1.getString(3))).toDF("pid", "body")
    val again = TextCuration.redactPatterns(redacted, "pid", "body").collect()(0)
    assert(again.getLong(1) === 0L && again.getLong(2) === 0L && !again.getBoolean(4))
  }

  test("redactPatterns: class order affects only the replacement fold, not the counts") {
    // the IP is inside a string an email pattern could swallow if counts
    // ran on partially-redacted text; both orders must report the same counts
    val corpus = Seq((1L, "x 1.2.3.4 y a@b.co z")).toDF("pid", "body")
    val fwd = TextCuration.redactPatterns(corpus, "pid", "body", TextCuration.PiiPatterns).collect()(0)
    val rev = TextCuration.redactPatterns(corpus, "pid", "body", TextCuration.PiiPatterns.reverse).collect()(0)
    assert(fwd.getLong(1) === 1L && fwd.getLong(2) === 1L)
    // reversed column order: n_ipv4 first
    assert(rev.getLong(1) === 1L && rev.getLong(2) === 1L)
    assert(fwd.getString(3) === rev.getString(3))
  }

  // ---- decontaminate ------------------------------------------------------

  test("decontaminate matches a naive driver-side shingle-intersection reference") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "beta gamma delta unrelated words here"),   // shares "beta gamma delta" with bench 1
      (3L, "totally disjoint content nothing shared at all"),
      (4L, "alpha beta gamma delta epsilon zeta"),     // identical to bench doc 1
    )
    val bench = Seq((10L, "alpha beta gamma delta epsilon zeta"))
    def shingles(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val benchSet = bench.map(b => shingles(b._2)).reduce(_ ++ _)
    val expected = docs.map { case (id, t) => id -> shingles(t).count(benchSet) }.toMap

    val out = TextCuration.decontaminate(
      docs.toDF("pid", "body"), bench.toDF("pid", "body"), "pid", "body")
      .orderBy("pid").collect()
    assert(out.length === 4)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) === expected(id).toLong, s"doc $id overlap")
      assert(r.getBoolean(3) === (expected(id) > 0), s"doc $id flag")
    }
    // sanity on the fixture itself: one full-overlap, one partial, one clean
    assert(expected(4L) === shingles(docs(3)._2).size && expected(2L) === 1 && expected(3L) === 0)
  }

  // ---- packSequences ------------------------------------------------------

  test("packSequences: concat-then-chunk offsets on a hand-computed shard") {
    val docs = Seq(
      (1L, "a", ("t " * 100).trim),  // 100 tokens -> pack 0, offset 0
      (2L, "a", ("t " * 100).trim),  // pack 0, offset 100
      (3L, "a", ("t " * 100).trim),  // starts at 200, spans into pack 1
      (4L, "a", ("t " * 60).trim),   // cum 300 -> pack 1, offset 44
      (5L, "b", ("t " * 10).trim),   // fresh shard: pack 0, offset 0
    ).toDF("pid", "shard", "body")
    val out = TextCuration.packSequences(docs, "pid", "body", "shard", budget = 256L)
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out === Array(
      (1L, 0L, 0L, false),
      (2L, 0L, 100L, false),
      (3L, 0L, 200L, true),
      (4L, 1L, 44L, false),
      (5L, 0L, 0L, false),
    ))
  }

  test("packSequences invariants hold on the sf0.001 documents table") {
    val budget = 256L
    val out = TextCuration.packSequences(
      Tables(spark, "/root/testdata/sf0.001").documents, "doc_id", "text", "source", budget)
    // offset always inside the pack; span flag consistent with offset+len
    assert(out.filter(col("pack_offset") < 0 || col("pack_offset") >= budget).isEmpty)
    assert(out.filter((col("pack_offset") + col("n_tokens") > budget) =!= col("spans_boundary")).isEmpty)
    // pack_id nondecreasing in id order within each shard
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    assert(out.withColumn("prev", lag("pack_id", 1).over(w))
      .filter(col("prev").isNotNull && col("pack_id") < col("prev")).isEmpty)
  }

  // ---- stratifiedSample ---------------------------------------------------

  test("stratifiedSample: rate 0 drops all, 10000 keeps all, samples nest as rates grow") {
    val docs = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("pid", "grp")
    def ids(ratesA: Int, ratesB: Int) =
      TextCuration.stratifiedSample(docs, "pid", "grp", Map("a" -> ratesA, "b" -> ratesB), 0)
        .select("pid").collect().map(_.getLong(0)).toSet
    assert(ids(0, 0).isEmpty)
    assert(ids(10000, 0) === (1L to 400L).filter(_ % 2 == 0).toSet)
    // nesting: every row kept at 2500 bp survives at 5000 bp
    val s25 = ids(2500, 2500); val s50 = ids(5000, 5000)
    assert(s25.subsetOf(s50))
    // roughly proportional (hash uniformity, generous band)
    assert(s50.size > s25.size && s25.size > 20 && s50.size < 350)
    // same salt -> identical; different salt -> different draw
    val again = TextCuration.stratifiedSample(docs, "pid", "grp", Map("a" -> 2500, "b" -> 2500), 0)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(again === s25)
    val salted = TextCuration.stratifiedSample(docs, "pid", "grp", Map("a" -> 2500, "b" -> 2500), 0, salt = "x")
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(salted !== s25)
  }

  // ---- rarityTerms --------------------------------------------------------

  test("rarityTerms: rare terms outrank common ones; ties break on term; k bounds rows") {
    val docs = Seq(
      (1L, "common common common unique1"),
      (2L, "common zz aa"), // aa/zz tie on score 1.0 -> aa first
      (3L, "common"),
    ).toDF("pid", "body")
    val out = TextCuration.rarityTerms(docs, "pid", "body", 2)
      .orderBy("pid", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    // doc 1: unique1 df=1 tf=1 -> score 1.0 beats common tf=3 df=3 -> 1.0... tie!
    // common: tf=3, df=3 -> 1.0; unique1: 1/1 -> 1.0; tie -> 'common' < 'unique1'
    assert(out.filter(_._1 == 1L).map(_._2).toSeq === Seq("common", "unique1"))
    assert(out.filter(_._1 == 2L).map(_._2).toSeq === Seq("aa", "zz"))
    assert(out.filter(_._1 == 3L).map(_._2).toSeq === Seq("common"))
    // df of common is 3 everywhere
    assert(out.filter(_._2 == "common").forall(_._4 == 3L))
  }

  // ---- chunkDocuments -----------------------------------------------------

  test("chunkDocuments: offsets, short tail, full reconstruction at stride == size") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
    ).toDF("pid", "body")
    // size 4, stride 3: starts 0,3,6,9 -> lengths 4,4,4,1
    val out = TextCuration.chunkDocuments(docs, "pid", "body", size = 4, stride = 3)
      .orderBy("pid", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    assert(out.filter(_._1 == 1L).head._5 === "w1 w2 w3 w4")
    assert(out.filter(_._1 == 1L).last._5 === "w10")
    assert(out.filter(_._1 == 2L).map(_._5).toSeq === Seq("only three tokens"))

    // stride == size: chunks partition the doc exactly; concatenation
    // round-trips the original text
    val exact = TextCuration.chunkDocuments(docs, "pid", "body", size = 4, stride = 4)
      .orderBy("pid", "chunk_id").collect()
    val rebuilt = exact.filter(_.getLong(0) == 1L).map(_.getString(4)).mkString(" ")
    assert(rebuilt === (1 to 10).map(i => s"w$i").mkString(" "))
    assert(exact.map(r => r.getLong(3)).sum === 13L) // 10 + 3 tokens total, no overlap
  }

  // ---- histogramMedian ----------------------------------------------------

  test("histogramMedian matches a sort-based reference per group; nulls excluded") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      val g = s"g${i % 3}"
      val v: java.lang.Double = if (i % 50 == 0) null else rnd.nextInt(20).toDouble
      (g, v)
    }
    val out = graft.operators.Stats.histogramMedian(rows.toDF("grp", "v"), Seq("grp"), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val vs = rs.flatMap(r => Option(r._2).map(_.doubleValue)).sorted
      val n = vs.length
      val expMed = (vs((n + 1) / 2 - 1) + vs(n / 2 + 1 - 1)) / 2.0
      assert(out(g) === ((n.toLong, expMed)), s"group $g")
    }
  }

  // ---- mixingRates --------------------------------------------------------

  test("mixingRates: caps at 100%, reports deficit, zero-share strata get rate 0") {
    val docs = Seq(
      ("wiki", 100L), ("wiki", 100L),     // 200 tokens available
      ("crawl", 4000L),                   // 4000 available
      ("spam", 500L),
    ).toDF("src", "n_tok")
    // budget 2000: wiki target 50% = 1000 > 200 available -> capped + deficit;
    // crawl target 50% = 1000 of 4000 -> 2500 bp; spam unlisted -> 0
    val out = TextCuration.mixingRates(docs, "src", "n_tok",
      Map("wiki" -> 5000, "crawl" -> 5000), budgetTokens = 2000L)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out === Array(
      ("crawl", 4000L, 1000L, 2500L, 0L),
      ("spam", 500L, 0L, 0L, 0L),
      ("wiki", 200L, 1000L, 10000L, 800L),
    ))
  }

  // ---- persisted LSH index ------------------------------------------------

  test("lshCandidatesIndexed == full recompute restricted to cross pairs; append extends the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val (corpusA, batchB, batchC) =
      (docs.filter("doc_id % 3 = 1"), docs.filter("doc_id % 3 = 2"), docs.filter("doc_id % 3 = 0"))
    def crossPairs(batchMod: Int, corpusMods: Seq[Int]) =
      TextCuration.minhashCandidates(docs, "doc_id", "text")
        .collect().flatMap { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          // full recompute emits a<b; indexed emits (batch, corpus) —
          // normalize to that orientation
          Seq((a, b), (b, a)).filter { case (x, y) =>
            x % 3 == batchMod && corpusMods.contains((y % 3).toInt) }
            .map { case (x, y) => (x, y, r.getLong(2)) }
        }.toSet

    val idx = tmpDir("lshidx").toString + "/idx"
    TextCuration.buildLshIndex(corpusA, "doc_id", "text", idx)
    val gotB = TextCuration.lshCandidatesIndexed(batchB, "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotB === crossPairs(2, Seq(1)), "batch B vs index(A)")
    assert(gotB.nonEmpty, "fixture must actually produce candidates")

    // accept batch B into the corpus; batch C now dedups against A ∪ B
    TextCuration.appendToLshIndex(batchB, "doc_id", "text", idx)
    val gotC = TextCuration.lshCandidatesIndexed(batchC, "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotC === crossPairs(0, Seq(1, 2)), "batch C vs index(A+B)")

    // schema guard: an index built with a different id column refuses append
    intercept[IllegalArgumentException] {
      TextCuration.appendToLshIndex(
        batchB.withColumnRenamed("doc_id", "other_id"), "other_id", "text", idx)
    }
  }

  // ---- DedupStream --------------------------------------------------------

  test("DedupStream: within-batch and cross-batch near-dups drop; replay is idempotent; e2e via MemoryStream") {
    import graft.streaming.DedupStream
    val base = "the quick brown fox jumps over the lazy dog again and again today it seems"
    val b0 = Seq(
      (1L, base),
      (2L, base + " ok"),                  // near-dup of 1 (est_sim 0.81) -> drops within batch
      (3L, "completely different content with no overlap whatsoever in any shingle at all"),
    )
    val b1 = Seq(
      (4L, base.replace("quick", "slow")), // near-dup of accepted 1 (est_sim 0.94) -> index hit
      (5L, "another entirely unrelated document mentioning nothing similar to previous text"),
    )
    val dir = tmpDir("dedupstream").toString
    val (idx, acc) = (s"$dir/idx", s"$dir/acc")
    def accepted(): Set[Long] =
      spark.read.parquet(acc).select("pid").collect().map(_.getLong(0)).toSet

    DedupStream.processBatch(b0.toDF("pid", "body"), 0L, "pid", "body", idx, acc, 0.5)
    assert(accepted() === Set(1L, 3L))
    DedupStream.processBatch(b1.toDF("pid", "body"), 1L, "pid", "body", idx, acc, 0.5)
    assert(accepted() === Set(1L, 3L, 5L))

    // crash-replay of batch 1: same survivors, same dirs, no duplication
    DedupStream.processBatch(b1.toDF("pid", "body"), 1L, "pid", "body", idx, acc, 0.5)
    assert(accepted() === Set(1L, 3L, 5L))
    assert(spark.read.parquet(acc).count() === 3L)

    // end-to-end through a real streaming query, fresh dirs
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = DedupStream.start(in.toDF().toDF("pid", "body"), "pid", "body",
      s"$dir/idx2", s"$dir/acc2", s"$dir/ckpt",
      threshold = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/acc2").select("pid").collect().map(_.getLong(0)).toSet
      assert(got === Set(1L, 3L, 5L))
    } finally q.stop()
  }

  // ---- quantizeInt8 -------------------------------------------------------

  // ---- dqChecks -----------------------------------------------------------

  test("dqChecks: null/unique/referential violation counts on constructed violations; clean table all zeros") {
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val dirty = Seq(
      (1L, Some("a"), 1L),
      (1L, Some("b"), 2L),  // duplicate id
      (2L, None, 3L),       // null name
      (3L, Some("c"), 9L),  // orphan ref
      (3L, None, 8L),       // duplicate id + null + orphan
    ).toDF("id", "name", "fk")
    val out = graft.operators.Stats.dqChecks(dirty,
      notNull = Seq("name"),
      uniqueKeys = Seq(Seq("id")),
      refs = Seq((Seq("fk"), dim, Seq("dk"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "not_null:name" -> 2L,
      "unique:id" -> 2L, // ids 1 and 3 each have one extra row
      "ref:fk" -> 2L))
    val clean = Seq((1L, Some("a"), 1L), (2L, Some("b"), 2L)).toDF("id", "name", "fk")
    val ok = graft.operators.Stats.dqChecks(clean,
      notNull = Seq("name"), uniqueKeys = Seq(Seq("id")), refs = Seq((Seq("fk"), dim, Seq("dk"))))
      .collect().map(r => r.getLong(1))
    assert(ok.forall(_ === 0L))
  }

  // ---- histogramQuantiles -------------------------------------------------

  test("histogramQuantiles matches a sort-based order-statistic reference per group") {
    val rnd = new scala.util.Random(47)
    val df = (1 to 500).map(i => (if (i % 3 == 0) "g1" else "g2", rnd.nextInt(40).toDouble))
      .toDF("grp", "v")
    val bps = Seq(100, 2500, 5000, 9500, 10000)
    val out = graft.operators.Stats.histogramQuantiles(df, Seq("grp"), "v", bps)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val byGrp = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((g, vs) <- byGrp; bp <- bps) {
      val pos = (vs.length.toLong * bp + 9999) / 10000 // ceil, 1-based
      assert(out((g, bp.toLong)) === vs((pos - 1).toInt), s"group $g bp $bp")
    }
    // p100 is the max, exactly
    assert(out(("g1", 10000L)) === byGrp("g1").last)
  }

  // ---- equiWidthHistogram -------------------------------------------------

  test("equiWidthHistogram: hand-computed buckets, max lands in last bucket, degenerate column collapses") {
    val df = Seq(0.0, 1.0, 2.5, 5.0, 7.5, 10.0).map(Tuple1(_)).toDF("v")
    // min 0, max 10, 4 buckets of width 2.5; x=10 clamps into bucket 3
    val out = graft.operators.Stats.equiWidthHistogram(df, "v", nb = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(out === Seq(
      (0L, 0.0, 2.5, 2L),   // 0.0, 1.0
      (1L, 2.5, 5.0, 1L),   // 2.5
      (2L, 5.0, 7.5, 1L),   // 5.0
      (3L, 7.5, 10.0, 2L),  // 7.5, 10.0 (max clamped)
    ))
    val flat = Seq(3.0, 3.0, 3.0).map(Tuple1(_)).toDF("v")
    val deg = graft.operators.Stats.equiWidthHistogram(flat, "v", nb = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(deg === Seq((0L, 3L)))
    // nulls excluded
    val withNull = Seq(Some(1.0), None, Some(2.0)).map(Tuple1(_)).toDF("v")
    assert(graft.operators.Stats.equiWidthHistogram(withNull, "v", 2)
      .agg(sum("n")).collect()(0).getLong(0) === 2L)
  }

  // ---- phrase index -------------------------------------------------------

  test("phraseSearch: index lookup equals the full-scan reference; token-aligned (no substring false hits)") {
    val docs = Seq(
      (1L, "alpha key hash beta"),
      (2L, "key hash"),
      (3L, "monkey hash value"), // substring 'key hash' but NOT token-aligned
      (4L, "key value hash"),    // both words, wrong order
      (5L, "gamma key hash"),
    ).toDF("pid", "body")
    val tmp = tmpDir("phraseidx").toString
    TextCuration.buildPhraseIndex(docs, "pid", "body", n = 2, path = tmp)
    val hits = TextCuration.phraseSearch(docs, "pid", "body", tmp, "key hash")
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 2L, 5L))
    // reference: padded contains over the full corpus
    val ref = docs.filter("contains(concat(' ', body, ' '), ' key hash ')")
      .collect().map(_.getLong(0)).toSet
    assert(hits === ref)
    // absent phrase -> empty, not an error
    assert(TextCuration.phraseSearch(docs, "pid", "body", tmp, "delta epsilon").count() === 0L)
  }

  // ---- exportCorpus -------------------------------------------------------

  test("exportCorpus layout invariants: dense global order, round-robin shards, per-shard pack arithmetic") {
    val out = TextCuration.exportCorpus(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", "source",
      Map("src0" -> 10000, "src1" -> 0), defaultBp = 5000, salt = "exp1",
      chunkTokens = 64, nshards = 8, packBudget = 256L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    // global positions are a dense 0-based permutation; shard is round-robin
    val pos = out.map(_._4).sorted
    assert(pos.toSeq === (0L until out.length.toLong))
    assert(out.forall(r => r._3 === r._4 % 8))
    // per shard, in position order, pack arithmetic is the running token sum
    out.groupBy(_._3).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._4).foreach { r =>
        assert(r._5 === cum / 256 && r._6 === cum % 256, s"shard $shard pos ${r._4}")
        cum += r._7
      }
    }
    // src1 is sampled out entirely; chunks tile their doc (last may be short)
    val src1Ids = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("source = 'src1'").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !src1Ids.contains(r._1)))
    out.groupBy(_._1).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong))
      assert(sorted.init.forall(_._7 === 64L)) // only the tail chunk may be short
    }
  }

  // ---- capPerDomain -------------------------------------------------------

  test("capPerDomain: top-k per domain by order column desc, id tie-break, rnk exposed") {
    val docs = Seq(
      (1L, "d1", 10L), (2L, "d1", 30L), (3L, "d1", 30L), (4L, "d1", 5L),
      (5L, "d2", 7L),
    ).toDF("pid", "host", "score")
    val out = TextCuration.capPerDomain(docs, "pid", "host", "score", k = 2)
      .select("pid", "host", "rnk").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // d1: score 30 twice -> ids 2 then 3; id 1 (rnk 3) dropped. d2: all kept.
    assert(out === Set((2L, "d1", 1L), (3L, "d1", 2L), (5L, "d2", 1L)))
  }

  // ---- leakageSafeSplit ---------------------------------------------------

  test("leakageSafeSplit: near-dup clusters never straddle splits; a doc-level coin would") {
    // 30 pairs of identical docs (same text => same signatures => same
    // cluster) + 40 singletons; pair members MUST share a split.
    val texts = (0 until 30).map(i =>
      s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima pair$i")
    val docs = (texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 2L, t), (i * 2L + 1L, t))
    } ++ (100L until 140L).map(i =>
      (i, s"unique$i mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"))
    ).toDF("pid", "body")
    val out = TextCuration.leakageSafeSplit(docs, "pid", "body", valBp = 5000, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length === 100)
    // every cluster maps to exactly one split
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._4).distinct).toMap
    assert(perCluster.values.forall(_.length === 1), "a cluster straddles splits")
    // pair members are in the same cluster, hence same split
    for (i <- 0 until 30) {
      val a = out.find(_._1 == i * 2L).get
      val b = out.find(_._1 == i * 2L + 1L).get
      assert(a._2 === b._2 && a._4 === b._4, s"pair $i split apart: $a vs $b")
    }
    // both splits are populated at 50/50
    assert(out.map(_._4).distinct.sorted.toSeq === Seq("train", "val"))
    // and the doc-level coin WOULD have split at least one pair — the
    // failure mode this operator exists to prevent
    val docCoin = docs.selectExpr("pid",
      s"${graft.operators.TextKit.polySpark("concat(CAST(pid AS STRING), ':', 's')")} % 10000 AS c")
      .collect().map(r => r.getLong(0) -> (r.getLong(1) < 5000)).toMap
    val leaky = (0 until 30).exists(i => docCoin(i * 2L) != docCoin(i * 2L + 1L))
    assert(leaky, "doc-level coin happened to agree on every pair; strengthen fixture")
  }

  // ---- lmScore ------------------------------------------------------------

  test("lmScore: hand-computed add-one bigram probabilities; partitioning-independent") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c a")).toDF("pid", "body")
    // bigram counts: "a b"->3, "b a"->1, "c a"->1; contexts: a->3, b->1, c->1; V=3
    val out = TextCuration.lmScore(docs, "pid", "body")
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val pAB = 4.0 / 6.0 // (3+1)/(3+3)
    val pBA = 2.0 / 4.0
    val pCA = 2.0 / 4.0
    val expected = Seq(
      (1L, 3L, pBA, (pAB + pBA + pAB) / 3.0), // fold order: a b, b a, a b
      (2L, 1L, pAB, pAB),
      (3L, 1L, pCA, pCA),
    )
    assert(out === expected)
    // bit-identical under different input partitioning
    val repart = TextCuration.lmScore(docs.repartition(5), "pid", "body")
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(repart === expected)
  }

  test("lmScoreIndexed serves a PERSISTED model bit-identically to the one-shot lmScore") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c a")).toDF("pid", "body")
    val path = tmpDir("lmmodel").resolve("model").toString
    TextCuration.trainBigramLm(docs, "body", path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "n_bigrams", "min_prob", "avg_prob").orderBy("pid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(rows(TextCuration.lmScoreIndexed(docs, "pid", "body", path))
      === rows(TextCuration.lmScore(docs, "pid", "body")))
    // serving a NEW batch against the stored model: only model bigrams
    // score (unseen bigrams drop from the probe join, per the contract)
    val batch = Seq((10L, "a b c a"), (11L, "zz qq")).toDF("pid", "body")
    val served = rows(TextCuration.lmScoreIndexed(batch, "pid", "body", path))
    // doc 10: bigrams "a b"(p=4/6), "b c"(unseen, drops), "c a"(p=2/4)
    assert(served === Seq((10L, 2L, 2.0 / 4.0, (4.0 / 6.0 + 2.0 / 4.0) / 2.0)))
  }

  test("lmScore: fluent (corpus-typical) docs outscore word-soup on avg probability") {
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val soup = Seq((99L, "zqx wvu tsr qpo nml kji"))
    val docs = (fluent ++ soup).toDF("pid", "body")
    val scores = TextCuration.lmScore(docs, "pid", "body")
      .select("pid", "avg_prob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(99L), scores)
  }

  test("quantizeInt8: hand-computed scale and error; zero vector is safe") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
    ).toDF("vid", "v")
    val out = VectorSearch.quantizeInt8(vecs, "vid", "v").orderBy("vid").collect()
    val r1 = out(0)
    assert(r1.getLong(1) === 3L)
    assert(r1.getDouble(2) === 1.0 / 127.0) // scale
    // q = [127, -63, 0]: only the middle dim has error |−0.5 − (−63/127)|
    val expErr = math.abs(-0.5 - (-63.0 * (1.0 / 127.0)))
    assert(math.abs(r1.getDouble(3) - expErr) < 1e-15)
    val r2 = out(1)
    assert(r2.getDouble(2) === 0.0 && r2.getDouble(3) === 0.0 && r2.getDouble(4) === 0.0)
  }

  test("quantizeInt8: reconstruction error bounded by sqrt(d) * scale / 2 on random vectors") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * (i % 7 + 1)))).toDF("vid", "v")
    val bad = VectorSearch.quantizeInt8(vecs, "vid", "v")
      .filter(col("err_l2") > sqrt(col("n_dims").cast("double")) * col("scale") / 2.0 * 1.0000001)
    assert(bad.isEmpty)
  }

  test("keySkewProfile: hand-checked Gini, p99, heavy hitters; uniform keys score 0") {
    import graft.operators.Skew
    // skewed: key 1 x 6 rows, key 2 x 3, key 3 x 1 -> n=3 keys, T=10.
    // ranks by cnt asc: (3:c1,r1),(2:c3,r2),(1:c6,r3); S=1*1+2*3+3*6=25
    // gini = (2*25 - 4*10)/(3*10) = 10/30
    val rows = Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L) ++ Seq[Long]()
    val got = Skew.keySkewProfile(rows.toDF("key"), "key", topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(got.toSeq === Seq(
      (1L, 6L, 0.6, 3L, 10L, 6L, 6L, 10.0 / 30.0),
      (2L, 3L, 0.3, 3L, 10L, 6L, 6L, 10.0 / 30.0)), got.toSeq.toString)
    // uniform distribution: gini exactly 0, p99 = max = 2
    val uni = (1L to 8L).flatMap(k => Seq(k, k))
    val u = Skew.keySkewProfile(uni.toDF("key"), "key", topK = 1)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(u.toSeq === Seq((8L, 16L, 2L, 2L, 0.0)), u.toSeq.toString)
    // nulls are not keys
    val withNull = rows.map(Option(_)) :+ (None: Option[Long])
    assert(Skew.keySkewProfile(withNull.toDF("key"), "key", topK = 5)
      .collect().map(_.getLong(4)).head === 10L, "null keys excluded from n_rows")
  }

  test("madOutliers: hand-checked medians/MAD; only rows beyond k*MAD flagged") {
    import graft.operators.Stats
    // group g: values 1..9 plus the spike 100 -> n=10, med=(5+6)/2=5.5,
    // sorted devs [0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5],
    // mad=(2.5+2.5)/2=2.5 -> threshold 7.5: only the spike flags
    val rows = ((1 to 9).map(i => ("g", i.toLong, i.toDouble)) :+ (("g", 10L, 100.0))) ++
      // group h: constant values -> mad = 0, no deviation, no outliers
      (1 to 5).map(i => ("h", 100L + i, 7.0))
    val df = rows.toDF("grp", "id", "v")
    val got = Stats.madOutliers(df, Seq("grp"), "v", k = 3.0)
      .select("grp", "id", "v", "med", "mad")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(("g", 10L, 100.0, 5.5, 2.5)), got.toSeq.toString)
  }

  test("winsorize: values clamp to the exact per-group quantile band; interior values pass through untouched") {
    // group g: 1..20 -> p10 = ceil(0.1*20)=2nd value = 2, p90 = 18th = 18
    val df = (1 to 20).map(i => ("g", i.toDouble)) :+ (("h", 5.0))
    val out = graft.operators.Stats.winsorize(df.toDF("k", "v"), Seq("k"), "v",
        loBp = 1000, hiBp = 9000)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("g", 1.0)) === 2.0, "below-band clamps up to the exact p10 value")
    assert(out(("g", 20.0)) === 18.0, "above-band clamps down to the exact p90 value")
    assert(out(("g", 10.0)) === 10.0, "interior values untouched")
    assert(out(("h", 5.0)) === 5.0, "singleton group: its own value is both cutoffs")
  }

  test("profile: exact per-column counts/ndv/min/max across numeric, string, timestamp, and all-null columns") {
    val df = Seq(
      (1L, Some(2.5), "b", "2020-01-01 00:00:01"),
      (2L, Some(2.5), "a", "2020-01-01 00:00:02"),
      (3L, None, "c", "2020-01-01 00:00:02"),
    ).toDF("k", "v", "s", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("nul", lit(null).cast("double"))
    val out = graft.operators.Stats.profile(df, Seq("k", "v", "s", "ts", "nul"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getLong(1) === 3L && out("k").getLong(2) === 0L && out("k").getLong(3) === 3L)
    assert(out("k").getDouble(4) === 1.0 && out("k").getDouble(5) === 3.0)
    assert(out("v").getLong(2) === 1L, "one null in v")
    assert(out("v").getLong(3) === 1L, "count(DISTINCT) ignores nulls: one distinct value")
    assert(out("s").getString(6) === "a" && out("s").getString(7) === "c")
    assert(out("s").isNullAt(4) && out("s").isNullAt(5), "string column has no numeric min/max")
    assert(out("ts").getDouble(5) - out("ts").getDouble(4) === 1000000.0, "1s apart in micros")
    assert(out("nul").getLong(2) === 3L && out("nul").getLong(3) === 0L)
    assert(out("nul").isNullAt(4) && out("nul").isNullAt(5), "all-null min/max stay null")
    // a quote/backtick in a profiled column name would escape the
    // generated SQL's quoting contexts — rejected at entry, by name
    val odd = df.withColumnRenamed("s", "s'x")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Stats.profile(odd, Seq("k", "s'x"))
    }
    assert(e.getMessage.contains("s'x"), e.getMessage)
  }

  test("collocations: an always-adjacent pair tops frequent-but-independent pairs; the count floor drops rare pairs") {
    // 'new york' co-occurs every time either appears; 'the' is frequent
    // everywhere but pairs independently; 'ad hoc' appears twice (below
    // the floor of 3)
    val docs = Seq(
      (1L, "the new york subway is the busiest in the world today"),
      (2L, "visiting new york in the winter is the coldest trip ever"),
      (3L, "new york pizza beats the rest of the country by far"),
      (4L, "an ad hoc plan beats the committee in the long run"),
      (5L, "an ad hoc fix saved the day in the end again"),
    ).toDF("doc_id", "body")
    val out = TextCuration.collocations(docs, "body", minCount = 3, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5), r.getLong(6)))
    assert(out.head._1 === "new" && out.head._2 === "york", s"top pair wrong: ${out.toSeq}")
    assert(out.head._3 === 3L)
    assert(!out.exists(t => t._1 == "ad" && t._2 == "hoc"), "below-floor pair must be absent")
    // lift of the perfect collocation must dominate any 'the'-pair
    val thePairs = out.filter(t => t._1 == "the" || t._2 == "the")
    assert(thePairs.forall(_._4 < out.head._4))
  }

  test("chiSquaredTerms: exact 2x2 chi-squared against hand-computed tables") {
    // N=5 (null-label doc excluded), n_x=3, n_y=2; 'the' is in every doc
    // (df=N -> dropped); within-doc repeats count once (doc-level df)
    val docs = Seq(
      (1L, "the apple banana", "x"),
      (2L, "the apple cherry", "x"),
      (3L, "the apple apple", "x"),
      (4L, "the banana cherry", "y"),
      (5L, "the banana banana", "y"),
      (6L, "the dropped row", null),
    ).toDF("doc_id", "text", "label")
    val got = TextCuration.chiSquaredTerms(docs, "text", "label", minDf = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    // apple: perfectly discriminative for x -> chi2 = N = 5; scored only
    // where observed (sparse contingency: no ("y","apple") row)
    assert(got(("x", "apple")) === ((3L, 3L, 5.0, 1L)))
    assert(!got.contains(("y", "apple")), "labels are scored only for observed terms")
    // banana: a_x=1,b=2,c=2,d=0 -> 5*16/36; cherry: 5*1/36
    assert(got(("x", "banana")) === ((1L, 3L, 80.0 / 36.0, 2L)))
    assert(got(("y", "banana")) === ((2L, 3L, 80.0 / 36.0, 1L)))
    assert(got(("x", "cherry")) === ((1L, 2L, 5.0 / 36.0, 3L)))
    assert(got(("y", "cherry")) === ((1L, 2L, 5.0 / 36.0, 2L)))
    assert(!got.keySet.exists(_._2 == "the"), "df = N terms carry no signal and must be dropped")
    assert(!got.keySet.exists(_._2 == "dropped"), "null-label docs are excluded")
    // topK truncation via the rank column
    val top1 = TextCuration.chiSquaredTerms(docs, "text", "label", minDf = 1L, topK = 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(top1.toSet === Set(("x", "apple"), ("y", "banana")))
  }
}
