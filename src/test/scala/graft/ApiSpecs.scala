package graft

import graft.api.{TextCuration, VectorSearch}
import org.apache.spark.sql.functions._

/** The public API must work on ANY frame shape — not just the TESTDATA
  * `documents`/`embeddings` schemas the catalog queries use (those
  * already oracle-gate the semantics; these specs pin the genericity).
  */
class ApiSpecs extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (11L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup
    (12L, "the quick brown fox jumps over the lazy dog and walks away fast"), // near dup
    (13L, "completely different content about spark shuffles and joins here"),
  ).toDF("post_id", "body")

  test("exactDedup on a (post_id, body) frame finds the exact pair") {
    val out = TextCuration.exactDedup(corpus, "post_id", "body")
      .orderBy("canonical_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((10L, 2L), (12L, 1L), (13L, 1L)))
  }

  test("hash index: re-crawls match their canonical, changed/new content falls through, self-canonical excluded") {
    val path = java.nio.file.Files.createTempDirectory("hashidx").toString + "/idx"
    TextCuration.buildHashIndex(corpus, "post_id", "body", path)
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog and runs away fast"), // re-crawl of 10/11 -> canonical 10
      (101L, "entirely new content never seen in the corpus before this batch"), // no match
      (13L, "completely different content about spark shuffles and joins here"), // same id re-ingested -> excluded
    ).toDF("post_id", "body")
    val df = TextCuration.exactDupsAgainstIndex(batch, "post_id", "body", path)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((100L, 10L)))
    // serve-side partition pruning: the 3-row batch touches <= 3 of the
    // 256 bucket dirs, and the index scan carries that static filter
    val scan = df.queryExecution.executedPlan.toString.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("bucket"))
    assert(scan.isDefined && scan.get.contains("bucket"), s"no pruned index scan:\n$scan")
    assert(!scan.get.contains("PartitionFilters: []"), "index scan not partition-pruned")
  }

  test("jaccardNearDups on custom columns finds the near pair and not the unrelated doc") {
    val pairs = TextCuration.jaccardNearDups(corpus, "post_id", "body", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L))) // exact dup is also a near dup
    assert(!pairs.exists { case (a, b) => a == 13L || b == 13L })
  }

  test("curate keeps one canonical of the dup cluster and the distinct doc") {
    val kept = TextCuration.curate(corpus, "post_id", "body",
      jaccardThreshold = 0.5, qualityFloor = 0.0, langs = Seq("en", "und"))
      .select("post_id").collect().map(_.getLong(0)).sorted.toSeq
    // 11 (exact dup) and 12 (near dup of 10) fall; 10 and 13 survive
    assert(kept === Seq(10L, 13L))
  }

  test("cosineNearDups guard: refuses a corpus above maxRows unless exactOk; small inputs and opt-in run") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.01f)), (3L, Array(0.0f, 1.0f)),
    ).toDF("vid", "vec")
    // under the cap: runs, finds the near pair
    val pairs = VectorSearch.cosineNearDups(vecs, "vid", "vec", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // over the cap: fails fast, pointing at the scale paths
    val e = intercept[IllegalArgumentException] {
      VectorSearch.cosineNearDups(vecs, "vid", "vec", 0.9, maxRows = 2L).collect()
    }
    assert(e.getMessage.contains("O(n²)") && e.getMessage.contains("lshNearDups"))
    // explicit opt-in bypasses the count and runs the quadratic join
    val opted = VectorSearch.cosineNearDups(vecs, "vid", "vec", 0.9, maxRows = 2L, exactOk = true)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(opted === Set((1L, 2L)))
    // the parallelizing broadcast is BYTE-guarded: exactOk bypasses the
    // row guard by design, so a corpus estimated over the broadcast
    // budget must degrade to the plain join (no driver OOM / 8 GB
    // broadcast-limit failure), with identical pairs
    def hasBroadcast(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.contains("Broadcast")
    // auto-broadcast off isolates the EXPLICIT hint: with it, Spark
    // would pick BroadcastNestedLoopJoin for any tiny side on its own
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(hasBroadcast(VectorSearch.cosineNearDups(vecs, "vid", "vec", 0.9)),
        "an under-budget corpus must take the forced-broadcast fast path")
      val big = VectorSearch.cosineNearDups(vecs, "vid", "vec", 0.9,
        exactOk = true, maxBroadcastBytes = 1L)
      assert(!hasBroadcast(big), "over-budget corpus must fall back to the plain join")
      assert(big.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("cosineNearDupsAuto: exact no-op below budget; bounded verified candidates above; loud on unsplittable mass") {
    // a deterministic 40-vector corpus with a few engineered near-dups.
    // Dim 64 — the LSH planes are 64-wide (VectorKit stride), so
    // narrower vectors would degenerate every projection. Seeded RNG
    // per vector: a plain Knuth hash over consecutive flat indices
    // makes near-LINEAR vectors that share every LSH sign.
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed * 7919 + 13)
      Array.fill(64)(r.nextFloat() - 0.5f)
    }
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    val withDups = base ++ Seq( // 100..102 are near-copies of 0..2
      (100L, vec(0).map(x => x * 1.01f)), (101L, vec(1).map(x => x * 0.99f)),
      (102L, vec(2).map(x => x * 1.02f)))
    val corpus = withDups.toDF("vid", "vec")
    val exact = VectorSearch.cosineNearDups(corpus, "vid", "vec", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // (1) below budget: verbatim no-op — identical pairs AND cosines
    val (ex, dEx) = VectorSearch.cosineNearDupsAuto(corpus, "vid", "vec", 0.9)
    assert(dEx == s"exact(n=${corpus.count()})")
    assert(ex.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      === exact)
    // (2) above budget: LSH-blocked — every reported pair is a TRUE
    // near-dup with the bit-identical exact cosine (precision 1; the
    // trade is recall), and the audited candidate volume fits budget*n
    val (bl, dBl) = VectorSearch.cosineNearDupsAuto(corpus, "vid", "vec", 0.9,
      budgetPairsPerVec = 4L, bands = 2, maxPlanesPerBand = 8)
    assert(dBl.startsWith("lsh("), dBl)
    val cands = "candidates=(\\d+)".r.findFirstMatchIn(dBl).get.group(1).toLong
    assert(cands <= 4L * corpus.count(), s"audit bound violated: $dBl")
    val blocked = bl.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blocked.nonEmpty, "engineered near-copies must survive some band")
    blocked.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos),
        s"$pair must carry the exact path's bit-identical cosine") }
    // (3) an identical-vector mass shares every sign: no plane count
    // splits it — the eager audit fails loudly, before the pair join —
    // and the audit LOOP leaves no pinned probe frames behind (only the
    // ACCEPTED plane count ever localCheckpoints, and a failing audit
    // accepts none)
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val clones = (0 until 10).map(i => (i.toLong, vec(7))).toDF("vid", "vec")
    val e = intercept[IllegalArgumentException] {
      VectorSearch.cosineNearDupsAuto(clones, "vid", "vec", 0.9, budgetPairsPerVec = 1L)
    }
    assert(e.getMessage.contains("identical-vector mass"), e.getMessage)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- pinnedBefore
    assert(leaked.isEmpty,
      s"the occupancy-audit loop must not leak pinned probe frames: $leaked")
  }

  test("cosineNearDupsAuto recall: near-identical pairs survive the blocked regime almost surely") {
    // 200 well-spread base vectors + 120 near-copies (cos >= ~0.999 to
    // their source): the near-dup population a dedup sweep exists for.
    // At threshold 0.95 the per-plane sign-agreement for a true pair is
    // ~1 - theta/pi >= 0.99, so even one 8-plane band keeps ~92% and
    // two bands ~99% — assert a 90% floor, deterministic (fixed corpus,
    // fixed planes, no RNG at query time).
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed * 104729 + 7)
      Array.fill(64)(r.nextFloat() - 0.5f)
    }
    val base = (0 until 200).map(i => (i.toLong, vec(i)))
    val dups = (0 until 120).map { i =>
      val r = new scala.util.Random(i * 31 + 5)
      val src = vec(i)
      // tiny deterministic perturbation: stays within ~1 degree
      (1000L + i, src.map(x => x + (r.nextFloat() - 0.5f) * 0.01f))
    }
    val corpus = (base ++ dups).toDF("vid", "vec")
    val exact = VectorSearch.cosineNearDups(corpus, "vid", "vec", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 100, s"corpus must contain a real near-dup population: ${exact.size}")
    val (blocked, decision) = VectorSearch.cosineNearDupsAuto(corpus, "vid", "vec", 0.95,
      budgetPairsPerVec = 20L, bands = 2, maxPlanesPerBand = 8)
    assert(decision.startsWith("lsh("), decision)
    val found = blocked.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(exact), "precision must be 1 (exact verification)")
    val recall = found.size.toDouble / exact.size
    assert(recall >= 0.9,
      s"near-identical recall must stay high in the blocked regime: $recall " +
        s"(${found.size}/${exact.size}, $decision)")
    // TARGET-RECALL SIZING: bands derive from (threshold, targetRecall)
    // via the closed-form amplification recall, and grow with the plane
    // count inside the audit loop — the measured recall must meet each
    // pinned target, and a tighter target must never size FEWER bands
    // (12-plane headroom: the 0.99 target sizes ~9-10 bands, whose
    // candidate volume only fits the budget once buckets halve past
    // the 8-plane cap — the audit loop growing BOTH is the point)
    val byTarget = Seq(0.9, 0.99).map { tr =>
      val (prs, dec) = VectorSearch.cosineNearDupsAuto(corpus, "vid", "vec", 0.95,
        budgetPairsPerVec = 20L, maxPlanesPerBand = 12, targetRecall = tr)
      assert(dec.contains(s"targetRecall=$tr"), dec)
      val got = prs.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(exact), s"precision must stay 1 at targetRecall=$tr")
      val rec = got.size.toDouble / exact.size
      assert(rec >= tr,
        s"measured recall $rec must meet the pinned target $tr ($dec)")
      val b = "bands=(\\d+)".r.findFirstMatchIn(dec).get.group(1).toInt
      (tr, b, rec)
    }
    assert(byTarget(1)._2 >= byTarget(0)._2,
      s"a tighter recall target must never size fewer bands: $byTarget")
  }

  test("knn on a (vid, vec) frame returns k ranked neighbors excluding self") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)),
    ).toDF("vid", "vec")
    val out = VectorSearch.knn(vecs, vecs.filter($"vid" === 1L), "vid", "vec", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vid")).toSeq === Seq(2L, 3L)) // nearest then orthogonal
    assert(out.forall(_.getAs[Long]("q_id") == 1L))
  }

  test("PQ encode: codes per subspace hit the nearest seed; ADC retrieves same-cluster rows first") {
    // 4 well-separated anchors in R^8; ids 1..4 ARE the anchors (so the
    // 4 smallest ids give one codebook entry per cluster), ids 5+ are
    // small deterministic perturbations of an anchor
    def anchor(c: Int): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(c * 2) = 1.0f; a(c * 2 + 1) = 0.5f; a
    }
    val rows = (0 until 4).map(c => ((c + 1).toLong, anchor(c))) ++
      (5L to 40L).map { i =>
        val c = ((i - 5) % 4).toInt
        val v = anchor(c).clone(); v((i % 8).toInt) = v((i % 8).toInt) + 0.05f
        (i, v)
      }
    val corpus = rows.toDF("vid", "vec")
    val enc = VectorSearch.pqEncode(corpus, "vid", "vec", dim = 8, m = 4, k = 4)
      .orderBy("vid").collect()
    assert(enc.length == 40)
    val codes = enc.map(r => r.getAs[Long]("vid") -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 4)))
    // the anchor rows encode to themselves in the subspace that carries
    // their spike (anchor c spikes dims 2c..2c+1 = subspace c)
    (0 until 4).foreach { c =>
      assert(codes((c + 1).toLong)(c) == c, s"anchor $c must code to seed $c in subspace $c")
    }
    // ADC: each perturbed row's nearest neighbors come from its own cluster
    val got = VectorSearch.pqAdcSearch(corpus, corpus.filter($"vid" >= 5L && $"vid" <= 8L),
      "vid", "vec", dim = 8, m = 4, k = 4, topK = 3).collect()
    got.foreach { r =>
      val q = r.getAs[Long]("q_id"); val hit = r.getAs[Long]("vid")
      val qc = (q - 5) % 4
      val hitc = if (hit <= 4) hit - 1 else (hit - 5) % 4
      assert(qc == hitc, s"query $q (cluster $qc) retrieved $hit (cluster $hitc) at rank ${r.getAs[Long]("rank")}")
    }
  }

  test("IVF-PQ: probed-cluster recall, partition invariance, no cartesian in the plan") {
    // 4 well-separated clusters in R^8, labeled; ids 0..3 are the
    // anchors (and the min-id medoid of their label), ids 4+ perturb
    // their cluster's anchor
    def anchor(c: Int): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(c * 2) = 1.0f; a(c * 2 + 1) = 0.5f; a
    }
    val rows = (0 until 4).map(c => (c.toLong, s"c$c", anchor(c))) ++
      (4L to 43L).map { i =>
        val c = (i % 4).toInt
        val v = anchor(c).clone(); v((i % 8).toInt) = v((i % 8).toInt) + 0.05f
        (i, s"c$c", v)
      }
    val corpus = rows.toDF("vid", "lab", "vec")
    val queries = corpus.filter($"vid" >= 4L && $"vid" <= 7L)
    val got = VectorSearch.ivfPqSearch(corpus, queries,
      "vid", "vec", "lab", dim = 8, m = 4, k = 4, nprobe = 1, topK = 3)
    val hits = got.collect()
    assert(hits.length == 4 * 3)
    // nprobe=1 probes the query's own cluster (its rep is nearest), so
    // every hit shares the query's cluster
    hits.foreach { r =>
      val q = r.getAs[Long]("q_id"); val hit = r.getAs[Long]("vid")
      assert(q % 4 == hit % 4,
        s"query $q (cluster ${q % 4}) retrieved $hit (cluster ${hit % 4}) at rank ${r.getAs[Long]("rank")}")
    }
    // deterministic under any physical layout
    val again = VectorSearch.ivfPqSearch(corpus.repartition(7), queries,
      "vid", "vec", "lab", dim = 8, m = 4, k = 4, nprobe = 1, topK = 3).collect()
    assert(hits.sortBy(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.sortBy(r => (r.getLong(0), r.getLong(1))).toSeq)
    // candidate join is an equi-join on the partition key — never a
    // cartesian over the corpus (the only nested-loop is the bounded
    // 1-row codebook broadcast)
    val phys = got.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), "IVF-PQ must not plan a cartesian product")
    // misshaped subspace split fails at plan time
    val e = intercept[IllegalArgumentException] {
      VectorSearch.ivfPqSearch(corpus, queries, "vid", "vec", "lab",
        dim = 8, m = 3, k = 4, nprobe = 1, topK = 3)
    }
    assert(e.getMessage.contains("split evenly"))
  }

  test("annRoute: brute under the threshold, ivf with a cluster column, trained ivf without — one output shape") {
    def anchor(c: Int): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(c * 2) = 1.0f; a(c * 2 + 1) = 0.5f; a
    }
    val rows = (0L to 39L).map { i =>
      val c = (i % 4).toInt
      val v = anchor(c).clone(); v((i % 8).toInt) = v((i % 8).toInt) + 0.05f
      (i, s"c$c", v)
    }
    val corpus = rows.toDF("vid", "lab", "vec")
    val queries = corpus.filter($"vid" < 2L)
    // small corpus: exact brute, regardless of the cluster column
    val (rBrute, dBrute) = VectorSearch.annRoute(corpus, queries, "vid", "vec", k = 3,
      partCol = Some("lab"))
    assert(dBrute == "brute")
    val exact = VectorSearch.knn(corpus, queries, "vid", "vec", k = 3)
      .collect().map(_.toSeq).toSet
    assert(rBrute.collect().map(_.toSeq).toSet == exact)
    // above the threshold with a cluster column: probed IVF
    val (rIvf, dIvf) = VectorSearch.annRoute(corpus, queries, "vid", "vec", k = 3,
      partCol = Some("lab"), nprobe = 4, bruteMaxRows = 10L)
    assert(dIvf == "ivf")
    // full probe width == exact recall (the annIvf contract)
    assert(rIvf.collect().map(_.toSeq).toSet == exact)
    // above the threshold without a cluster column: trained quantizer
    val (rTrained, dTrained) = VectorSearch.annRoute(corpus, queries, "vid", "vec", k = 3,
      nprobe = 4, bruteMaxRows = 10L, trainK = 4)
    assert(dTrained == "ivf-trained")
    assert(rTrained.collect().map(_.toSeq).toSet == exact)
    // one output shape on every branch
    assert(rBrute.columns.toSeq == rIvf.columns.toSeq
      && rIvf.columns.toSeq == rTrained.columns.toSeq)

    // a persisted index outranks every rebuild path: serve via
    // annIvfIndexed with no training and a static partition filter
    val ixPath = graft.Artifacts.scratch("route-ivf")
    VectorSearch.buildIvfIndex(corpus, "vid", "vec", ixPath, nClusters = 4, sampleN = 40)
    val (rIx, dIx) = VectorSearch.annRoute(corpus, queries, "vid", "vec", k = 3,
      nprobe = 4, bruteMaxRows = 10L, indexPath = Some(ixPath))
    assert(dIx == "ivf-indexed")
    assert(rIx.columns.toSeq == rBrute.columns.toSeq)
    // full probe width == exact recall, same as the other branches
    assert(rIx.collect().map(_.toSeq).toSet == exact)
    // the served plan prunes to the probed cluster partition dirs via a
    // static IN filter — no corpus-wide listing, no training jobs
    val planned = VectorSearch.annIvfIndexed(spark, ixPath, queries, "vid", "vec",
      nprobe = 1, k = 3)
    val scanText = planned.queryExecution.executedPlan.toString
    assert(scanText.contains("cluster") && scanText.contains("IN"),
      s"expected a static cluster IN partition filter in:\n$scanText")
    // selective probe still returns k results per query (recall is
    // probabilistic; shape and boundedness are the contract)
    assert(planned.groupBy("q_id").count().collect().forall(_.getLong(1) == 3))
    // a torn/missing index silently falls through to a rebuild branch
    val (rFall, dFall) = VectorSearch.annRoute(corpus, queries, "vid", "vec", k = 3,
      partCol = Some("lab"), nprobe = 4, bruteMaxRows = 10L,
      indexPath = Some(ixPath + "-nonexistent"))
    assert(dFall == "ivf")
    assert(rFall.collect().map(_.toSeq).toSet == exact)
    // a drifted schema (extra column) is rejected by the shape pin
    val (_, dDrift) = VectorSearch.annRoute(
      corpus.withColumn("extra", lit(1)), queries, "vid", "vec", k = 3,
      partCol = Some("lab"), nprobe = 4, bruteMaxRows = 10L, indexPath = Some(ixPath))
    assert(dDrift == "ivf", "an index pinned to a different corpus schema must not serve")
    // under the brute threshold the index is still ignored — exact wins
    val (_, dSmall) = VectorSearch.annRoute(corpus, queries, "vid", "vec", k = 3,
      indexPath = Some(ixPath))
    assert(dSmall == "brute")
  }

  test("lshNearDupsAuto: plane count scales with the corpus, bounding candidate volume; recall intact at fixed size") {
    def vec(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(64)(rnd.nextFloat() - 0.5f)
    }
    def corpus(n: Int) = (0 until n).map(i => (i.toLong, vec(i))).toDF("vid", "vec")
    // small corpus: auto == the fixed catalog config (4 planes)
    val small = corpus(300)
    val (smallPairs, smallPlanes) = VectorSearch.lshNearDupsAuto(small, "vid", "vec", 0.4,
      targetBucketRows = 10)
    assert(smallPlanes > graft.operators.VectorKit.LshPlanes,
      "300 rows over a 10-row occupancy target must add planes")
    val (_, basePlanes) = VectorSearch.lshNearDupsAuto(corpus(100), "vid", "vec", 0.4,
      targetBucketRows = 250)
    assert(basePlanes == graft.operators.VectorKit.LshPlanes,
      "under the target the catalog-pinned plane count holds (oracle compatibility)")
    // 10x the corpus: planes grow, and the CANDIDATE volume (within-
    // bucket pairs) grows ~linearly instead of quadratically
    def candidates(df: org.apache.spark.sql.DataFrame, planes: Int): Long = {
      val bk = df.withColumn("bucket",
        expr(graft.operators.VectorKit.bucketSpark("vec", planes)))
      bk.groupBy("bucket").count()
        .agg(sum(expr("count * (count - 1) DIV 2"))).head().getLong(0)
    }
    val big = corpus(3000)
    val (_, bigPlanes) = VectorSearch.lshNearDupsAuto(big, "vid", "vec", 0.4,
      targetBucketRows = 10)
    assert(bigPlanes > smallPlanes, "10x corpus must add planes")
    val fixedCand = candidates(big, graft.operators.VectorKit.LshPlanes)
    val autoCand = candidates(big, bigPlanes)
    assert(autoCand * 4 < fixedCand,
      s"auto planes must cut candidate volume: $autoCand vs fixed-plane $fixedCand")
    // found pairs are a SUBSET of the fixed-plane pairs (more sign
    // agreements required), and every reported cosine is exact
    val fixed = VectorSearch.lshNearDups(small, "vid", "vec", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val auto = smallPairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto.subsetOf(fixed), "extra planes only ever REMOVE candidate pairs")
  }

  test("weightedSample: priorities monotone in weight, partition-invariant, guarded") {
    val docs = (1L to 200L).map(i => (i, 1L + (i % 8))).toDF("id", "w")
    val hi = TextCuration.weightedSample(docs, "id", "w", n = 200, salt = "s1")
      .select($"id", $"priority").as[(Long, Long)].collect().toMap
    // same ids with weight 1: every priority must be <= the weighted one
    // (a bigger weight only ADDS tickets — the nested-sample property)
    val lo = TextCuration.weightedSample(
        docs.withColumn("w", lit(1L)), "id", "w", n = 200, salt = "s1")
      .select($"id", $"priority").as[(Long, Long)].collect().toMap
    assert(lo.forall { case (id, p) => p <= hi(id) })
    assert(hi.exists { case (id, p) => p > lo(id) }, "extra tickets must win somewhere")
    // reproducible under any physical layout
    val a = TextCuration.weightedSample(docs, "id", "w", n = 25, salt = "s1").collect().toSeq
    val b = TextCuration.weightedSample(docs.repartition(7), "id", "w", n = 25, salt = "s1")
      .collect().toSeq
    assert(a == b)
    // out-of-range weights fail loudly, never sample wrongly
    val e = intercept[Exception] {
      TextCuration.weightedSample(
        docs.withColumn("w", lit(0L)), "id", "w", n = 5).collect()
    }
    assert(e.getMessage.contains("weight out of"))
  }

  test("trained PQ codebook recovers clusters a degenerate seed codebook cannot") {
    // all 4 smallest ids sit in cluster 0, so the SEED codebook is
    // degenerate (all entries near one anchor); Lloyd training on the
    // sample must still discover all 4 anchors
    def anchor(c: Int): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(c * 2) = 1.0f; a(c * 2 + 1) = 0.5f; a
    }
    val rows = (1L to 4L).map { i =>
      val v = anchor(0).clone(); v((i % 8).toInt) += 0.01f * i; (i, v)
    } ++ (5L to 44L).map { i =>
      val c = ((i - 5) % 4).toInt
      val v = anchor(c).clone(); v((i % 8).toInt) = v((i % 8).toInt) + 0.05f
      (i, v)
    }
    val corpus = rows.toDF("vid", "vec")
    val book = VectorSearch.pqTrain(corpus, "vid", "vec", dim = 8, m = 4, k = 4, iters = 8, sampleN = 44)
    val got = VectorSearch.pqAdcSearchWith(corpus, corpus.filter($"vid" >= 9L && $"vid" <= 12L),
      "vid", "vec", dim = 8, m = 4, k = 4, topK = 3, book).collect()
    def clusterOf(id: Long): Long = if (id <= 4) 0L else (id - 5) % 4
    got.foreach { r =>
      val q = r.getAs[Long]("q_id"); val hit = r.getAs[Long]("vid")
      assert(clusterOf(q) == clusterOf(hit),
        s"trained-book ADC: query $q (cluster ${clusterOf(q)}) retrieved $hit (cluster ${clusterOf(hit)})")
    }
  }

  test("kmeans quantizer: deterministic training, sensible assignment, and full-probe recall = brute force") {
    // two well-separated direction clusters + a third axis
    val vecs = ((1L to 20L).map(i => (i, Array(1.0f, (i % 5) * 0.01f))) ++
      (21L to 40L).map(i => (i, Array(-1.0f, (i % 7) * 0.01f))) ++
      (41L to 60L).map(i => (i, Array((i % 3) * 0.01f, 1.0f)))).toDF("vid", "vec")
    val c1 = VectorSearch.trainCentroids(vecs, "vid", "vec", k = 3, iters = 5, sampleN = 60)
    val c2 = VectorSearch.trainCentroids(vecs, "vid", "vec", k = 3, iters = 5, sampleN = 60)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq, "training must be deterministic")
    assert(c1.forall(c => math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9),
      "centroids must be unit vectors")
    val labeled = VectorSearch.withClusters(vecs, "vec", c1)
    // every group of same-direction vectors lands in ONE cluster
    val groups = labeled.withColumn("grp",
        when($"vid" <= 20L, 0).when($"vid" <= 40L, 1).otherwise(2))
      .groupBy("grp").agg(countDistinct($"cluster").as("n")).collect()
    assert(groups.forall(_.getLong(1) === 1L), "each direction group must map to one cluster")
    assert(labeled.select("cluster").distinct().count() === 3L)
    // with nprobe = nClusters the IVF path must equal brute-force knn
    val queries = vecs.filter($"vid".isin(1L, 25L, 45L))
    val brute = VectorSearch.knn(vecs, queries, "vid", "vec", k = 4)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val ivf = VectorSearch.annIvfAuto(vecs, queries, "vid", "vec",
      k = 4, nprobe = 3, nClusters = 3, sampleN = 60)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(ivf === brute, "full-probe IVF must have recall 1 vs brute force")
  }

  test("persisted IVF index: serving batches re-train nothing, prune to probed cluster dirs, full-probe recall = brute") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val vecs = ((1L to 20L).map(i => (i, Array(1.0f, (i % 5) * 0.01f))) ++
      (21L to 40L).map(i => (i, Array(-1.0f, (i % 7) * 0.01f))) ++
      (41L to 60L).map(i => (i, Array((i % 3) * 0.01f, 1.0f)))).toDF("vid", "vec")
    val path = tmpDir("ivfidx").resolve("index").toString
    VectorSearch.buildIvfIndex(vecs, "vid", "vec", path, nClusters = 3, sampleN = 60)

    // index layout: cluster partition dirs + hidden centroid table
    val children = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val names = Iterator.continually(children).takeWhile(_.hasNext).map(_.next().getFileName.toString).toSet
    assert(names.count(_.startsWith("cluster=")) === 3, names)
    assert(names.contains("_centroids"), names)

    val q1 = vecs.filter($"vid".isin(1L, 25L, 45L))
    // q2 is single-cluster (both vectors ≈ (1, 0)) so nprobe=1 serving
    // must prune the corpus scan to exactly one cluster=N dir
    val q2 = vecs.filter($"vid".isin(2L, 3L))
    // batch 1 warms nothing persistent; batch 2's plan CONSTRUCTION must
    // launch zero Spark jobs beyond the broadcast-guard probe — training
    // (sort+limit+collect) is eager and would show up here
    VectorSearch.annIvfIndexed(spark, path, q1, "vid", "vec", nprobe = 3, k = 4).collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        sites.add(j.stageInfos.map(_.name).mkString("[", " | ", "]"))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val served2 =
      try {
        val df = VectorSearch.annIvfIndexed(spark, path, q2, "vid", "vec", nprobe = 1, k = 4)
        // listener delivery is async; wait for the count to stabilize
        var last = -1
        var spins = 0
        while (jobs.get() != last && spins < 20) { last = jobs.get(); Thread.sleep(100); spins += 1 }
        df
      } finally spark.sparkContext.removeSparkListener(listener)
    // centroid read is a driver-side parquet collect (1 tiny file) and the
    // broadcast guard is a limit-count: allow those bounded control jobs,
    // but training's 60-row global sort would add several more
    assert(jobs.get() <= 3,
      s"serving-plan construction launched ${jobs.get()} jobs — re-training? sites: ${sites.toArray.mkString("; ")}")

    // full-probe recall = brute force (same contract as annIvfAuto)
    val brute = VectorSearch.knn(vecs, q1, "vid", "vec", k = 4)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val served = VectorSearch.annIvfIndexed(spark, path, q1, "vid", "vec", nprobe = 3, k = 4)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(served === brute, "full-probe indexed IVF must have recall 1 vs brute force")

    // nprobe=1 single-cluster serving must prune the corpus scan to the
    // one probed cluster dir — a STATIC `cluster IN (...)` partition
    // filter, visible in the plan and in the partitions-read metric
    val plan = served2.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      "cluster#\\d+ (=|IN)".r.findFirstIn(plan).isDefined, // 1-element isin folds to =
      s"corpus scan has no static partition filter:\n$plan")
    assert(served2.collect().nonEmpty) // and it still answers
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => findScans(q.plan)
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
    }.flatten
    val scan = findScans(served2.queryExecution.executedPlan)
      .find(_.metrics.contains("numPartitions"))
      .getOrElse(fail(s"no partitioned FileSourceScanExec in:\n$plan"))
    assert(scan.metrics("numPartitions").value === 1,
      s"scan read ${scan.metrics("numPartitions").value} partition dirs, want 1 (pruned)")
  }

  test("IVF partial-probe recall curve: stated floors at nprobe 1/2/4 vs the exact baseline, monotone") {
    // deterministic structured corpus: 8 direction-clusters in 8 dims
    // with pseudo-random jitter (hash arithmetic, no RNG), 320 vectors
    val vecs = (0 until 320).map { i =>
      val v = Array.tabulate(8) { d =>
        val jitter = ((i * 31 + d * 17) % 97) / 970.0f
        (if (i % 8 == d) 1.0f else 0.0f) + jitter
      }
      (i.toLong, v)
    }.toDF("vid", "vec")
    val queries = vecs.filter($"vid" % 32 === 0L) // 10 queries, one per wave
    val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorSearch.knn(vecs, queries, "vid", "vec", k))
    assert(brute.size === queries.count() * k)
    val recalls = Seq(1, 2, 4, 8).map { nprobe =>
      val got = pairs(VectorSearch.annIvfAuto(vecs, queries, "vid", "vec",
        k = k, nprobe = nprobe, nClusters = 8, sampleN = 320))
      nprobe -> (got.intersect(brute).size.toDouble / brute.size)
    }
    val byProbe = recalls.toMap
    // stated floors: probing the query's own cluster already finds most
    // true neighbors on clustered data; widening probes only adds
    assert(byProbe(1) >= 0.50, s"recall@$k nprobe=1: $recalls")
    assert(byProbe(2) >= 0.65, s"recall@$k nprobe=2: $recalls")
    assert(byProbe(4) >= 0.80, s"recall@$k nprobe=4: $recalls")
    assert(byProbe(8) === 1.0, s"full probe must equal brute force: $recalls")
    // monotone non-decreasing in probe width
    assert(recalls.map(_._2) === recalls.map(_._2).sorted, s"recall not monotone: $recalls")
  }

  test("IVF index append: new rows land in their cluster dirs and serve without retraining") {
    val vecs = ((1L to 10L).map(i => (i, Array(1.0f, i * 0.01f))) ++
      (11L to 20L).map(i => (i, Array(-1.0f, i * 0.01f)))).toDF("vid", "vec")
    val path = tmpDir("ivfapp").resolve("index").toString
    VectorSearch.buildIvfIndex(vecs, "vid", "vec", path, nClusters = 2, sampleN = 20)

    // appended row is near the (1, 0) cluster; it must become findable
    val extra = Seq((99L, Array(1.0f, 0.05f))).toDF("vid", "vec")
    VectorSearch.appendToIvfIndex(extra, "vid", "vec", path)
    assert(spark.read.parquet(path).count() === 21)

    val q = vecs.filter($"vid" === 1L)
    val served = VectorSearch.annIvfIndexed(spark, path, q, "vid", "vec", nprobe = 2, k = 21)
      .collect().map(_.getLong(2))
    assert(served.contains(99L), s"appended row not served: ${served.toSeq}")
    // and the full-probe result still equals brute force over the grown corpus
    val grown = vecs.unionAll(extra)
    val brute = VectorSearch.knn(grown, q, "vid", "vec", k = 5)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val ivf = VectorSearch.annIvfIndexed(spark, path, q, "vid", "vec", nprobe = 2, k = 5)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(ivf === brute)
  }

  test("knn/annIvf broadcast guard: oversized query sets plan WITHOUT a query-side broadcast hint, same results") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val corpus = (1L to 40L).map(i => (i, Array(math.cos(i * 0.1).toFloat, math.sin(i * 0.1).toFloat), i % 3))
      .toDF("vid", "vec", "bucket3")
    val queries = corpus.filter($"vid" <= 5L).select("vid", "vec")
    def broadcastHints(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join => Seq(j.hint.leftHint, j.hint.rightHint).flatten.count(_.strategy.nonEmpty)
      }.sum
    val small = VectorSearch.knn(corpus, queries, "vid", "vec", k = 3)
    val large = VectorSearch.knn(corpus, queries, "vid", "vec", k = 3, maxBroadcastQueries = 2L)
    assert(broadcastHints(small) > 0, "small query set should carry a broadcast hint")
    assert(broadcastHints(large) === 0, "oversized query set must not be force-broadcast")
    assert(small.orderBy("q_id", "rank").collect().toSeq === large.orderBy("q_id", "rank").collect().toSeq)
    // same contract for the IVF probe side (rep broadcast is fixed-size and exempt)
    val ivfSmall = VectorSearch.annIvf(corpus, queries, "vid", "vec", "bucket3", nprobe = 2, k = 3)
    val ivfLarge = VectorSearch.annIvf(corpus, queries, "vid", "vec", "bucket3", nprobe = 2, k = 3,
      maxBroadcastQueries = 2L)
    assert(broadcastHints(ivfLarge) < broadcastHints(ivfSmall),
      "oversized probe set must drop its broadcast hint (rep broadcast remains)")
    assert(ivfSmall.orderBy("q_id", "rank").collect().toSeq === ivfLarge.orderBy("q_id", "rank").collect().toSeq)

    // BYTE-aware guard: few rows of WIDE vectors must also refuse the
    // broadcast hint — row count alone would wave a 4096-dim set through
    val wideCorpus = (1L to 30L).map(i => (i, Array.tabulate(512)(d => ((i + d) % 7).toFloat)))
      .toDF("vid", "vec")
    val wideQueries = wideCorpus.filter($"vid" <= 3L) // 3 rows × 512 dims ≈ 12 KB est
    val wideOk = VectorSearch.knn(wideCorpus, wideQueries, "vid", "vec", k = 3)
    val wideRefused = VectorSearch.knn(wideCorpus, wideQueries, "vid", "vec", k = 3,
      maxBroadcastBytes = 4096L)
    assert(broadcastHints(wideOk) > 0, "wide-but-small-bytes set should still broadcast")
    assert(broadcastHints(wideRefused) === 0, "byte bound must veto the broadcast hint")
    assert(wideOk.orderBy("q_id", "rank").collect().toSeq ===
      wideRefused.orderBy("q_id", "rank").collect().toSeq)

    // the default byte bound follows spark.sql.autoBroadcastJoinThreshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
      assert(broadcastHints(
        VectorSearch.knn(wideCorpus, wideQueries, "vid", "vec", k = 3)) === 0,
        "default guard must honor the session broadcast threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("kcenters picks farthest-first under cosine distance; assignment is exact and map-only") {
    // four tight direction groups on the plane; the greedy sweep from
    // id 1 (east) must pick west (opposite), then one of the two
    // orthogonals, then the remaining one
    val vecs = Seq(
      1L -> Array(1.0f, 0.0f), 2L -> Array(0.995f, 0.1f),     // east
      11L -> Array(-1.0f, 0.05f), 12L -> Array(-0.99f, 0.0f), // west
      21L -> Array(0.05f, 1.0f), 22L -> Array(0.0f, 0.995f),  // north
      31L -> Array(0.0f, -1.0f), 32L -> Array(0.1f, -0.99f),  // south
    ).toDF("vid", "vec")
    val centers = VectorSearch.kcenters(vecs, "vid", "vec", k = 4, startId = 1L)
    assert(centers.map(_._1) === Seq(1, 2, 3, 4), "ranks are selection order")
    assert(centers.head._2 === 1L)
    assert(centers(1)._2 === 11L || centers(1)._2 === 12L, "second center is the far (west) group")
    assert(centers.map(_._2).distinct.size === 4, "centers are distinct points")

    val asn = VectorSearch.kcenterAssign(vecs, "vid", "vec", k = 4, startId = 1L)
    // every point lands with its own direction group's center
    val byCenter = asn.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def grp(id: Long) = byCenter(id)
    assert(grp(1L) === grp(2L) && grp(11L) === grp(12L) &&
      grp(21L) === grp(22L) && grp(31L) === grp(32L), s"groups must not split: $byCenter")
    assert(byCenter.values.toSet.size === 4)
    // centers assign to themselves at cosine exactly dot/nrm² = 1.0-ulp-exact
    val selfCos = asn.filter(col("vid").isin(centers.map(_._2): _*))
      .select("cosine").collect().map(_.getDouble(0))
    assert(selfCos.forall(c => math.abs(c - 1.0) < 1e-12))
    // scale pin: the assignment pass is MAP-ONLY — no exchange anywhere
    val plan = asn.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }

  test("semDedup: same-cluster near-twins drop greedily by id; a cross-cluster twin is the documented miss") {
    // east group: 1 and 2 nearly parallel (cos > 0.99) -> 2 drops;
    // 3 is east-ish but far from both (cos < threshold) -> kept.
    // 41/42 nearly parallel but engineered to straddle: 41 east-ish,
    // 42 north-ish — if the quantizer splits them, both survive (the
    // SemDeDup trade, asserted so the contract is pinned, not hidden)
    val vecs = Seq(
      1L -> Array(1.0f, 0.0f), 2L -> Array(0.999f, 0.04f),
      3L -> Array(0.9f, 0.436f),
      11L -> Array(-1.0f, 0.0f), 12L -> Array(-0.999f, -0.04f),
      21L -> Array(0.0f, 1.0f),
      41L -> Array(0.72f, 0.694f), 42L -> Array(0.694f, 0.72f),
    ).toDF("vid", "vec")
    val out = VectorSearch.semDedup(vecs, "vid", "vec", k = 3, startId = 1L, minCosine = 0.99)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size === 8)
    assert(!out(2L)._2, "2 has the lower-id near-twin 1 in its cluster")
    assert(out(1L)._2, "the lowest id of a twin group survives")
    assert(!out(12L)._2 && out(11L)._2, "west twin group dedups the same way")
    assert(out(3L)._2, "below-threshold neighbor survives")
    val (c41, k41) = out(41L); val (c42, k42) = out(42L)
    if (c41 == c42) assert(k41 && !k42, "same cluster: greedy drop by id")
    else assert(k41 && k42, "split across clusters: both survive — the documented recall trade")
  }

  test("semDedup: a catch-all cluster fails the eager size audit before the quadratic pair join") {
    // k far too small for the corpus: every vector lands in one cluster,
    // so Σ cluster² degenerates to corpus² — must fail loudly, eagerly.
    val rnd = new scala.util.Random(17)
    val skewed = (1L to 64L).map { i =>
      i -> Array(1.0f + rnd.nextFloat() * 0.01f, rnd.nextFloat() * 0.01f)
    }.toDF("vid", "vec")
    val e = intercept[IllegalArgumentException] {
      VectorSearch.semDedup(skewed, "vid", "vec", k = 1, startId = 1L,
        minCosine = 0.99, maxClusterSize = 32L)
    }
    assert(e.getMessage.contains("maxClusterSize"))
    // same corpus under the cap (or with an honest k) runs fine
    val ok = VectorSearch.semDedup(skewed, "vid", "vec", k = 1, startId = 1L,
      minCosine = 0.99, maxClusterSize = 64L)
    assert(ok.count() === 64L)
  }

  test("exactCentroids: hand-computed fixed-point means; bit-identical under repartitioning") {
    val vecs = Seq(
      ("a", Array(1.0f, -0.5f)), ("a", Array(0.5f, 0.25f)),
      ("b", Array(0.125f, 0.0f)),
    ).toDF("lbl", "vec")
    val out = VectorSearch.exactCentroids(vecs, "lbl", "vec")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // exact dyadic inputs: floor is the identity on the grid, means exact
    assert(out(("a", 0L)) === ((2L, 0.75)))
    assert(out(("a", 1L)) === ((2L, -0.125)))
    assert(out(("b", 0L)) === ((1L, 0.125)))
    assert(out(("b", 1L)) === ((1L, 0.0)))
    val rnd = new scala.util.Random(23)
    val big = (1 to 500).map(i => (s"g${i % 7}", Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("lbl", "vec")
    val a = VectorSearch.exactCentroids(big, "lbl", "vec")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val c = VectorSearch.exactCentroids(big.repartition(13), "lbl", "vec")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(a === c, "fixed-point sums make centroids partitioning-independent")
  }

  test("kcenters is partition-invariant: exact arithmetic makes selection and assignment identical under any layout") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vid", "vec")
    val c1 = VectorSearch.kcenters(vecs, "vid", "vec", k = 5, startId = 1L)
    val c2 = VectorSearch.kcenters(vecs.repartition(13), "vid", "vec", k = 5, startId = 1L)
    assert(c1.map(t => (t._1, t._2)) === c2.map(t => (t._1, t._2)), "center selection must not depend on partitioning")
    assert(c1.map(_._3) === c2.map(_._3), "center vectors bit-identical")
    val a1 = VectorSearch.kcenterAssign(vecs, "vid", "vec", k = 5, startId = 1L)
      .orderBy("vid").collect().toSeq
    val a2 = VectorSearch.kcenterAssign(vecs.repartition(13), "vid", "vec", k = 5, startId = 1L)
      .orderBy("vid").collect().toSeq
    assert(a1 === a2, "assignments and cosines bit-identical under repartitioning")
  }

  test("kcenters edge cases: k beyond the corpus stops at all-centers; missing startId fails fast") {
    val vecs = Seq(1L -> Array(1.0f, 0.0f), 2L -> Array(0.0f, 1.0f), 3L -> Array(-1.0f, 0.0f))
      .toDF("vid", "vec")
    val centers = VectorSearch.kcenters(vecs, "vid", "vec", k = 10, startId = 1L)
    assert(centers.size === 3, "k > corpus: every point becomes a center, no crash")
    assert(centers.map(_._2).toSet === Set(1L, 2L, 3L))
    val asn = VectorSearch.kcenterAssign(vecs, "vid", "vec", k = 10, startId = 1L)
    assert(asn.count() === 3L)
    val e = intercept[IllegalArgumentException] {
      VectorSearch.kcenters(vecs, "vid", "vec", k = 2, startId = 99L)
    }
    assert(e.getMessage.contains("startId"))
    // a string id would cast("long") to null and silently empty the
    // corpus — the integral-id contract is enforced by name instead
    val svecs = Seq("a" -> Array(1.0f, 0.0f), "b" -> Array(0.0f, 1.0f)).toDF("vid", "vec")
    val te = intercept[IllegalArgumentException] {
      VectorSearch.kcenters(svecs, "vid", "vec", k = 2, startId = 0L)
    }
    assert(te.getMessage.contains("integral id"), te.getMessage)
  }

  test("bm25Rank: tf raises, doc length normalizes, rarity weights; absent-term docs drop out") {
    import graft.api.Retrieval
    val docs = Seq(
      (1L, "spark spark spark runs fast"),          // tf=3, short
      (2L, "spark runs on a very long cluster with many extra words here now"), // tf=1, long
      (3L, "nothing relevant at all in this one"),  // no query terms
      (4L, "spark spark runs fast"),                // tf=2, shortest
      (5L, "rare spark together"),                  // has the rare term too
    ).toDF("doc_id", "body")
    val out = Retrieval.bm25Rank(docs, "doc_id", "body", Seq("spark", "rare"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ranks = out.map(t => t._1 -> t._2).toMap
    assert(!ranks.contains(3L), "doc without any query term must be absent")
    assert(ranks(5L) === 1L, "the only doc with the rare term outranks all tf-only docs")
    assert(ranks(4L) < ranks(2L), "higher tf on a shorter doc must outrank tf=1 on a long doc")
    // scores strictly ordered by rank, all positive
    val sorted = out.sortBy(_._2)
    assert(sorted.sliding(2).forall { case Array(a, b) => a._3 >= b._3 case _ => true })
    assert(out.forall(_._3 > 0.0))
  }

  test("rrfFuse: both-list docs beat single-list docs at similar ranks; absent side contributes 0") {
    import graft.api.Retrieval
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "r")   // lexical list
    val b = Seq((2L, 1L), (9L, 2L)).toDF("id", "r")             // vector list
    val out = Retrieval.rrfFuse(a, "id", "r", b, "id", "r", k0 = 60.0, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(2L)._5 === 1L, "doc on both lists fuses to the top")
    assert(byId(2L)._2 === 1.0 / 62 + 1.0 / 61)
    assert(byId(1L)._2 === 1.0 / 61, "single-list contribution only")
    assert(byId(1L)._3 === Some(1L) && byId(1L)._4 === None, "absent list rank stays NULL")
    assert(byId(9L)._3 === None && byId(9L)._4 === Some(2L))
    assert(out.length === 4)
  }

  test("persisted BM25 index: serve is bit-identical to the direct scorer and prunes to the query terms' buckets") {
    import graft.api.Retrieval
    val docs = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark runs on a very long cluster with many extra words here now"),
      (3L, "nothing relevant at all in this one"),
      (4L, "spark spark runs fast"),
      (5L, "rare spark together"),
    ).toDF("post_id", "body")
    val path = tmpDir("bm25idx").toString + "/idx"
    Retrieval.buildBm25Index(docs, "post_id", "body", path)
    val terms = Seq("spark", "rare")
    val direct = Retrieval.bm25Rank(docs, "post_id", "body", terms, topK = 10)
    val served = Retrieval.bm25Indexed(spark, path, "post_id", terms, topK = 10)
    assert(served.orderBy("rank").collect().toSeq === direct.orderBy("rank").collect().toSeq,
      "indexed serve must be bit-identical to the direct scorer")
    // the postings scan must carry a static bucket partition filter
    val plan = served.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(l => l.contains("PartitionFilters") && l.contains("bucket"))
    assert(scan.isDefined && !scan.get.contains("PartitionFilters: []"),
      s"postings scan not partition-pruned:\n$plan")
    // an empty/corrupt stats table must fail by index path, not NPE
    // deep in the score expression
    val hollow = tmpDir("bm25hollow").toString + "/idx"
    spark.read.parquet(s"$path/stats").filter(lit(false)).coalesce(1)
      .write.parquet(s"$hollow/stats")
    spark.read.parquet(s"$path/postings").limit(1)
      .write.partitionBy("bucket").parquet(s"$hollow/postings")
    val he = intercept[IllegalArgumentException] {
      Retrieval.bm25Indexed(spark, hollow, "post_id", terms, topK = 10)
    }
    assert(he.getMessage.contains(hollow), he.getMessage)
  }

  test("BM25 index append: build+append == fresh build over the union, and a crashed-append replay dedups") {
    import graft.api.Retrieval
    val base = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark runs on a very long cluster with many extra words here now"),
      (3L, "nothing relevant at all in this one"),
    ).toDF("post_id", "body")
    val more = Seq(
      (4L, "spark spark runs fast"),
      (5L, "rare spark together"),
    ).toDF("post_id", "body")
    val terms = Seq("spark", "rare")
    val appended = tmpDir("bm25app").toString + "/idx"
    Retrieval.buildBm25Index(base, "post_id", "body", appended)
    Retrieval.appendToBm25Index(more, "post_id", "body", appended)
    val fresh = tmpDir("bm25fresh").toString + "/idx"
    Retrieval.buildBm25Index(base.unionByName(more), "post_id", "body", fresh)
    val servedA = Retrieval.bm25Indexed(spark, appended, "post_id", terms, topK = 10)
    val servedF = Retrieval.bm25Indexed(spark, fresh, "post_id", terms, topK = 10)
    assert(servedA.orderBy("rank").collect().toSeq === servedF.orderBy("rank").collect().toSeq,
      "append must be indistinguishable from a fresh build over the union")
    // replay: re-running the same (batch, batchId) must converge — the
    // postings dedup and the stats row overwrites its own batch
    // partition, so totals do NOT double-count
    def totals() = {
      val r = spark.read.parquet(s"$appended/stats")
        .agg(sum("n").cast("long"), sum("sum_dl").cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }
    val pre = totals()
    assert(pre._1 === 5L, s"5 docs total: $pre")
    Retrieval.appendToBm25Index(more, "post_id", "body", appended, batchId = 1L)
    val posts = spark.read.parquet(s"$appended/postings")
    assert(posts.groupBy("post_id", "term").count().filter($"count" > 1).count() === 0L,
      "replayed batch postings must dedup, not double")
    assert(totals() === pre, "replayed batch stats must overwrite, not double-add")
    val servedR = Retrieval.bm25Indexed(spark, appended, "post_id", terms, topK = 10)
    assert(servedR.orderBy("rank").collect().toSeq === servedF.orderBy("rank").collect().toSeq,
      "serve after replay still equals the fresh build")
  }

  test("streaming BM25 ingest: bootstrap + per-batch appends serve the growing corpus; redelivery converges") {
    import graft.api.Retrieval
    import graft.streaming.RetrievalStream
    val idx = tmpDir("bm25stream").toString + "/idx"
    val b0 = Seq((1L, "spark spark spark runs fast"),
      (2L, "spark runs on a very long cluster with many extra words here now")).toDF("post_id", "body")
    val b1 = Seq((3L, "nothing relevant at all in this one"),
      (4L, "spark spark runs fast"), (5L, "rare spark together")).toDF("post_id", "body")
    RetrievalStream.processBatch(b0, 0L, "post_id", "body", idx) // bootstrap build
    RetrievalStream.processBatch(b1, 1L, "post_id", "body", idx)
    val terms = Seq("spark", "rare")
    val fresh = tmpDir("bm25stream_fresh").toString + "/idx"
    Retrieval.buildBm25Index(b0.unionByName(b1), "post_id", "body", fresh)
    def serve(p: String) =
      Retrieval.bm25Indexed(spark, p, "post_id", terms, topK = 10).orderBy("rank").collect().toSeq
    assert(serve(idx) === serve(fresh), "streamed index must equal a fresh build over all batches")
    // redelivery of the NEWEST batch (crash before checkpoint commit) converges
    RetrievalStream.processBatch(b1, 1L, "post_id", "body", idx)
    assert(serve(idx) === serve(fresh), "redelivered batch must not change the served result")
    // an id OLDER than the applied max is NOT a legitimate replay
    // (structured streaming re-fires only the newest uncommitted batch):
    // it means a restarted stream with a fresh checkpoint re-counting
    // ids from 0 over NEW documents — the append must fail fast instead
    // of replacing batch 0's stats row while keeping its postings
    val ex = intercept[IllegalArgumentException] {
      RetrievalStream.processBatch(b0, 0L, "post_id", "body", idx)
    }
    assert(ex.getMessage.contains("chain regression"), ex.getMessage)
    assert(serve(idx) === serve(fresh), "rejected batch must leave the index untouched")
  }

  test("spanDupStats: exact per-doc duplicated-shingle fractions on a crafted corpus") {
    // doc 1 and 2 share their first trigram only; doc 3 shares nothing
    val docs = Seq(
      (1L, "a b c x y"),   // shingles: "a b c", "b c x", "c x y"
      (2L, "a b c q r"),   // shingles: "a b c", "b c q", "c q r"
      (3L, "u v w z k"),   // disjoint
    ).toDF("doc_id", "body")
    val out = TextCuration.spanDupStats(docs, "doc_id", "body")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 1L, 1.0 / 3)))
    assert(out(2L) === ((3L, 1L, 1.0 / 3)))
    assert(out(3L) === ((3L, 0L, 0.0)))
  }

  test("substringDupProfile: exact window counts; shared span found; short docs excluded") {
    val shared = "THE-QUICK-BROWN-FOX!" // 20 chars, L = 10 -> 11 windows inside it
    val docs = Seq(
      (1L, s"aaaaa${shared}bbbbb"),  // 30 chars
      (2L, s"cc${shared}ddddddd"),   // 29 chars
      (3L, "completely unrelated text here zz"), // 33 chars, no shared 10-gram
      (4L, "tiny"),                  // < L: excluded entirely
    ).toDF("doc_id", "body")
    val out = TextCuration.substringDupProfile(docs, "doc_id", "body", L = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 30-10+1 = 21 windows; the 11 windows fully inside `shared`
    // also occur in doc2 (same bytes), surrounding windows differ
    assert(out(1L) === ((21L, 11L)), s"got ${out(1L)}")
    assert(out(2L) === ((20L, 11L)), s"got ${out(2L)}")
    assert(out(3L) === ((24L, 0L)))
    assert(!out.contains(4L), "docs shorter than L have no windows")
  }
}
