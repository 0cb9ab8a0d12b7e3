package graft.api

import graft.operators.VectorKit._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public similarity-search API over ANY frame with an id column and an
  * `array<float|double>` embedding column — the generic form of the
  * q31–q34 catalog queries, which delegate here (so every function sits
  * behind the DuckDB oracle gate).
  *
  * Scale contract: the query set broadcasts and the corpus streams once
  * (brute force); IVF prunes to nprobe partitions on the cluster key;
  * sign-LSH bounds candidate pairs per bucket. No corpus × corpus
  * products anywhere.
  */
object VectorSearch {

  /** Corpus + precomputed L2 norm (computed once, reused on every join
    * side).
    */
  def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("nrm", expr(s"sqrt(${dotSpark(vecCol, vecCol)})"))

  /** Broadcasting the query side is only safe when the query set is
    * genuinely small — an unguarded `broadcast(q)` on a 10M-row query
    * frame OOMs the driver, and so does a 2k-row frame of 4096-dim
    * embeddings (row count alone says nothing about bytes). The guard
    * is therefore byte-aware: ONE bounded job counts at most `max + 1`
    * rows AND sums vector lengths, and the caller broadcasts only when
    * both the row bound and the estimated-bytes bound hold, falling
    * back to a plain distributed join otherwise; AQE may still choose
    * a broadcast at runtime if actual sizes permit, which is the safe,
    * size-informed version of the same decision.
    *
    * Always probe the CHEAPEST frame whose cardinality bounds the
    * broadcast side (the raw query input, a narrow scan) — counting a
    * derived plan such as the IVF probe ranking would execute that
    * whole subtree twice per call, once for the guard and once for the
    * join.
    */
  private def boundedSize(df: DataFrame, vecCol: String, maxRows: Long): (Long, Long) = {
    val probe = math.min(math.max(maxRows, 0L) + 1L, Int.MaxValue.toLong).toInt
    // coalesce: a null vector contributes 0 elements regardless of the
    // session's size(NULL) semantics (legacy mode returns -1, which
    // would DEFLATE the estimate)
    val r = df.limit(probe).agg(count(lit(1)), sum(coalesce(size(col(vecCol)), lit(0)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Estimated broadcast payload: 8 B per vector element (doubles after
    * the join-side cast) + ~32 B per row of id/norm/row overhead.
    */
  private def estBytes(rows: Long, elems: Long): Long = elems * 8L + rows * 32L

  /** `maxBytes <= 0` (the default) defers to the session's
    * `spark.sql.autoBroadcastJoinThreshold` — the same knob that sizes
    * every other broadcast in the plan — with a 10 MiB floor when that
    * is disabled (-1).
    */
  private def resolveMaxBytes(df: DataFrame, maxBytes: Long): Long =
    if (maxBytes > 0) maxBytes
    else {
      val t = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      if (t > 0) t else 10L << 20
    }

  /** Exact brute-force cosine top-k: for each row of `queries`
    * (id + vector), the k nearest corpus rows by cosine (ties broken by
    * corpus id). Query sets within BOTH `maxBroadcastQueries` rows and
    * `maxBroadcastBytes` estimated bytes are broadcast (corpus streams
    * once, no shuffle); larger or wider sets run a distributed join.
    * Self-matches (same id) are excluded.
    */
  def knn(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int,
          maxBroadcastQueries: Long = 1000000L, maxBroadcastBytes: Long = -1L): DataFrame = {
    val n = withNorm(corpus, vecCol)
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col(idCol))
    // guard probes the raw `queries` frame (same cardinality as q, but a
    // plain scan instead of the norm projection)
    val (rows, elems) = boundedSize(queries, vecCol, maxBroadcastQueries)
    val qb =
      if (rows <= maxBroadcastQueries &&
        estBytes(rows, elems) <= resolveMaxBytes(queries, maxBroadcastBytes)) broadcast(q)
      else q
    n.join(qb, col(idCol) =!= col("q_id"))
      .selectExpr("q_id", idCol, s"${dotSpark("qv", vecCol)} / (qn * nrm) AS cosine")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol), col("cosine"))
  }

  /** IVF-style probed search: `partCol` is the coarse-quantizer
    * partition key (a label/cluster id); the representative per
    * partition is the min-id vector (deterministic medoid); each query
    * probes the `nprobe` nearest partitions and exact-searches only
    * those.
    */
  def annIvf(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, partCol: String,
      nprobe: Int, k: Int,
      maxBroadcastQueries: Long = 1000000L,
      maxBroadcastBytes: Long = -1L,
  ): DataFrame = {
    val n = withNorm(corpus, vecCol)
    // representatives are one row per partition key — fixed cardinality,
    // always safe to broadcast. min_by picks the min-id row's vector in
    // the same aggregation (one shuffle; the agg+self-join form cost a
    // second join stage for the same rows)
    val rep = n.groupBy(partCol).agg(
      min_by(col(vecCol), col(idCol)).as("rv"),
      min_by(col("nrm"), col(idCol)).as("rn"))
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val wp = Window.partitionBy("q_id").orderBy(col("pcos").desc, col(partCol))
    val probe = q.crossJoin(broadcast(rep))
      .withColumn("pcos", expr(s"${dotSpark("qv", "rv")} / (qn * rn)"))
      .withColumn("prank", row_number().over(wp).cast("long"))
      .filter(col("prank") <= nprobe)
      .select("q_id", "qv", "qn", partCol)
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col(idCol))
    // probe is at most queries x nprobe rows, each carrying the query
    // vector: same driver-memory contract as the query set itself,
    // scaled by nprobe. The guard sizes the RAW query frame (a cheap
    // bounded scan) and multiplies by nprobe rather than probing the
    // derived plan — that would run the full query-by-representative
    // window ranking twice per call.
    val np = math.max(nprobe, 1)
    val (rows, elems) = boundedSize(queries, vecCol, maxBroadcastQueries / np)
    val probeB =
      if (rows <= maxBroadcastQueries / np &&
        estBytes(rows, elems) * np <= resolveMaxBytes(queries, maxBroadcastBytes)) broadcast(probe)
      else probe
    probeB.join(n, Seq(partCol))
      .filter(col(idCol) =!= col("q_id"))
      .selectExpr("q_id", idCol, s"${dotSpark("qv", vecCol)} / (qn * nrm) AS cosine")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol), col("cosine"))
  }

  /** Deterministic spherical k-means training for the IVF coarse
    * quantizer — closes the loop for corpora that arrive WITHOUT a
    * cluster column ([[annIvf]]'s `partCol`).
    *
    * Scale shape: training runs driver-side Lloyd over a BOUNDED,
    * deterministic sample (the `sampleN` lowest-id vectors — control-
    * plane work: sampleN x k x dims flops, independent of corpus
    * size); the full corpus is then labeled in one codegen'd map pass
    * over broadcast centroid literals ([[withClusters]]). This is the
    * standard IVF recipe: train on a sample, assign everything once.
    *
    * Determinism contract (same reproducibility rules as the LSH
    * planes): id-ordered sample, farthest-point init (greedy maximin —
    * first sample vector, then repeatedly the sample point LEAST
    * similar to its nearest chosen centroid, lowest index on ties: a
    * spread-out start without RNG), fixed iteration count, max-dot
    * assignment with lowest-index tie-break, empty clusters keep their
    * previous centroid. Same inputs -> same centroids on any cluster
    * layout.
    */
  def trainCentroids(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5, sampleN: Int = 4096,
  ): Array[Array[Double]] = {
    require(k >= 1 && iters >= 0 && sampleN >= k,
      s"need sampleN >= k >= 1, iters >= 0 (got k=$k iters=$iters sampleN=$sampleN)")
    val sample: Array[Array[Double]] = df
      .orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"corpus has ${sample.length} rows < k=$k")
    def unit(v: Array[Double]): Array[Double] = {
      var ss = 0.0; var i = 0
      while (i < v.length) { ss += v(i) * v(i); i += 1 }
      val n = math.sqrt(ss)
      if (n == 0.0) v.clone() else v.map(_ / n)
    }
    val unitSample = sample.map(unit)
    // farthest-point init: maxSim(i) tracks each point's similarity to
    // its nearest already-chosen centroid; next pick = argmin of that
    val chosen = new Array[Int](k)
    chosen(0) = 0
    val maxSim = Array.fill(sample.length)(Double.NegativeInfinity)
    for (j <- 1 until k) {
      val last = unitSample(chosen(j - 1))
      var i = 0
      while (i < unitSample.length) {
        var d = 0.0; var t = 0
        while (t < last.length) { d += unitSample(i)(t) * last(t); t += 1 }
        if (d > maxSim(i)) maxSim(i) = d
        i += 1
      }
      var best = -1; var bestSim = Double.PositiveInfinity
      i = 0
      while (i < unitSample.length) {
        if (!chosen.take(j).contains(i) && maxSim(i) < bestSim) { bestSim = maxSim(i); best = i }
        i += 1
      }
      chosen(j) = best
    }
    var centroids: Array[Array[Double]] = chosen.map(unitSample(_).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](sample(0).length))
      val cnts = new Array[Long](k)
      sample.foreach { x =>
        var best = 0; var bestD = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < x.length) { d += x(i) * centroids(c)(i); i += 1 }
          if (d > bestD) { bestD = d; best = c } // strict > = lowest-index ties
          c += 1
        }
        var i = 0
        while (i < x.length) { sums(best)(i) += x(i); i += 1 }
        cnts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (cnts(c) == 0L) old else unit(sums(c))
      }
    }
    centroids
  }

  /** Label every row with its nearest (max-dot, lowest index on ties)
    * centroid: one codegen'd map pass — k dot-product kernels against
    * broadcast centroid literals, argmax via struct ordering, no
    * shuffle, no UDF. Centroids are unit vectors, so max dot = max
    * cosine for each fixed row.
    */
  def withClusters(
      df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], outCol: String = "cluster",
  ): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        call_function("graft_vec_dot", col(vecCol).cast("array<double>"),
          typedLit(c.toSeq)).as("d"),
        lit(-i).as("ni")) // struct max = max d, then max -i = LOWEST index
    }
    df.withColumn(outCol, array_max(array(scored: _*)).getField("ni") * -1)
  }

  /** IVF over a corpus with no precomputed partition column: train the
    * quantizer, label corpus and queries, probe. The labeled corpus
    * should be cached (or written bucketed by `cluster`) when serving
    * many query batches — training is one-time, labeling is one pass.
    */
  def annIvfAuto(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int, nprobe: Int, nClusters: Int,
      iters: Int = 5, sampleN: Int = 4096,
      maxBroadcastQueries: Long = 1000000L,
      maxBroadcastBytes: Long = -1L,
  ): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nClusters, iters, sampleN)
    annIvf(withClusters(corpus, vecCol, cents, "__ivf_cluster"), queries,
      idCol, vecCol, "__ivf_cluster", nprobe, k, maxBroadcastQueries, maxBroadcastBytes)
  }

  /** Build and persist an IVF index for multi-batch serving: train the
    * coarse quantizer once, label the corpus once, and write it
    * PARTITIONED BY CLUSTER so [[annIvfIndexed]] can serve any number
    * of query batches with no re-training, no re-labeling, and — via
    * dynamic partition pruning on the cluster dirs — no full-corpus
    * scan per batch. Layout at `path`:
    *
    *   cluster=N/part-*.parquet   labeled corpus (partition dirs = IVF lists)
    *   _centroids/part-*.parquet  (cluster, centroid) unit vectors
    *   _schema.json               labeled-corpus schema (serving skips inference)
    *
    * The `_centroids` dir and `_schema.json` are underscore-prefixed,
    * so corpus reads of `path` never see them as data. At 100 TB this
    * is the standard train-once/serve-many IVF shape: the index build
    * is one labeling pass + one shuffle-free partitioned write; each
    * serving batch touches only its probed partitions and launches no
    * schema-inference or sort jobs (both schemas are pinned at build
    * time).
    */
  def buildIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      nClusters: Int, iters: Int = 5, sampleN: Int = 4096,
  ): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = trainCentroids(corpus, idCol, vecCol, nClusters, iters, sampleN)
    val labeled = withClusters(corpus, vecCol, cents, "cluster")
    labeled
      .write.partitionBy("cluster").mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/_centroids")
    val sp = new org.apache.hadoop.fs.Path(s"$path/_schema.json")
    val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(sp, true)
    try out.write(labeled.schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The index's centroid table, collected and ordered driver-side (it
    * is nClusters tiny rows) with the pinned literal schema — no
    * inference job, no Spark sort. Shared by serving and append.
    */
  private def loadCentroids(
      spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Double]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructType}
    val centSchema = new StructType()
      .add("cluster", IntegerType).add("centroid", ArrayType(DoubleType))
    val cents = spark.read.schema(centSchema).parquet(s"$path/_centroids")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    require(cents.nonEmpty, s"no centroids under $path/_centroids")
    cents
  }

  /** The labeled-corpus schema pinned at build time ([[buildIvfIndex]]'s
    * `_schema.json`), read driver-side via the filesystem — no job.
    */
  private def loadIndexSchema(
      spark: org.apache.spark.sql.SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    val sp = new org.apache.hadoop.fs.Path(s"$path/_schema.json")
    val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(sp)
    try org.apache.spark.sql.types.DataType.fromJson(
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    finally in.close()
  }

  /** Append new corpus rows to a persisted [[buildIvfIndex]] index
    * WITHOUT retraining or rewriting existing data: label the new rows
    * against the frozen centroids (same codegen'd assignment as the
    * build) and append them into their `cluster=N` partition dirs. The
    * quantizer stays fixed — the standard IVF maintenance trade-off:
    * lists drift from optimal as the distribution shifts, but serving
    * correctness (exact search within probed lists) is unaffected;
    * rebuild when drift matters.
    *
    * The labeled rows must match the schema pinned at build time —
    * checked here (names + types), because a drifted append succeeds at
    * write time but poisons every future serving batch (the pinned-
    * schema scan hits a Parquet type mismatch, or nulls out renamed
    * columns).
    */
  def appendToIvfIndex(newRows: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = newRows.sparkSession
    val labeled = withClusters(newRows, vecCol, loadCentroids(spark, path), "cluster")
    val pinned = loadIndexSchema(spark, path)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
    require(shape(labeled.schema) == shape(pinned),
      s"append schema ${shape(labeled.schema)} does not match the indexed corpus ${shape(pinned)}")
    labeled
      .write.partitionBy("cluster").mode(org.apache.spark.sql.SaveMode.Append).parquet(path)
  }

  /** Serve a query batch from a persisted [[buildIvfIndex]] index.
    * Per batch: read the (tiny) centroid table driver-side, rank
    * clusters per query with codegen'd dot products against broadcast
    * centroid literals (no shuffle, no corpus scan — [[annIvf]]'s
    * representative aggregation over the full corpus is not needed:
    * the centroids ARE the representatives), keep the top `nprobe`,
    * and exact-search only those clusters.
    *
    * The probed-cluster set is collected with ONE bounded aggregation
    * over the query batch (≤ nClusters output rows) and pushed into the
    * corpus read as a STATIC `cluster IN (...)` partition filter — the
    * file listing itself prunes to the probed `cluster=N` dirs, with no
    * reliance on the dynamic-partition-pruning heuristic (which skips
    * plans whose query side has no Filter node, e.g. an already-
    * collapsed local batch). The same aggregation yields the query
    * count, so the broadcast guard costs no extra job.
    *
    * Same result contract as [[annIvf]] on the same labeling, with
    * probe ranking scored against the centroid itself (unit norm)
    * rather than the min-id medoid.
    */
  def annIvfIndexed(
      spark: org.apache.spark.sql.SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, nprobe: Int, k: Int,
      maxBroadcastQueries: Long = 1000000L,
      maxBroadcastBytes: Long = -1L,
  ): DataFrame = {
    // both schemas were pinned at build time: the centroid table's is a
    // known literal, the labeled corpus's is in _schema.json (read
    // driver-side via the filesystem — no inference job either way).
    // The centroid sort is driver-side too: it's nClusters tiny rows.
    val cents = loadCentroids(spark, path)
    val corpusSchema = loadIndexSchema(spark, path)
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    // per-query cluster ranking as one sorted literal array: struct sort
    // is (pcos asc, ni asc); reversed = pcos desc, then ni desc = LOWEST
    // cluster index on ties — the same tie-break annIvf's window uses.
    // Centroids are unit vectors, so pcos = dot / qn.
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(
        (call_function("graft_vec_dot", col("qv").cast("array<double>"), typedLit(c.toSeq)) / col("qn")).as("pcos"),
        lit(-i).as("ni"))
    }
    val probe = q
      .withColumn("__c", explode(slice(reverse(array_sort(array(scored: _*))), 1, nprobe)))
      .select(col("q_id"), col("qv"), col("qn"), (col("__c.ni") * -1).as("cluster"))
    // one job over the query batch: per-cluster probe counts. Σcount =
    // nQueries × nprobe bounds the broadcast; the keys are the probed
    // partition set. The probe projection re-runs in the join below,
    // but it is narrow map work (dot products vs literals) on the small
    // query side — re-computing beats caching or a second control job.
    val probeStats = probe.groupBy("cluster").count().collect()
    val probedClusters = probeStats.map(_.getInt(0))
    val probeRows = probeStats.map(_.getLong(1)).sum
    val n = withNorm(
      spark.read.schema(corpusSchema).parquet(path)
        .filter(col("cluster").isin(probedClusters.map(Int.box): _*)),
      vecCol)
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col(idCol))
    // byte-aware guard with no extra job: probe rows carry the query
    // vector, and the index pins the dimension (= centroid length)
    val probeB =
      if (probeRows <= maxBroadcastQueries &&
        estBytes(probeRows, probeRows * cents(0).length) <=
          resolveMaxBytes(queries, maxBroadcastBytes)) broadcast(probe)
      else probe
    probeB.join(n, Seq("cluster"))
      .filter(col(idCol) =!= col("q_id"))
      .selectExpr("q_id", idCol, s"${dotSpark("qv", vecCol)} / (qn * nrm) AS cosine")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol), col("cosine"))
  }

  /** Default row cap for [[cosineNearDups]]: above this the quadratic
    * candidate set is certainly a mistake on a real corpus (100k rows
    * is already 5e9 candidate pairs).
    */
  val ExactNearDupMaxRows = 100000L

  /** Exact cosine-threshold near-duplicate pairs — the QUADRATIC
    * correct-recall baseline, O(n²) candidate pairs BY DESIGN. It
    * exists to measure the recall of the scale paths ([[lshNearDups]],
    * [[annIvfIndexed]]); it is never the production dedup path.
    *
    * Guard: fails fast above `maxRows` input rows (default
    * [[ExactNearDupMaxRows]]) unless `exactOk = true`, so a caller
    * cannot point the recall baseline at a real corpus by accident.
    * The count costs one partial-agg job on the id column — noise next
    * to the n² join it gates.
    */
  /** Ceiling on the one-sided broadcast [[cosineNearDups]] uses to
    * parallelize its n² join: far under Spark's 8 GB broadcast limit
    * and a comfortable driver allocation, yet high enough that every
    * corpus the row guard admits (and the sf1 slope corpus) stays on
    * the fast path. An `exactOk = true` corpus estimated ABOVE it
    * falls back to the plain repartitioned join — slower, but it
    * completes where the broadcast would OOM the driver.
    */
  val ExactNearDupMaxBroadcastBytes: Long = 64L << 20

  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      maxRows: Long = ExactNearDupMaxRows, exactOk: Boolean = false,
      maxBroadcastBytes: Long = ExactNearDupMaxBroadcastBytes): DataFrame = {
    if (!exactOk) {
      val rows = df.select(col(idCol)).count()
      require(rows <= maxRows,
        s"cosineNearDups is the O(n²) exact recall baseline and got $rows rows (max $maxRows): " +
          "use lshNearDups/annIvfIndexed for corpus-scale near-dup, or pass exactOk = true " +
          "to run the quadratic join deliberately")
    }
    val n = withNorm(df, vecCol)
    // the n² join is COMPUTE-bound (a dot product per ordered pair):
    // spread the streamed side across every core and broadcast the
    // other explicitly — a small-file parquet corpus otherwise runs
    // the whole cross product on one or two input partitions
    // (measured 8x wall-clock at the sf1 slope point). The broadcast
    // is BYTE-guarded, not row-guarded: `exactOk = true` deliberately
    // bypasses the row guard, so a documented large-corpus run must
    // degrade to the repartitioned join instead of hitting Spark's
    // broadcast limit / driver OOM mid-flight.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val a = n.repartition(par)
      .select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b0 = n.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    val rowCap = math.max(maxBroadcastBytes / 32L, 0L)
    val (bRows, bElems) = boundedSize(df, vecCol, rowCap)
    val b =
      if (bRows <= rowCap && estBytes(bRows, bElems) <= maxBroadcastBytes) broadcast(b0)
      else b0
    a.join(b, col("id_a") < col("id_b"))
      .selectExpr("id_a", "id_b", s"${dotSpark("va", "vb")} / (na * nb) AS cosine")
      .filter(col("cosine") >= threshold)
  }

  /** [[cosineNearDups]] with the candidate volume BOUNDED BY A
    * CORPUS-PROBED budget — the exact-cosine near-dup use case's
    * budget-bounded member, the embedding-space sibling of
    * [[graft.api.TextCuration.jaccardNearDupsAuto]]'s df cap:
    *
    *   - BELOW the budget (n ≤ 2·budgetPairsPerVec + 1, where the full
    *     n(n-1)/2 exact join already fits budget·n pairs) this is
    *     [[cosineNearDups]] VERBATIM — a provable no-op, the regime
    *     the oracle-gate scales sit in.
    *   - ABOVE it, candidates come from multi-band sign-LSH
    *     amplification ([[graft.operators.VectorKit.bucketSparkBand]]:
    *     `bands` independent plane slices, OR-of-ANDs), with the
    *     planes-per-band count derived so each band's expected bucket
    *     occupancy is ~2·budget/bands — expected candidate volume
    *     ~budget·n, LINEAR in the corpus. Candidates are verified with
    *     the SAME left-fold exact cosine as the quadratic path, so
    *     precision is 1 and every reported cosine is bit-identical to
    *     what [[cosineNearDups]] would report for that pair; the
    *     documented trade is RECALL (per-pair 1 - (1 - r^p)^bands,
    *     r = 1 - θ/π) — the standard sign-LSH amplification trade,
    *     spent on the pairs FARTHEST from the threshold.
    *
    * The derived count is then AUDITED, not trusted: one bounded
    * aggregate measures the true candidate volume (Σ occ·(occ-1)/2
    * over every band's buckets — exact, not expected) and planes grow
    * until the measured volume fits the budget. A degenerate corpus
    * that no plane count can split (identical-vector mass shares every
    * sign) fails LOUDLY at `maxPlanesPerBand`, pointing at exact
    * dedup first — the [[semDedup]] eager-audit discipline: the
    * failure lands before the pair join is ever planned, never a
    * silent corpus² re-creation inside one bucket.
    *
    * Scale shape: candidate generation self-joins a slim (id, band,
    * bucket) frame — one shuffle of n·bands 24-byte rows, vectors
    * never ship — and only verification joins vector payloads, for
    * candidate rows only (≤ budget·n by the audit above). Returns
    * (pairs, decision) — the q162/q197/q208 decision-string
    * discipline; pairs are (id_a, id_b, cosine) exactly like
    * [[cosineNearDups]].
    */
  def cosineNearDupsAuto(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      budgetPairsPerVec: Long = 500L, bands: Int = 4,
      maxPlanesPerBand: Int = 16,
      /** When > 0, the band count DERIVES from (threshold, targetRecall)
        * instead of the fixed `bands` default: per-pair recall at the
        * threshold is the closed form 1 - (1 - r^p)^B (r = 1 - θ/π in
        * angle terms — the sign-agreement probability AT θ; every pair
        * above θ does better), so B = ⌈ln(1-targetRecall)/ln(1-r^p)⌉
        * the way p derives from the budget — and B GROWS with p inside
        * the occupancy-audit loop, so shrinking buckets to fit the
        * budget never silently spends the recall the caller pinned.
        */
      targetRecall: Double = 0.0): (DataFrame, String) = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(budgetPairsPerVec >= 1, s"budgetPairsPerVec >= 1: $budgetPairsPerVec")
    require(bands >= 1 && maxPlanesPerBand >= 1,
      s"need bands >= 1 and maxPlanesPerBand >= 1: $bands/$maxPlanesPerBand")
    require(targetRecall >= 0 && targetRecall < 1,
      s"targetRecall in [0,1) (0 disables recall sizing): $targetRecall")
    val n = df.count()
    if (n <= 2L * budgetPairsPerVec + 1L)
      // whole corpus under budget: the exact quadratic join IS within
      // the candidate budget — run it verbatim (provably identical
      // output, and cheaper: no bucketing, no dedup, no re-join)
      (cosineNearDups(df, idCol, vecCol, threshold, exactOk = true), s"exact(n=$n)")
    else {
      // bands per plane count: fixed (the `bands` param) unless
      // targetRecall pins the amplification level — then derived from
      // the closed form at each candidate p (the plane family is an
      // unbounded deterministic sequence, so B·p disjoint slices never
      // run out of planes)
      val rAgree = 1.0 - math.acos(threshold) / math.Pi
      def bandsFor(pl: Int): Int =
        if (targetRecall <= 0) bands
        else {
          val keep = math.pow(rAgree, pl)
          if (keep >= targetRecall) 1
          else math.max(1, math.ceil(
            math.log1p(-targetRecall) / math.log1p(-keep)).toInt)
        }
      var p = 1
      while (p < maxPlanesPerBand &&
        (n >> p) > math.max(1L, 2L * budgetPairsPerVec / bandsFor(p))) p += 1
      val nm = withNorm(df, vecCol)
      // slim (id, band, bucket): the only corpus-wide frame candidate
      // generation touches
      def slim(pl: Int) =
        nm.select(col(idCol).as("__id"), posexplode(expr(
          (0 until bandsFor(pl)).map(b =>
            graft.operators.VectorKit.bucketSparkBand(vecCol, pl, b * pl))
            .mkString("array(", ", ", ")"))).as(Seq("band", "bucket")))
      def volume(s: DataFrame): Long = s
        .groupBy("band", "bucket").agg(count(lit(1)).as("occ"))
        .agg(sum(expr("occ * (occ - 1) DIV 2"))).head().getLong(0)
      // the audit loop runs on the UNPINNED plan — each probe is one
      // map-only projection + aggregate, and pinning per iteration
      // would leak up to maxPlanesPerBand materialized frames of
      // executor storage (localCheckpoints have no unpersist hook);
      // only the ACCEPTED plane count pins, once, so the bands·p plane
      // dots compute once for both join sides below
      var vol = volume(slim(p))
      while (vol > budgetPairsPerVec * n && p < maxPlanesPerBand) {
        p += 1; vol = volume(slim(p))
      }
      require(vol <= budgetPairsPerVec * n,
        s"cosineNearDupsAuto: $vol candidate pairs exceed the ${budgetPairsPerVec * n} " +
          s"budget even at $maxPlanesPerBand planes/band — either an identical-vector " +
          "mass shares every sign (exact-dedup the corpus first: exactDups / semDedup), " +
          "or the vectors are not dim-64 (a plane projection on a mismatched length is " +
          "NULL, folding every row into bucket 0 — the VectorKit planes are 64-wide); " +
          "or raise the budget knowingly")
      val sl = graft.operators.Lineage.pin(slim(p))
      val cand = sl.select(col("__id").as("id_a"), col("band"), col("bucket"))
        .join(sl.select(col("__id").as("id_b"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val va = nm.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"))
      val vb = nm.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"))
      val pairs = cand
        .join(va.hint("SHUFFLE_HASH"), "id_a")
        .join(vb.hint("SHUFFLE_HASH"), "id_b")
        .selectExpr("id_a", "id_b", s"${dotSpark("va", "vb")} / (na * nb) AS cosine")
        .filter(col("cosine") >= threshold)
      val recallNote = if (targetRecall > 0) s",targetRecall=$targetRecall" else ""
      (pairs, s"lsh(bands=${bandsFor(p)},planesPerBand=$p,n=$n,candidates=$vol$recallNote)")
    }
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", 2023 — public literature, not code): cluster the
    * corpus, then mark as duplicates only vectors with a
    * higher-priority near-twin IN THE SAME CLUSTER. The clustering
    * bounds the candidate set to Σ cluster² instead of corpus² — the
    * whole point of the method at web scale — at the price of missing
    * the (rare) near-dup pair the quantizer split across clusters.
    *
    * This composition uses [[kcenterAssign]] (deterministic, exact
    * arithmetic) as the clustering, so the full pipeline — selection,
    * assignment, within-cluster pairs, keep flags — is bit-identical
    * across engines and partitionings (q124 is hash-gated end to end).
    * Duplicate rule: drop v iff some u < v in v's cluster has
    * cos(u, v) ≥ `minCosine` (greedy keep-lowest-id, the deterministic
    * stand-in for the paper's keep-farthest-from-centroid).
    *
    * Returns (idCol, center_id, keep). Scale shape: assignment is
    * map-only (literal centers); the pair probe is ONE self-join
    * shuffled on center_id, and the keep flag is a left anti join on
    * the dropped set — no corpus² product anywhere — PROVIDED the
    * clustering actually divided the corpus. That is what
    * `maxClusterSize` enforces: Σ cluster² is only sub-quadratic when
    * no cluster is a catch-all, and a k too small for the corpus (or a
    * degenerate embedding space) silently re-creates corpus² inside
    * one cluster. The audit is one linear aggregate over the
    * assignment, evaluated EAGERLY so the failure lands before the
    * pair join is ever planned (the [[graft.operators.Graph]]
    * mega-basket pattern); callers with legitimately huge clusters
    * raise the cap knowingly — or raise k, which is the real fix.
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               startId: Long, minCosine: Double,
               maxClusterSize: Long = 200000L): DataFrame = {
    // pinned: the assignment scan (k dot products per row, the most
    // expensive map stage here) computes ONCE and feeds both the eager
    // audit and the pair-join path — the Pareto.abcClassify pattern
    val asn = graft.operators.Lineage.pin(
      kcenterAssign(corpus, idCol, vecCol, k, startId)
        .select(col(idCol), col("center_id")))
    val over = asn.groupBy(col("center_id")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") > maxClusterSize)
      .limit(1).collect()
    require(over.isEmpty,
      s"semDedup cluster ${over.headOption.map(_.get(0)).getOrElse("")} holds " +
        s"${over.headOption.map(_.get(1)).getOrElse("")} vectors > maxClusterSize=$maxClusterSize — " +
        "the within-cluster pair join is quadratic per cluster; raise k (preferred) " +
        "or raise maxClusterSize deliberately")
    val n = withNorm(corpus, vecCol).join(asn, idCol)
    val a = n.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("nrm").as("na"), col("center_id"))
    val b = n.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("nrm").as("nb"), col("center_id"))
    val dropped = a.join(b, Seq("center_id"))
      .filter(col("id_a") < col("id_b"))
      .selectExpr("id_b", s"${dotSpark("va", "vb")} / (na * nb) AS cosine")
      .filter(col("cosine") >= minCosine)
      .select(col("id_b").as("__dup"))
      .distinct()
    n.join(dropped, col(idCol) === col("__dup"), "left")
      .select(col(idCol), col("center_id"), col("__dup").isNull.as("keep"))
  }

  /** Fixed-point grid for [[exactCentroids]]: 2^24 ≈ the float32 ulp at
    * magnitude 1, so the truncation discards nothing a unit-scale
    * embedding component reliably carries.
    */
  val CentroidFixedPointScale: Long = 1L << 24

  /** Exact per-group centroids — the k-means centroid-update primitive
    * (and the embedding mean-pooling step), without float-sum
    * nondeterminism: naive `avg(x_d)` accumulates doubles in partition
    * order, so two runs of the same update can disagree in the last
    * bits and a cluster assignment can flip between runs. Decimal
    * rounding of the inputs is no better CROSS-ENGINE: double→decimal
    * HALF_UP ties resolve differently per implementation (measured: 1
    * divergent component in 32k). So components land on a fixed-point
    * grid instead — `floor(x · 2^24)` is an EXACT power-of-two multiply
    * + exact floor, the per-dimension sums are plain BIGINTs
    * (order-free, partial-agg map-side), and the mean is one IEEE
    * division at the end — bit-identical on any partitioning and
    * engine (q128 is hash-gated), at 2^-24 resolution ≈ the float ulp
    * at magnitude 1.
    *
    * Returns the flat (labelCol, dim, n_vectors, mean_val) layout —
    * one row per (group, dimension); `array_agg` back by dim if an
    * array column is needed. Scale shape: one posexplode (rows ×
    * dims through a map stage) + one partial-agged shuffle on
    * (label, dim) — never a per-group vector buffer.
    */
  def exactCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val s = CentroidFixedPointScale
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col(labelCol), col("dim").cast("long").as("dim"),
        expr(s"CAST(floor(CAST(__x AS DOUBLE) * ${s}D) AS BIGINT)").as("__xf"))
      .groupBy(col(labelCol), col("dim"))
      .agg(count(lit(1)).as("n_vectors"),
        (sum(col("__xf")).cast("double") /
          (count(lit(1)) * lit(s)).cast("double")).as("mean_val"))
  }

  /** Symmetric int8 quantization stats per vector: `scale` = max|x|/127,
    * each component mapped to round-half-up(x/scale) clamped to
    * [-127, 127], plus the reconstruction error (`err_l2`, `rmse`) of
    * dequantizing back. The embedding-compression step of a large ANN
    * serving stack (16× smaller than float64, 4× smaller than float32).
    *
    * Determinism: floats widen to double before any arithmetic; the
    * round is an explicit floor(x/scale + 0.5) — never a libm/banker's
    * round — and the squared-error reduction is a strict left fold in
    * index order, so results are bit-identical across engines and
    * partitionings. All-zero vectors quantize to scale 0 with zero
    * error rather than dividing by zero.
    *
    * Scale shape: narrow per-row expressions inside the scan pipeline —
    * no shuffle, no UDFs. `__mx` is materialized one projection below
    * its uses so the per-element lambda never re-evaluates the max
    * (multi-referenced non-cheap aliases are not collapsed into
    * consumers by Catalyst; see the HOF-inlining note in TextKit).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // per-dim quantized value as a SQL snippet over element `qx` (double)
    def qOf(x: String) = s"greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), floor($x / __scale + 0.5d)))"
    val sqErr = s"aggregate(transform($vecCol, qx -> " +
      s"(CAST(qx AS DOUBLE) - ${qOf("CAST(qx AS DOUBLE)")} * __scale) * " +
      s"(CAST(qx AS DOUBLE) - ${qOf("CAST(qx AS DOUBLE)")} * __scale)), " +
      "CAST(0.0 AS DOUBLE), (qe_acc, qe_v) -> qe_acc + qe_v)"
    df.select(col(idCol), col(vecCol),
        expr(s"array_max(transform($vecCol, qm -> abs(CAST(qm AS DOUBLE))))").as("__mx"))
      .withColumn("__scale", col("__mx") / 127.0)
      .selectExpr(
        idCol,
        s"CAST(size($vecCol) AS BIGINT) AS n_dims",
        "__scale AS scale",
        // scale == 0 iff max|x| == 0 (the all-zero vector): quantized
        // and reconstructed values are all zero, so the error is zero —
        // testing scale (not __mx) keeps __mx single-referenced, so
        // CollapseProject folds it into __scale without duplicating the
        // array_max pass.
        s"CASE WHEN __scale = 0.0d THEN 0.0d ELSE sqrt($sqErr) END AS err_l2")
      .withColumn("rmse", col("err_l2") / sqrt(col("n_dims").cast("double")))
  }

  // ---- product quantization ---------------------------------------------

  /** The k seed vectors (smallest ids) pivoted to one wide broadcastable
    * row `__s0..__s{k-1}` — the deterministic PQ codebook. Seeds instead
    * of trained centroids keeps every downstream number reproducible in
    * ANY engine (the same design choice as q32's min-id medoid coarse
    * quantizer); the codebook is an input, so a Lloyd-trained one drops
    * in without touching encode/serve.
    */
  private def seedRow(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(vecCol))
      .withColumn("__code",
        row_number().over(Window.orderBy(col(idCol))) - 1)
    // fewer than k rows would leave null codebook columns and null
    // distances downstream — fail eagerly (the k-row probe is bounded)
    require(seeds.count() == k, s"PQ codebook needs $k seed rows; corpus has fewer")
    val aggs = (0 until k).map(c =>
      first(when(col("__code") === c, col(vecCol)), ignoreNulls = true).as(s"__s$c"))
    // pin the 1-row result: every broadcast reference (encode AND the
    // ADC scorer) would otherwise re-run the corpus top-k + pivot
    graft.operators.Lineage.pin(seeds.agg(aggs.head, aggs.tail: _*))
  }

  /** Per-subspace Lloyd k-means PQ codebooks — the trained upgrade of
    * the seed codebook, same scale recipe as [[trainCentroids]]:
    * training is driver-side over a BOUNDED deterministic sample (the
    * `sampleN` lowest-id vectors; sampleN x k x dim flops per
    * iteration, independent of corpus size), then encode/serve are the
    * same distributed passes. Init per subspace = the first k distinct
    * subvectors in id order; an emptied cluster keeps its previous
    * centroid; ties break to the lowest code. Returns the codebook as
    * the same 1-row broadcastable frame [[pqEncode]]'s seed path
    * builds (`__s<c>` = the concatenation across subspaces of
    * centroid c — per-subspace argmin makes the concatenated columns
    * exactly a product codebook), so the trained book drops into
    * [[pqEncodeWith]]/[[pqAdcSearchWith]] unchanged.
    */
  def pqTrain(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int = 10, sampleN: Int = 4096): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val sample = corpus.orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(r => toDoubles(r.getSeq[Any](0)).toArray)
    require(sample.length >= k, s"PQ training needs >= $k sample vectors, got ${sample.length}")
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      var cents = pts.map(_.toSeq).distinct.take(k).map(_.toArray)
      if (cents.length < k) // degenerate subspace: pad with repeats
        cents = Array.tabulate(k)(c => cents(c % cents.length).clone())
      (0 until iters).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Long](k)
        pts.foreach { p =>
          var best = 0; var bd = l2(p, cents(0)); var c = 1
          while (c < k) { val d = l2(p, cents(c)); if (d < bd) { bd = d; best = c }; c += 1 }
          counts(best) += 1
          var i = 0; while (i < sub) { sums(best)(i) += p(i); i += 1 }
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c)))
      }
      cents
    }
    val spark = corpus.sparkSession
    val cols = (0 until k).map { c =>
      val full = (0 until m).flatMap(j => books(j)(c))
      expr(s"array(${full.map(d => s"${d}D").mkString(", ")})").as(s"__s$c")
    }
    graft.operators.Lineage.pin(spark.range(1).select(cols: _*))
  }

  /** [[pqEncode]] with an explicit codebook row (seeded or
    * [[pqTrain]]ed).
    */
  def pqEncodeWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, codebookRow: DataFrame): DataFrame =
    encodeWith(corpus, idCol, vecCol, dim, m, k, codebookRow)

  /** Product-quantization encode: split each `dim`-dim vector into `m`
    * subspaces and store, per subspace, the index of the nearest (L2)
    * of `k` codebook vectors — `dim * 4` bytes of floats become `m`
    * small ints. This is the memory arithmetic that serves
    * billion-vector ANN from RAM: at dim=64/m=8 the corpus compresses
    * 32x, and reranking reads the original vectors for finalists only.
    *
    * Plan shape: ONE map-only projection — the codebook crosses in as
    * a single broadcast row, each code an argmin over k subspace
    * distances (index-order folds, so codes are engine-reproducible;
    * ties break to the smallest code via array_position-of-min).
    */
  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int): DataFrame =
    encodeWith(corpus, idCol, vecCol, dim, m, k, seedRow(corpus, idCol, vecCol, k))

  private def encodeWith(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, codebookRow: DataFrame): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val codes = (0 until m).map { j =>
      val dists = (0 until k)
        .map(c => l2SubSpark(vecCol, s"__s$c", j * sub, sub)).mkString(", ")
      s"CAST(array_position(array($dists), array_min(array($dists))) - 1 AS INT)"
    }.mkString(", ")
    corpus.crossJoin(broadcast(codebookRow))
      .selectExpr(idCol, s"array($codes) AS codes")
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query scores a
    * corpus row as the sum over subspaces of the exact L2² between the
    * QUERY subvector and the row's CODEBOOK subvector — the query side
    * stays unquantized, the corpus side is m code lookups, never the
    * original vector. Here the per-(query,subspace,code) distances
    * evaluate inline against the broadcast codebook row; a large-scale
    * serve precomputes them once per query (the m*k LUT) — same
    * arithmetic, amortized.
    *
    * Plan: codes are one map pass ([[pqEncode]]), queries broadcast,
    * ranking is a per-query window — corpus streams once, no
    * corpus x corpus product.
    */
  def pqAdcSearch(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, topK: Int): DataFrame =
    pqAdcSearchWith(corpus, queries, idCol, vecCol, dim, m, k, topK,
      seedRow(corpus, idCol, vecCol, k))

  /** [[pqAdcSearch]] with an explicit codebook row (seeded or
    * [[pqTrain]]ed) — ONE codebook shared by the encode pass and the
    * ADC scorer.
    */
  def pqAdcSearchWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, topK: Int, codebookRow: DataFrame): DataFrame = {
    val sub = dim / m
    val sw = codebookRow
    val enc = encodeWith(corpus, idCol, vecCol, dim, m, k, sw)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val adc = (0 until m).map { j =>
      val cases = (0 until k)
        .map(c => s"WHEN $c THEN ${l2SubSpark("qv", s"__s$c", j * sub, sub)}")
        .mkString(" ")
      s"(CASE element_at(codes, ${j + 1}) $cases END)"
    }.mkString(" + ")
    enc
      .join(broadcast(q), col(idCol) =!= col("q_id"))
      .crossJoin(broadcast(sw))
      .selectExpr("q_id", idCol, s"$adc AS adc")
      .withColumn("rank",
        row_number().over(Window.partitionBy("q_id").orderBy(col("adc"), col(idCol))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col(idCol), col("adc"))
  }

  /** The measure→route loop for similarity search, closing the ANN
    * family the way [[graft.operators.Skew.autoPlan]] closes the join
    * family: measure the corpus (one O(metadata) bounded count), then
    * pick the serving layout the data actually warrants —
    *
    *  - `brute`: corpus small enough to stream per query set — the
    *    exact answer IS the cheap answer, an index would only add
    *    build cost and recall risk;
    *  - `ivf-indexed`: a persisted [[buildIvfIndex]] artifact exists
    *    whose pinned schema matches the corpus — serve from it
    *    ([[annIvfIndexed]]): no training, no labeling, the scan prunes
    *    to the probed `cluster=N` partition dirs. A missing/torn/
    *    drifted index silently falls through to a rebuild path: the
    *    index is an optimization, never a correctness dependency;
    *  - `ivf`: a partition/cluster column exists — probe the nprobe
    *    nearest coarse partitions ([[annIvf]]), partition-pruned on a
    *    clustered layout;
    *  - `ivf-trained`: no cluster column — train the deterministic
    *    spherical-k-means coarse quantizer on a bounded sample and
    *    assign in one map pass ([[annIvfAuto]]).
    *
    * Returns (results, decision) with the SAME output shape
    * (q_id, rank, id, cosine) on every branch, so callers compose
    * without caring which plan won; the decision string is the audit
    * surface specs pin. The brute threshold is rows-based because the
    * brute cost is corpus × queries streaming work — size it to what
    * one executor wave comfortably scans.
    */
  def annRoute(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int,
      partCol: Option[String] = None, nprobe: Int = 2,
      bruteMaxRows: Long = 200000L, trainK: Int = 16,
      indexPath: Option[String] = None): (DataFrame, String) = {
    val (rows, _) = boundedSize(corpus, vecCol, bruteMaxRows)
    if (rows <= bruteMaxRows)
      (knn(corpus, queries, idCol, vecCol, k), "brute")
    else indexPath.filter(servableIndex(corpus.sparkSession, _, corpus.schema)) match {
      // a built [[buildIvfIndex]] beats every rebuild path: serving
      // reads the tiny centroid table + only the probed cluster=N
      // partition dirs, with zero training and zero corpus labeling
      // per call — the train-once/serve-many shape a deployment runs.
      // The corpus argument is NOT scanned on this branch (the index
      // IS the corpus); the schema check pins that they agree.
      case Some(p) =>
        (annIvfIndexed(corpus.sparkSession, p, queries, idCol, vecCol, nprobe, k), "ivf-indexed")
      case None => partCol match {
        case Some(pc) => (annIvf(corpus, queries, idCol, vecCol, pc, nprobe, k), "ivf")
        case None => (annIvfAuto(corpus, queries, idCol, vecCol, k, nprobe, trainK), "ivf-trained")
      }
    }
  }

  /** Is a [[buildIvfIndex]] artifact at `path` servable for a corpus of
    * this schema? True iff the pinned labeled-corpus schema is exactly
    * the corpus schema plus the `cluster` label (the [[appendToIvfIndex]]
    * shape guard) and the centroid table loads. Any failure — missing
    * dir, torn build, drifted schema — routes to a rebuild path instead
    * of failing the query: an index is an OPTIMIZATION, never a
    * correctness dependency.
    */
  private def servableIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      corpusSchema: org.apache.spark.sql.types.StructType): Boolean =
    try {
      val pinned = loadIndexSchema(spark, path)
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
      val want = shape(corpusSchema) :+
        ("cluster" -> org.apache.spark.sql.types.IntegerType.catalogString)
      shape(pinned) == want && loadCentroids(spark, path).nonEmpty
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Hard-negative mining for contrastive training (the batch-mining
    * step behind triplet/InfoNCE data prep — Xiong et al. 2021's ANCE
    * retrieves hard negatives exactly this way): for each anchor, the
    * `k` most-similar corpus vectors with a DIFFERENT label — maximally
    * confusing non-matches, which carry far more gradient signal than
    * random negatives. Same plan shape as [[knn]] (broadcast anchors,
    * stream the corpus once, per-anchor ranking window); the label
    * inequality rides the join condition, so mismatched pairs are
    * dropped before they reach the window. Exact left-fold cosines —
    * hash-gated like every similarity op.
    */
  def hardNegatives(
      corpus: DataFrame, anchors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    val n = withNorm(corpus, vecCol)
    val q = withNorm(anchors, vecCol)
      .select(col(idCol).as("q_id"), col(labelCol).as("q_label"),
        col(vecCol).as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col(idCol))
    n.join(broadcast(q), col(idCol) =!= col("q_id") && col(labelCol) =!= col("q_label"))
      .selectExpr("q_id", "q_label", idCol, labelCol,
        s"${dotSpark("qv", vecCol)} / (qn * nrm) AS cosine")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label"), col("rank"), col(idCol),
        col(labelCol).as("neg_label"), col("cosine"))
  }

  /** IVF + PQ composed serving (IVFADC — Jégou et al. 2011 §IV, the
    * layout behind billion-vector FAISS indexes): the inverted file
    * bounds WHICH rows each query scores (only the `nprobe` nearest
    * coarse partitions), and product quantization bounds WHAT each
    * scored row reads (`m` small codes of its RESIDUAL to the coarse
    * representative — never the original vector). Residual encoding is
    * what distinguishes IVFADC from flat PQ ([[pqAdcSearch]]): codes
    * spend their bits on the within-partition offset, which is where
    * the information is once the coarse id is known.
    *
    * Determinism contract (hash-gated end to end like q32/q184): the
    * coarse representative is the min-id medoid per partition, the
    * codebook is the residual of the k lowest-id corpus rows, every
    * subspace distance is the exact index-order left fold
    * ([[graft.operators.VectorKit.l2SubSpark]]), argmin ties break to
    * the smallest code, probe/rank ties to the smallest partition/id.
    *
    * Plan shape at 100 TB: reps and codebook are fixed-cardinality
    * broadcasts; residual + encode are ONE map pass over the corpus;
    * the probe list (queries x nprobe) broadcasts into an equi-join on
    * the partition key — with the corpus laid out by `partCol`, that
    * join is partition-pruned, so per-query work is nprobe partitions
    * of m-byte codes. No corpus x corpus product anywhere.
    */
  def ivfPqSearch(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, partCol: String,
      dim: Int, m: Int, k: Int, nprobe: Int, topK: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    require(nprobe >= 1 && topK >= 1, s"need nprobe >= 1 and topK >= 1: $nprobe, $topK")
    requireIntegralId(corpus, idCol, "ivfPqSearch")
    val sub = dim / m
    def resExpr(v: String, r: String) =
      s"zip_with($v, $r, (rx, ry) -> CAST(rx AS DOUBLE) - CAST(ry AS DOUBLE))"
    // coarse reps: deterministic min-id medoid per partition key —
    // fixed cardinality, always broadcastable
    val rep = corpus.groupBy(partCol).agg(min_by(col(vecCol), col(idCol)).as("rv"))
    // residual corpus: one broadcast join + map-only subtraction
    val cres = corpus.join(broadcast(rep), Seq(partCol))
      .selectExpr(partCol, idCol, s"${resExpr(vecCol, "rv")} AS res")
    // codebook = residuals of the k lowest-id rows, pivoted to the same
    // 1-row broadcastable shape as pqEncode's seed book, then pinned so
    // encode and the ADC scorer share ONE computed codebook
    val seeds = cres.orderBy(col(idCol)).limit(k)
      .withColumn("__code", row_number().over(Window.orderBy(col(idCol))) - 1)
    require(seeds.count() == k, s"IVF-PQ codebook needs $k seed rows; corpus has fewer")
    val aggs = (0 until k).map(c =>
      first(when(col("__code") === c, col("res")), ignoreNulls = true).as(s"__s$c"))
    val sw = graft.operators.Lineage.pin(seeds.agg(aggs.head, aggs.tail: _*))
    // encode: argmin over k subspace distances, per subspace — map-only
    val codes = (0 until m).map { j =>
      val dists = (0 until k)
        .map(c => l2SubSpark("res", s"__s$c", j * sub, sub)).mkString(", ")
      s"CAST(array_position(array($dists), array_min(array($dists))) - 1 AS INT)"
    }.mkString(", ")
    val enc = cres.crossJoin(broadcast(sw))
      .selectExpr(partCol, idCol, s"array($codes) AS codes")
    // probe: rank coarse partitions by full-vector L2 to the rep, keep
    // nprobe, and carry the query's RESIDUAL to each probed rep — the
    // ADC left operand
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val wp = Window.partitionBy("q_id").orderBy(col("pdist"), col(partCol))
    val probe = q.crossJoin(broadcast(rep))
      .withColumn("pdist", expr(l2SubSpark("qv", "rv", 0, dim)))
      .withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= nprobe)
      .selectExpr("q_id", partCol, s"${resExpr("qv", "rv")} AS qres")
    // ADC within probed partitions only: score = sum over subspaces of
    // exact L2² between the query residual and the row's CODED centroid
    val adc = (0 until m).map { j =>
      val cases = (0 until k)
        .map(c => s"WHEN $c THEN ${l2SubSpark("qres", s"__s$c", j * sub, sub)}")
        .mkString(" ")
      s"(CASE element_at(codes, ${j + 1}) $cases END)"
    }.mkString(" + ")
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col(idCol))
    enc.join(broadcast(probe), Seq(partCol))
      .filter(col(idCol) =!= col("q_id"))
      .crossJoin(broadcast(sw))
      .selectExpr("q_id", idCol, s"$adc AS adc")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col(idCol), col("adc"))
  }

  /** Sign-LSH bucketed near-dup pairs: candidates only within a bucket
    * (one shuffle on bucket id), exact cosine on candidates.
    */
  def lshNearDups(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val bk = withNorm(df, vecCol).withColumn("bucket", expr(bucketSpark(vecCol)))
    val a = bk.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"), col("bucket"))
    val b = bk.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .selectExpr("id_a", "id_b", "bucket", s"${dotSpark("va", "vb")} / (na * nb) AS cosine")
      .filter(col("cosine") >= threshold)
  }

  /** [[lshNearDups]] with the plane count DERIVED FROM THE CORPUS —
    * the scale path the sf1 slope run motivated: with the fixed
    * 4-plane/16-bucket config, bucket occupancy grows linearly with
    * the corpus and within-bucket candidate pairs quadratically (10x
    * data measured ~35x work). Here `planes = ceil(log2(n /
    * targetBucketRows))` (clamped to [[graft.operators.VectorKit.LshPlanes]]
    * .. `maxPlanes`), so expected occupancy stays ~`targetBucketRows`
    * and candidate volume ~n·target — LINEAR in the corpus. The count
    * probe is one bounded aggregate (O(1) result rows).
    *
    * The knob is the standard sign-LSH occupancy/recall trade: each
    * extra plane halves expected bucket size AND adds one more sign
    * agreement a pair must satisfy (per-pair recall (1 - θ/π)^planes),
    * so callers choose `targetBucketRows` by how much recall the
    * downstream near-dup sweep needs; the chosen count returns with
    * the frame for auditability (the q162/q197 decision-string
    * discipline).
    */
  def lshNearDupsAuto(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      targetBucketRows: Long = 250L, maxPlanes: Int = 16): (DataFrame, Int) = {
    require(targetBucketRows >= 1 && maxPlanes >= graft.operators.VectorKit.LshPlanes,
      s"need targetBucketRows >= 1 and maxPlanes >= ${graft.operators.VectorKit.LshPlanes}")
    val n = df.count()
    var planes = graft.operators.VectorKit.LshPlanes
    while (planes < maxPlanes && (n >> planes) > targetBucketRows) planes += 1
    val bk = withNorm(df, vecCol)
      .withColumn("bucket", expr(graft.operators.VectorKit.bucketSpark(vecCol, planes)))
    val a = bk.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("nrm").as("na"), col("bucket"))
    val b = bk.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("nrm").as("nb"), col("bucket").as("bucket_b"))
    val pairs = a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .selectExpr("id_a", "id_b", "bucket", s"${dotSpark("va", "vb")} / (na * nb) AS cosine")
      .filter(col("cosine") >= threshold)
    (pairs, planes)
  }

  // ---- greedy k-center (farthest-first) --------------------------------

  /** One row of any element type to exact doubles: embeddings are
    * float or double arrays; every element widens exactly.
    */
  private def toDoubles(v: Seq[Any]): Seq[Double] = v.map {
    case f: java.lang.Float  => f.toDouble
    case d: java.lang.Double => d.doubleValue
    case x => throw new IllegalArgumentException(s"non-float vector element: $x")
  }

  /** Driver-side twin of the engines' left-fold dot product: products
    * in index order, accumulated left-to-right — bit-identical to
    * graft_vec_dot / DuckDB list_reduce on the same (widened) values.
    */
  /** Reject non-integral id columns by name instead of letting
    * `cast("long")` null them out (which would surface as a misleading
    * "startId not present in the corpus" on a fully-populated table).
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op requires an integral id column (byte/short/int/long); " +
        s"$idCol is ${dt.simpleString} — map it to a long id first")
  }

  private def dotExact(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** The vector as an exact Spark SQL double-array literal:
    * Double.toString is shortest-round-trip and the parser reads the
    * decimal/E-notation text back to the same double (the same contract
    * [[graft.operators.VectorKit.projSpark]] relies on for the LSH
    * plane literals).
    */
  private def arrLit(v: Seq[Double]): String =
    v.map(d => s"${d}D").mkString("array(", ", ", ")")

  /** Greedy k-center selection (Gonzalez farthest-first, the classic
    * 2-approximation): start from `startId`, then k-1 times pick the
    * point with the smallest best-cosine to any chosen center (= the
    * farthest point under cosine distance), ties broken by id
    * ascending. The diversity-maximizing coreset selector a curation
    * pipeline uses to pick spread-out exemplars — and, unlike k-means,
    * fully deterministic with EXACT arithmetic: centers are data
    * vectors (never averaged floats), distances flow through the same
    * left-fold dot product as every other vector op, so engine and
    * oracle agree bit-for-bit.
    *
    * Scale shape: k passes over the corpus, each one scan + a
    * TakeOrderedAndProject(1) (per-partition heaps, 1-row driver
    * merge); the chosen center is re-injected as a LITERAL array, so
    * no growing join tree and nothing corpus-sized ever reaches the
    * driver. The running best-cosine column accrues one dot product
    * per round (pass i evaluates i dots per row — O(n·k²) total, the
    * textbook bound's constant; fine for the k ≤ a few dozen this
    * selector is for).
    *
    * Returns the centers in selection order: (rank from 1, id, widened
    * vector).
    *
    * Id contract (here and [[kcenterAssign]]): `idCol` must be an
    * integral type (byte/short/int/long) — centers are tracked as
    * longs and ties break on the numeric id. A string or other
    * non-integral id would cast to null and silently empty the corpus,
    * so it is rejected up front.
    */
  def kcenters(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               startId: Long): Seq[(Int, Long, Seq[Double])] = {
    require(k >= 1, s"k must be >= 1: $k")
    requireIntegralId(corpus, idCol, "kcenters")
    val n = withNorm(corpus, vecCol)
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"), col("nrm"))
    val firstRows = n.filter(col("__id") === startId).select("__id", "__v").take(1)
    require(firstRows.nonEmpty, s"startId $startId not present in the corpus")
    val centers = scala.collection.mutable.ArrayBuffer(
      (1, startId, toDoubles(firstRows.head.getSeq[Any](1))))
    def simTo(v: Seq[Double]): String = {
      val nrm = math.sqrt(dotExact(v, v))
      s"graft_vec_dot(__v, ${arrLit(v)}) / (nrm * ${nrm}D)"
    }
    var cand = n.filter(col("__id") =!= startId)
      .withColumn("__s", expr(simTo(centers.head._3)))
    var exhausted = false
    for (i <- 2 to k if !exhausted) {
      val nxt = cand.orderBy(col("__s").asc, col("__id").asc).limit(1)
        .select("__id", "__v").take(1)
      if (nxt.isEmpty) {
        // fewer distinct points than k: every point is a center already
        exhausted = true
      } else {
        val (id, v) = (nxt.head.getLong(0), toDoubles(nxt.head.getSeq[Any](1)))
        centers += ((i, id, v))
        if (i < k)
          cand = cand.filter(col("__id") =!= id)
            .withColumn("__s", expr(s"greatest(__s, ${simTo(v)})"))
      }
    }
    centers.toSeq
  }

  /** k-center clustering: select centers with [[kcenters]], then assign
    * every point to its best center (max cosine, ties to the
    * earlier-selected center). Returns (idCol, center_id, cosine).
    *
    * The assignment is MAP-ONLY: the k centers are literal arrays
    * folded with `greatest` over (cosine, -rank, center_id) structs —
    * no join, no shuffle, one corpus scan (struct comparison is
    * lexicographic, so max cosine wins and rank breaks ties).
    */
  def kcenterAssign(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                    startId: Long): DataFrame = {
    val centers = kcenters(corpus, idCol, vecCol, k, startId)
    val n = withNorm(corpus, vecCol)
    val branches = centers.map { case (rank, cid, v) =>
      val nrm = math.sqrt(dotExact(v, v))
      s"struct(graft_vec_dot($vecCol, ${arrLit(v)}) / (nrm * ${nrm}D) AS cosine, " +
        s"CAST(${-rank} AS INT) AS nr, CAST($cid AS BIGINT) AS center_id)"
    }
    val best =
      if (branches.size == 1) branches.head else s"greatest(${branches.mkString(", ")})"
    n.withColumn("__best", expr(best))
      .selectExpr(idCol, "__best.center_id AS center_id", "__best.cosine AS cosine")
  }
}
