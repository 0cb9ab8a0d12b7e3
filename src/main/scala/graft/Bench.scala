package graft

/** Benchmark main. Runs every catalog query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Session comes from Engine.session (single config source). A short
  * untimed warmup pass first: JVM/codegen/parquet-footer warmup is real
  * cost on a cluster too, but it is amortized over hours there — folding
  * it into the first timed query would misattribute it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "graft-bench")
    // warmup: one tiny action + touch each table's footer/codegen path
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.customer, t.events, t.documents, t.embeddings)
      .foreach(df => df.limit(1).collect())
    // noop sink: executes the FULL projection. count() would let
    // Catalyst prune payload expressions and sorts, so projection-heavy
    // queries (fingerprints, scalar funcs) would time a row-count scan.
    // Interleaved sweeps (all queries, then again, x5; per-query min
    // across sweeps): a noisy-neighbor window on this shared box then
    // poisons at most one sample of each query instead of every sample
    // of the query that happened to run inside it. (5 sweeps, up from 3:
    // sustained external load widened window-to-window spread to ~1.4x
    // late in round 7; min over more interleaved samples only discards
    // interference, never real work. tools/time_oracle.py uses the same
    // count, so numerator and denominator stay protocol-matched.) Reports the amortized
    // steady state a long-lived session reaches after codegen compilation.
    // optional args = query-name subset, for targeted perf work
    val only = args.toSet
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to 5; name <- names if !failed(name)) {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (!best.contains(name) || sec < best(name)) best(name) = sec
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
      }
    }
    // Failures record a -1 sentinel, are excluded from the total, and
    // force a nonzero exit: a regression into a fast crash must never
    // read as an improvement.
    val qs = names.map { n =>
      val v = if (failed(n)) "-1" else best(n).toString
      s"\"" + n + "\":" + v
    }.mkString("{", ",", "}")
    val total = names.filterNot(failed).map(best).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}"""
    println(json)
    // Machine-readable artifact: the stdout line is subject to log
    // truncation (round 7 lost 28 queries' timings to it); the file is
    // the audit-grade record. Path override via SPARK_GRAFT_BENCH_OUT.
    // Default lives under target/ (untracked) so ad-hoc runs cannot
    // clobber the committed window artifact; the window script passes
    // SPARK_GRAFT_BENCH_OUT=bench_full.json explicitly when it means to.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    }
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
