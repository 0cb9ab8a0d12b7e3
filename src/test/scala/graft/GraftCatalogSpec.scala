package graft

import graft.sources.{ManifestTable, MemberIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._

/** The DSv2 TableCatalog ([[graft.sources.GraftCatalog]]): SQL against
  * `graft.<ns>.<table>` with no view registration, VERSION AS OF time
  * travel, and manifest pruning (envelopes + Bloom) engaged inside the
  * V2 scan builder.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = tmpDir("graft-warehouse").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", w)
    w
  }

  private def mkTable(ns: String, name: String, files: Int = 5): String = {
    val dir = s"$warehouse/$ns/$name"
    new java.io.File(dir).mkdirs()
    val df = (1 to 1000).map(i => (i.toLong, ((i * 613) % 1000).toLong, s"s${i % 13}"))
      .toDF("id", "k", "cat")
    ManifestTable.commit(df.repartitionByRange(files, $"id"), dir, track = Seq("id"))
    dir
  }

  /** Files the executed V2 plan will open. */
  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan match {
        case p: ParquetScan => p.fileIndex.inputFiles.toSeq
        case _ => Seq.empty
      }
    }.flatten

  test("SELECT through the catalog: no view registration, committed schema, correct rows") {
    val dir = mkTable("lake", "items")
    val got = spark.sql("SELECT count(*) AS n, sum(id) AS s FROM graft.lake.items").head()
    assert(got.getLong(0) == 1000 && got.getLong(1) == (1L to 1000L).sum)
    // identical to the API read
    val api = ManifestTable.snapshot(spark, dir).agg(count(lit(1)), sum("id")).head()
    assert(api.getLong(0) == 1000 && api.getLong(1) == got.getLong(1))
  }

  test("VERSION AS OF rides the engine's time-travel syntax") {
    val dir = mkTable("lake", "tt")
    ManifestTable.commit(Seq((2000L, 0L, "x")).toDF("id", "k", "cat"), dir, Seq("id"))
    assert(spark.sql("SELECT count(*) FROM graft.lake.tt").head().getLong(0) == 1001)
    assert(spark.sql("SELECT count(*) FROM graft.lake.tt VERSION AS OF 1").head().getLong(0) == 1000)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.lake.tt VERSION AS OF 99").collect())
    assert(e.getMessage.contains("99"))
  }

  test("VERSION AS OF '<tag>' resolves immutable named refs through SQL") {
    val dir = mkTable("lake", "tagged")
    ManifestTable.commit(Seq((2001L, 0L, "x")).toDF("id", "k", "cat"), dir, Seq("id"))
    ManifestTable.tag(dir, "pre-load", 1L)
    assert(spark.sql("SELECT count(*) FROM graft.lake.tagged VERSION AS OF 'pre-load'")
      .head().getLong(0) == 1000)
    assert(spark.sql("SELECT count(*) FROM graft.lake.tagged").head().getLong(0) == 1001)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.lake.tagged VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("neither a numeric snapshot version nor a tag"))
  }

  test("TIMESTAMP AS OF resolves monotonized commit clocks; SHOW NAMESPACES lists warehouse dirs") {
    val dir = mkTable("lake", "ts_travel")
    Thread.sleep(1100)
    val mid = java.time.format.DateTimeFormatter
      .ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    Thread.sleep(1100)
    ManifestTable.commit(Seq((3000L, 0L, "x")).toDF("id", "k", "cat"), dir, Seq("id"))
    assert(spark.sql(s"SELECT count(*) FROM graft.lake.ts_travel TIMESTAMP AS OF '$mid'")
      .head().getLong(0) == 1000, "mid-history timestamp must resolve to v1")
    assert(spark.sql("SELECT count(*) FROM graft.lake.ts_travel").head().getLong(0) == 1001)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.lake.ts_travel TIMESTAMP AS OF '1999-01-01 00:00:00'")
        .collect())
    assert(e.getMessage.contains("predates"))
    // namespaces: the lake dir lists; tables do not appear as namespaces
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
    assert(ns.contains("lake"), s"got $ns")
    val e2 = intercept[Exception](
      spark.sql("CREATE NAMESPACE graft.newns").collect())
    assert(e2.getMessage.contains("read-only"))
  }

  test("range predicates prune files inside the V2 scan; result bit-identical") {
    mkTable("lake", "pruned")
    val q = spark.sql("SELECT id, cat FROM graft.lake.pruned WHERE id BETWEEN 100 AND 199")
    val files = scannedFiles(q)
    assert(files.nonEmpty && files.size < 5,
      s"V2 scan must open only overlapping files, opened ${files.size}/5")
    assert(q.count() == 100)
    // rows identical to the unpruned raw read
    val raw = ManifestTable.snapshot(spark, mkTableDir("lake", "pruned"))
      .filter($"id".between(100L, 199L)).select("id", "cat")
    assert(q.orderBy("id").collect().toSeq == raw.orderBy("id").collect().toSeq)
  }

  private def mkTableDir(ns: String, name: String): String = s"$warehouse/$ns/$name"

  test("member-index Bloom pruning engages for catalog point lookups too") {
    val dir = mkTable("lake", "bloomed")
    MemberIndex.build(spark, dir, "k")
    val q = spark.sql("SELECT id, k FROM graft.lake.bloomed WHERE k IN (11, 222)")
    val files = scannedFiles(q)
    assert(files.size < 5, s"Bloom must prune the V2 point lookup (${files.size}/5)")
    assert(q.collect().map(_.getLong(1)).sorted.toSeq == Seq(11L, 222L))
  }

  test("parquet-level pushdown and column pruning still engage on the survivors") {
    mkTable("lake", "pushed")
    val q = spark.sql("SELECT cat FROM graft.lake.pushed WHERE id = 42")
    val scanStr = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString("\n")
    assert(scanStr.contains("PushedFilters") && scanStr.contains("id"),
      s"parquet pushdown missing from:\n$scanStr")
    val read = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan match { case p: ParquetScan => p.readDataSchema.fieldNames.toSeq }
    }.flatten
    assert(read.toSet == Set("id", "cat"), s"column pruning must reach the scan: $read")
    assert(q.collect().map(_.getString(0)).toSeq == Seq(s"s${42 % 13}"))
  }

  test("catalog surface: listTables, missing tables, read-only DML") {
    mkTable("lake", "listed")
    val names = spark.sql("SHOW TABLES IN graft.lake").collect().map(_.getString(1)).toSet
    assert(names.contains("listed"))
    val missing = intercept[Exception](spark.sql("SELECT * FROM graft.lake.nope").collect())
    assert(missing.getMessage.toLowerCase.contains("table"))
    val ro = intercept[Exception](
      spark.sql("CREATE TABLE graft.lake.newt (x INT) USING parquet").collect())
    assert(ro.getMessage.contains("read-only"))
  }

  test("pending MoR deletes APPLY through catalog SQL (MorApplyRewrite), incl. time travel") {
    val dir = mkTable("lake", "mor")
    // equality tombstones (seq-scoped) + a positional tombstone stack
    ManifestTable.deleteByKey(Seq(1L, 5L, 900L).toDF("id"), dir, Seq("id"))
    ManifestTable.deleteWhere(spark, dir, $"id" === 10L)
    val morV = ManifestTable.latestVersion(dir).get
    assert(ManifestTable.manifest(dir, None).hasMorDeletes)
    // bare SQL read == applied snapshot, bit for bit
    assert(spark.sql("SELECT count(*) FROM graft.lake.mor").head().getLong(0) == 996)
    val got = spark.sql(
      "SELECT cat, count(*) AS n, sum(id) AS s FROM graft.lake.mor GROUP BY cat ORDER BY cat")
      .collect().toSeq
    val want = ManifestTable.snapshot(spark, dir)
      .groupBy("cat").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .orderBy("cat").collect().toSeq
    assert(got == want)
    // a re-inserted key is NOT shadowed by the old tombstone through SQL
    // either (sequence rule holds on the rewritten plan)
    ManifestTable.commit(Seq((5L, 0L, "back")).toDF("id", "k", "cat"), dir, Seq("id"))
    assert(spark.sql("SELECT count(*) FROM graft.lake.mor WHERE id = 5").head().getLong(0) == 1)
    // VERSION AS OF a tombstone-carrying snapshot applies ITS tombstones
    assert(spark.sql(s"SELECT count(*) FROM graft.lake.mor VERSION AS OF $morV")
      .head().getLong(0) == 996)
    // materialization folds the debt; the V2 fast path serves again
    ManifestTable.materializeDeletes(spark, dir)
    val clean = spark.sql("SELECT cat FROM graft.lake.mor WHERE id = 42")
    assert(scannedFiles(clean).nonEmpty, "clean table must plan through the V2 scan")
    assert(spark.sql("SELECT count(*) FROM graft.lake.mor").head().getLong(0) == 997)
  }
}
