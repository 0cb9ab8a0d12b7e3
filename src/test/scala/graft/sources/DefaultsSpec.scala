package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column DEFAULT values (Iceberg v3's initial-default/write-default
  * split, Spark 4's SUPPORT_COLUMN_DEFAULT_VALUE surface) as PURE
  * METADATA: CREATE TABLE defaults, ADD COLUMN ... DEFAULT, SET/DROP
  * DEFAULT, the immutability of the initial default, and the pruning
  * claims pre-add files gain from it.
  */
class DefaultsSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = tmpDir("graft-defaults-wh").toString
    spark.conf.set("spark.sql.catalog.gdef", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse", w)
    w
  }
  private def dirOf(t: String): String = s"$warehouse/lake/$t"

  test("CREATE TABLE column DEFAULT: omitted columns fill the write default at INSERT") {
    warehouse: Unit
    spark.sql("CREATE TABLE gdef.lake.ct (id BIGINT, status STRING DEFAULT 'new', " +
      "score BIGINT DEFAULT 100)")
    spark.sql("INSERT INTO gdef.lake.ct (id) VALUES (1)")
    spark.sql("INSERT INTO gdef.lake.ct VALUES (2, 'live', 7)")
    spark.sql("INSERT INTO gdef.lake.ct (id, status) VALUES (3, DEFAULT)")
    val rows = spark.sql("SELECT id, status, score FROM gdef.lake.ct ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "new", 100L), (2L, "live", 7L), (3L, "new", 100L)))
    // the default survives the manifest round-trip (fresh catalog)
    spark.conf.set("spark.sql.catalog.gdef2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef2.warehouse", warehouse)
    spark.sql("INSERT INTO gdef2.lake.ct (id) VALUES (4)")
    assert(spark.sql("SELECT status FROM gdef2.lake.ct WHERE id = 4").head.getString(0) == "new")
  }

  test("ADD COLUMN ... DEFAULT: pre-add files read the INITIAL default with zero data I/O") {
    warehouse: Unit
    spark.sql("CREATE TABLE gdef.lake.ad (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdef.lake.ad VALUES (1, 'a'), (2, 'b')")
    val before = ManifestTable.manifest(dirOf("ad"), None)
    spark.sql("ALTER TABLE gdef.lake.ad ADD COLUMN tier STRING DEFAULT 'bronze'")
    val after = ManifestTable.manifest(dirOf("ad"), None)
    assert(after.files == before.files, "ADD COLUMN DEFAULT must be metadata-only")
    // old rows read the initial default; an INSERT omitting it writes it
    spark.sql("INSERT INTO gdef.lake.ad (id, v) VALUES (3, 'c')")
    spark.sql("INSERT INTO gdef.lake.ad VALUES (4, 'd', 'gold')")
    val rows = spark.sql("SELECT id, tier FROM gdef.lake.ad ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "bronze"), (2L, "bronze"), (3L, "bronze"), (4L, "gold")))
    // time travel: the pre-add snapshot has no such column
    assert(!spark.sql(s"SELECT * FROM gdef.lake.ad VERSION AS OF ${before.version}")
      .columns.contains("tier"))
    // aggregation sees the defaults (count over old + new rows)
    assert(spark.sql("SELECT count(*) FROM gdef.lake.ad WHERE tier = 'bronze'")
      .head.getLong(0) == 3L)
  }

  test("SET DEFAULT moves the WRITE default only; the initial default pre-add files read is immutable") {
    warehouse: Unit
    spark.sql("CREATE TABLE gdef.lake.sd (id BIGINT)")
    spark.sql("INSERT INTO gdef.lake.sd VALUES (1)")
    spark.sql("ALTER TABLE gdef.lake.sd ADD COLUMN n BIGINT DEFAULT 10")
    spark.sql("INSERT INTO gdef.lake.sd (id) VALUES (2)")
    spark.sql("ALTER TABLE gdef.lake.sd ALTER COLUMN n SET DEFAULT 20")
    spark.sql("INSERT INTO gdef.lake.sd (id) VALUES (3)")
    // row 1 predates the column -> INITIAL default 10, not 20;
    // row 2 wrote 10 physically; row 3 writes the new default 20
    val rows = spark.sql("SELECT id, n FROM gdef.lake.sd ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 10L), (3L, 20L)),
      s"initial default must be immutable under SET DEFAULT: $rows")
    spark.sql("ALTER TABLE gdef.lake.sd ALTER COLUMN n DROP DEFAULT")
    spark.sql("INSERT INTO gdef.lake.sd (id) VALUES (4)")
    assert(spark.sql("SELECT n FROM gdef.lake.sd WHERE id = 4").head.isNullAt(0),
      "after DROP DEFAULT an omitted column is NULL")
    // ...while pre-add rows STILL read the initial default
    assert(spark.sql("SELECT n FROM gdef.lake.sd WHERE id = 1").head.getLong(0) == 10L)
    // a non-constant default refuses eagerly, atomically
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gdef.lake.sd ALTER COLUMN n SET DEFAULT id + 1"))
    assert(e.getMessage.contains("constant") || e.getMessage.toLowerCase.contains("default"),
      e.getMessage)
  }

  test("pruning: pre-add files are known-constant on the defaulted column and skip on non-matching predicates") {
    warehouse: Unit
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => (b.scan match {
          case g: GraftLakeScan => g.underlying
          case o => o
        }) match {
          case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
            p.fileIndex.inputFiles.length
          case _ => 0
        }
      }.sum
    spark.sql("CREATE TABLE gdef.lake.pr (id BIGINT, v STRING) PARTITIONED BY (id)")
    // 3 pre-add files
    (1 to 3).foreach(i => spark.sql(
      s"INSERT INTO gdef.lake.pr VALUES ($i, 'r$i')"))
    spark.sql("ALTER TABLE gdef.lake.pr ADD COLUMN region STRING DEFAULT 'emea'")
    spark.sql("ALTER TABLE gdef.lake.pr ADD COLUMN opt BIGINT") // NULL initial default
    // 1 post-add file with a different region
    spark.sql("INSERT INTO gdef.lake.pr VALUES (4, 'r4', 'apac', 9)")
    val total = ManifestTable.manifest(dirOf("pr"), None).files.size
    assert(total == 4)
    // equality excluding the initial default: the 3 pre-add files are
    // known-constant 'emea' and must SKIP (region is untracked — the
    // claim comes from the added-in stamp, not an envelope)
    val apac = spark.sql("SELECT id FROM gdef.lake.pr WHERE region = 'apac'")
    assert(scanned(apac) == 1, s"pre-add files must prune: scanned ${scanned(apac)} of $total")
    assert(apac.collect().map(_.getLong(0)).toSeq == Seq(4L))
    // matching the default: pre-add files must all be scanned
    val emea = spark.sql("SELECT count(*) FROM gdef.lake.pr WHERE region = 'emea'")
    assert(emea.head.getLong(0) == 3L)
    // the NULL-initial-default column: null-rejecting predicates skip
    // every pre-add file (they are provably all-null there)
    val opt = spark.sql("SELECT id FROM gdef.lake.pr WHERE opt > 0")
    assert(scanned(opt) == 1, s"all-null pre-add files must prune: scanned ${scanned(opt)}")
    assert(opt.collect().map(_.getLong(0)).toSeq == Seq(4L))
    // and IS NULL still scans them (the claim is null-rejecting only)
    assert(spark.sql("SELECT count(*) FROM gdef.lake.pr WHERE opt IS NULL")
      .head.getLong(0) == 3L)
  }

  test("defaults survive rename, widen, and comment evolution; appends keep the metadata") {
    warehouse: Unit
    spark.sql("CREATE TABLE gdef.lake.ev (id BIGINT)")
    spark.sql("INSERT INTO gdef.lake.ev VALUES (1)")
    spark.sql("ALTER TABLE gdef.lake.ev ADD COLUMN cnt INT DEFAULT 5")
    spark.sql("ALTER TABLE gdef.lake.ev RENAME COLUMN cnt TO n")
    spark.sql("ALTER TABLE gdef.lake.ev ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE gdef.lake.ev ALTER COLUMN n COMMENT 'count'")
    spark.sql("INSERT INTO gdef.lake.ev (id) VALUES (2)")
    val rows = spark.sql("SELECT id, n FROM gdef.lake.ev ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // row 1 pre-add reads the initial default THROUGH the rename and
    // the widen (re-rendered under the widened type); row 2's INSERT
    // filled the write default at analysis
    assert(rows == Seq((1L, 5L), (2L, 5L)), s"got $rows")
    val f = spark.table("gdef.lake.ev").schema("n")
    assert(f.metadata.getString("comment") == "count")
    assert(f.metadata.contains(ManifestTable.ExistsDefaultKey))
  }

  test("appends never inject a FOREIGN table's claim metadata: INSERT ... SELECT from a defaulted table must not mis-prune the target") {
    warehouse: Unit
    // source table: column added with DEFAULT -> its schema carries
    // graft.added-in + EXISTS_DEFAULT, and both survive SELECT
    // projection as attribute metadata
    spark.sql("CREATE TABLE gdef.lake.msrc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdef.lake.msrc VALUES (1, 'a')")
    spark.sql("ALTER TABLE gdef.lake.msrc ADD COLUMN region STRING DEFAULT 'emea'")
    spark.sql("INSERT INTO gdef.lake.msrc VALUES (2, 'b', 'apac')")
    // several more commits so the source's added-in version exceeds
    // anything the target will have committed when the insert lands
    (3 to 6).foreach(i => spark.sql(s"INSERT INTO gdef.lake.msrc VALUES ($i, 'x', 'apac')"))
    // target table: the SAME column name holds REAL physical values
    // from version 1 — no defaults ever declared
    spark.sql("CREATE TABLE gdef.lake.mtgt (id BIGINT, v STRING, region STRING)")
    spark.sql("INSERT INTO gdef.lake.mtgt VALUES (100, 'pre', 'latam')")
    spark.sql("INSERT INTO gdef.lake.mtgt SELECT id, v, region FROM gdef.lake.msrc")
    // the foreign claim keys must NOT be on the target schema: a
    // ridden-along added-in would claim the target's v1 file (seq
    // below the foreign version) known-constant 'emea' and silently
    // prune it under region = 'latam'
    val tf = DataFrameSchema
      .fromJson(ManifestTable.manifest(dirOf("mtgt"), None).schemaJson)("region")
    assert(!tf.metadata.contains(ManifestTable.AddedInKey),
      "foreign graft.added-in must be stripped on append")
    assert(!tf.metadata.contains(ManifestTable.ExistsDefaultKey),
      "foreign EXISTS_DEFAULT must be stripped on append")
    val latam = spark.sql("SELECT id FROM gdef.lake.mtgt WHERE region = 'latam'")
      .collect().map(_.getLong(0)).toSeq
    assert(latam == Seq(100L), s"pre-append rows must survive: $latam")
    // and CTAS from the defaulted source: the staged files hold REAL
    // values at seq 1; a ridden-along added-in above 1 would claim
    // them constant
    spark.sql("CREATE TABLE gdef.lake.mctas AS SELECT * FROM gdef.lake.msrc")
    val cf = DataFrameSchema
      .fromJson(ManifestTable.manifest(dirOf("mctas"), None).schemaJson)("region")
    assert(!cf.metadata.contains(ManifestTable.AddedInKey) &&
      !cf.metadata.contains(ManifestTable.ExistsDefaultKey),
      "CTAS must strip foreign claim metadata")
    assert(spark.sql("SELECT count(*) FROM gdef.lake.mctas WHERE region = 'apac'")
      .head.getLong(0) == 5L)
  }

  test("append-evolution ADD gets a FRESH added-in stamp: pre-add files prune as all-null") {
    warehouse: Unit
    spark.sql("CREATE TABLE gdef.lake.aev (id BIGINT, v STRING) PARTITIONED BY (id)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO gdef.lake.aev VALUES ($i, 'r$i')"))
    // schema-evolving append (the DataFrame path, not ALTER): new
    // column 'extra' arrives with the data
    val df = spark.range(4, 5).selectExpr("id", "'r4' AS v", "42L AS extra")
    ManifestTable.commit(df, dirOf("aev"), Seq("id"))
    val f = DataFrameSchema
      .fromJson(ManifestTable.manifest(dirOf("aev"), None).schemaJson)("extra")
    assert(f.metadata.contains(ManifestTable.AddedInKey),
      "append-evolution adds must stamp added-in like ALTER does")
    // null-rejecting predicate: the 3 pre-add files are provably
    // all-null on 'extra' and must skip
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val q = spark.sql("SELECT id FROM gdef.lake.aev WHERE extra > 0")
    val scanned = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => (b.scan match {
        case g: GraftLakeScan => g.underlying
        case o => o
      }) match {
        case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          p.fileIndex.inputFiles.length
        case _ => 0
      }
    }.sum
    assert(scanned == 1, s"pre-add files must prune as all-null: scanned $scanned of 4")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(spark.sql("SELECT count(*) FROM gdef.lake.aev WHERE extra IS NULL")
      .head.getLong(0) == 3L)
  }

  test("branch commits strip foreign claim metadata too (the WAP staging path)") {
    warehouse: Unit
    // source with a defaulted column -> its read frame carries claim keys
    spark.sql("CREATE TABLE gdef.lake.bsrc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdef.lake.bsrc VALUES (1, 'a')")
    spark.sql("ALTER TABLE gdef.lake.bsrc ADD COLUMN region STRING DEFAULT 'emea'")
    (2 to 5).foreach(i => spark.sql(s"INSERT INTO gdef.lake.bsrc VALUES ($i, 'x', 'apac')"))
    // target with REAL values in that column from v1; stage the foreign
    // frame onto a BRANCH (the WAP path goes through
    // installStagedToBranch, not installStaged)
    val dir = dirOf("btgt")
    spark.sql("CREATE TABLE gdef.lake.btgt (id BIGINT, v STRING, region STRING)")
    spark.sql("INSERT INTO gdef.lake.btgt VALUES (100, 'pre', 'latam')")
    ManifestTable.createBranch(dir, "wap")
    ManifestTable.commitToBranch(
      spark.sql("SELECT id, v, region FROM gdef.lake.bsrc"), dir, "wap", Seq())
    val bf = DataFrameSchema
      .fromJson(ManifestTable.branchManifest(dir, "wap").schemaJson)("region")
    assert(!bf.metadata.contains(ManifestTable.AddedInKey) &&
      !bf.metadata.contains(ManifestTable.ExistsDefaultKey),
      "branch commits must strip foreign claim metadata like main appends")
    // publish and read: the pre-branch row must survive a region probe
    ManifestTable.fastForward(dir, "wap")
    assert(spark.sql("SELECT count(*) FROM gdef.lake.btgt WHERE region = 'latam'")
      .head.getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM gdef.lake.btgt WHERE region = 'apac'")
      .head.getLong(0) == 4L)
  }

  test("timestamp initial defaults are TZ-stable: the instant folded at ALTER survives a session TZ change") {
    warehouse: Unit
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/Los_Angeles")
      spark.sql("CREATE TABLE gdef.lake.tzd (id BIGINT)")
      spark.sql("INSERT INTO gdef.lake.tzd VALUES (1)")
      // folded under LA: denotes the instant 2020-06-01T19:00:00Z
      spark.sql("ALTER TABLE gdef.lake.tzd ADD COLUMN ts TIMESTAMP " +
        "DEFAULT TIMESTAMP '2020-06-01 12:00:00'")
      val wantMicros = spark.sql("SELECT unix_micros(TIMESTAMP '2020-06-01 12:00:00')")
        .head.getLong(0)
      // a DIFFERENT session TZ re-parses EXISTS_DEFAULT; without the
      // explicit-offset rendering the pre-add row would shift 7 hours
      spark.conf.set(tzKey, "UTC")
      val got = spark.sql("SELECT unix_micros(ts) FROM gdef.lake.tzd WHERE id = 1")
        .head.getLong(0)
      assert(got == wantMicros,
        s"initial default drifted across session TZs: $got != $wantMicros")
      // the pruning claim agrees with the data path in the new TZ too:
      // an instant-exact predicate still finds the row
      assert(spark.sql("SELECT count(*) FROM gdef.lake.tzd " +
        s"WHERE ts = timestamp_micros($wantMicros)").head.getLong(0) == 1L)
    } finally spark.conf.set(tzKey, prev)
  }

  test("TIMESTAMP DEFAULT NULL stores a parseable EXISTS_DEFAULT (not the TZ-pinned rendering of a null)") {
    warehouse: Unit
    // the TZ-pin renders `TIMESTAMP '<utc-wall>+00:00'` — casting a
    // NULL literal to string yields SQL-null, so pinning a null default
    // would store the unparseable `TIMESTAMP 'null+00:00'` and every
    // future reader session would fail re-parsing the metadata. NULL
    // has no instant to drift: it must fall through to Literal.sql.
    spark.sql("CREATE TABLE gdef.lake.tnull (id BIGINT)")
    spark.sql("INSERT INTO gdef.lake.tnull VALUES (1)")
    spark.sql("ALTER TABLE gdef.lake.tnull ADD COLUMN ts TIMESTAMP DEFAULT NULL")
    val stored = spark.table("gdef.lake.tnull").schema("ts")
      .metadata.getString(ManifestTable.ExistsDefaultKey)
    assert(!stored.toLowerCase.contains("'null"), s"unparseable rendering stored: $stored")
    // the stored text must round-trip through the parser the readers use
    assert(spark.sql(s"SELECT CAST(($stored) AS TIMESTAMP)").head.isNullAt(0))
    // and the pre-add row reads NULL through the default path
    spark.sql("INSERT INTO gdef.lake.tnull VALUES (2, TIMESTAMP '2021-03-04 05:06:07')")
    val rows = spark.sql("SELECT id, ts FROM gdef.lake.tnull ORDER BY id").collect()
    assert(rows(0).isNullAt(1), "pre-add row must read the NULL initial default")
    assert(!rows(1).isNullAt(1))
    assert(spark.sql("SELECT count(*) FROM gdef.lake.tnull WHERE ts IS NULL").head.getLong(0) == 1L)
  }
}
