package graft.queries

import graft.Tables
import graft.sources.{ChangeFeedView, ManifestTable, MemberIndex}
import org.apache.spark.sql.functions._

/** Storage-layer queries: the transactional manifest table format
  * ([[graft.sources.ManifestTable]]) exercised through its two read
  * paths — planning-time file skipping and time travel — each gated by
  * the same DuckDB oracle as a plain scan of the source table, because
  * the format's whole contract is that going through it changes
  * NOTHING about query results, only about how few files are opened
  * and what a reader can see mid-write.
  *
  * The reference gets snapshot semantics from Postgres transactions
  * (`/root/reference/postgresql_mysql_sync_dag.py:48-50`); a file-based
  * lake at 100 TB rebuilds them from atomic manifest commits.
  */
object Storage {

  private val d30_2 = "CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE)"

  /** events, committed once per (session, sf dir) into a manifest table
    * range-clustered on ts — tight per-file envelopes so the skipping
    * path has something to skip. Two commits split at Jan 20 so history
    * has a mid-month version boundary for time travel.
    */
  private def eventsTable(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-events:$dir") { p =>
      val ev = Tables(spark, dir).events
      val split = lit("2024-01-20 00:00:00").cast("timestamp")
      ManifestTable.commit(
        ev.filter(col("ts") < split).repartitionByRange(10, col("ts")), p, track = Seq("ts"))
      ManifestTable.commit(
        ev.filter(col("ts") >= split).repartitionByRange(6, col("ts")), p, track = Seq("ts")): Unit
    }

  /** orders committed once per (session, sf dir) range-clustered on
    * o_orderkey, then MERGED: every 97th key's row replaced (price
    * doubled, priority restamped), every 101st key mirrored to a
    * negated-key insert. Clustering means the update keys spread
    * across all files here (worst case); a time-clustered table with
    * recent-key updates rewrites only the tail files — the spec pins
    * that file-granularity on ManifestTable directly.
    */
  private def mergedOrders(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-orders-merge:$dir") { p =>
      val o = Tables(spark, dir).orders
      ManifestTable.commit(
        o.repartitionByRange(8, col("o_orderkey")), p, track = Seq("o_orderkey"))
      val updates = o.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-MERGED"))
      // key 0 is its own negation — it stays an update, not an insert
      val inserts = o.filter(col("o_orderkey") % 101 === 0 && col("o_orderkey") =!= 0)
        .withColumn("o_orderkey", -col("o_orderkey"))
      ManifestTable.merge(updates.unionByName(inserts), p, keys = Seq("o_orderkey")): Unit
    }

  /** events committed once per (session, sf dir) range-clustered on ts,
    * then row-level DELETEd: clicks before Jan 15. ts-clustering means
    * only the pre-Jan-15 files rewrite; later files keep their entries.
    */
  private def deletedEvents(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-events-delete:$dir") { p =>
      val ev = Tables(spark, dir).events
      ManifestTable.commit(ev.repartitionByRange(10, col("ts")), p, track = Seq("ts"))
      ManifestTable.delete(spark, p,
        col("event_type") === "click" &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp")): Unit
    }

  /** orders committed once per (session, sf dir) range-clustered on
    * o_orderdate — so every file's ORDERKEY envelope spans the whole
    * key domain (keys arrive shuffled in date order) and min/max can
    * skip nothing for a key lookup — then member-indexed on
    * o_orderkey. The worst case for envelopes is exactly where the
    * membership fingerprint earns its keep.
    */
  private def keyIndexedOrders(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-orders-memberix:$dir") { p =>
      val o = Tables(spark, dir).orders
      ManifestTable.commit(
        o.repartitionByRange(8, col("o_orderdate")), p, track = Seq("o_orderdate"))
      MemberIndex.build(spark, p, "o_orderkey"): Unit
    }

  /** A separate merged-orders table that is then RESTORED to v1 —
    * separate from [[mergedOrders]] because restore moves the HEAD,
    * and q182/q185/q190 read that table's post-merge state.
    */
  private def restoredOrders(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-orders-restore:$dir") { p =>
      val o = Tables(spark, dir).orders
      ManifestTable.commit(
        o.repartitionByRange(8, col("o_orderkey")), p, track = Seq("o_orderkey"))
      val bad = o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 100) // the fat-finger load
      ManifestTable.merge(bad, p, keys = Seq("o_orderkey"))
      ManifestTable.restore(p, toVersion = 1L): Unit
    }

  /** events committed once per (session, sf dir), then MERGE-ON-READ
    * deleted: three users tombstoned by key (O(keys) bytes written,
    * zero data files rewritten), then one of them re-inserted as a
    * single late event — the sequence-number case that separates MoR
    * from a naive global anti join.
    */
  private def morEvents(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-events-mor:$dir") { p =>
      val ev = Tables(spark, dir).events
      ManifestTable.commit(ev.repartitionByRange(10, col("ts")), p, track = Seq("ts"))
      ManifestTable.deleteByKey(
        spark.range(3).select((col("id") + 1).as("user_id")), p, Seq("user_id"))
      // user 2 comes back: one fresh deterministic row (min event_id),
      // landing with a seq above the tombstone's
      ManifestTable.commit(
        ev.filter(col("user_id") === 2L).orderBy("event_id").limit(1)
          .withColumn("event_type", lit("returned")), p, track = Seq("ts")): Unit
    }

  /** events committed, three users MoR-tombstoned, then — with the
    * tombstones STILL pending — a CoW MERGE (every 500th visible event
    * restamped) and a CoW DELETE (user 5's purchases): the coexistence
    * surface a steady retraction stream needs, no forced
    * materialization cycle between ops. Both rewrites compute through
    * the applied view and carry the tombstones forward.
    */
  private def morCowEvents(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-events-morcow:$dir") { p =>
      val ev = Tables(spark, dir).events
      ManifestTable.commit(ev.repartitionByRange(10, col("ts")), p, track = Seq("ts"))
      ManifestTable.deleteByKey(
        spark.range(3).select((col("id") + 1).as("user_id")), p, Seq("user_id"))
      val src = ManifestTable.snapshot(spark, p)
        .filter(col("event_id") % 500 === 0)
        .withColumn("value", col("value") * 2)
        .withColumn("event_type", lit("mor-merged"))
      ManifestTable.merge(src, p, keys = Seq("event_id"))
      ManifestTable.delete(spark, p,
        col("user_id") === 5L && col("event_type") === "purchase"): Unit
    }

  /** events whose history interleaves data commits with a MAINTENANCE
    * materialization: tombstone three users (v2), land a late
    * 'returned' row (v3), fold the tombstones (v4 — state-preserving,
    * removes the delete files the bounded feed keys on), then land a
    * 'replayed' batch (v5). The fixture behind the STITCHED change
    * feed: a consumer whose cursor predates the maintenance window.
    */
  private def maintainedFeedEvents(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"manifest-events-maintfeed:$dir") { p =>
      val ev = Tables(spark, dir).events
      ManifestTable.commit(ev.repartitionByRange(10, col("ts")), p, track = Seq("ts"))
      ManifestTable.deleteByKey(
        spark.range(3).select((col("id") + 1).as("user_id")), p, Seq("user_id"))
      ManifestTable.commit(
        ev.filter(col("user_id") === 2L).orderBy("event_id").limit(1)
          .withColumn("event_type", lit("returned")), p, track = Seq("ts"))
      ManifestTable.materializeDeletes(spark, p)
      ManifestTable.commit(
        ev.filter(col("user_id") === 4L)
          .withColumn("event_id", -col("event_id"))
          .withColumn("event_type", lit("replayed")), p, track = Seq("ts")): Unit
    }

  /** A catalog warehouse whose lake/morevents table has PENDING
    * merge-on-read tombstones (same construction as [[morEvents]]) —
    * the fixture behind the MorApplyRewrite SQL entry.
    */
  private def catalogMorWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-warehouse-mor:$dir") { wh =>
      val p = s"$wh/lake/morevents"
      new java.io.File(p).mkdirs()
      val ev = Tables(spark, dir).events
      ManifestTable.commit(ev.repartitionByRange(10, col("ts")), p, track = Seq("ts"))
      ManifestTable.deleteByKey(
        spark.range(3).select((col("id") + 1).as("user_id")), p, Seq("user_id"))
      ManifestTable.commit(
        ev.filter(col("user_id") === 2L).orderBy("event_id").limit(1)
          .withColumn("event_type", lit("returned")), p, track = Seq("ts")): Unit
    }

  /** A warehouse whose lake/evsql table is built ENTIRELY through SQL
    * DML — CTAS (v1+v2), INSERT INTO (v3), then a self-reading INSERT
    * OVERWRITE (v4) — the fixture behind the catalog write-path entry.
    */
  private def catalogSqlWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-warehouse-sqlw:$dir") { wh =>
      spark.conf.set("spark.sql.catalog.graftw", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftw.warehouse", wh)
      new java.io.File(s"$wh/lake").mkdirs()
      Tables(spark, dir).events.createOrReplaceTempView("ev_src_sqlw")
      val cols = "event_id, ts, user_id, event_type, value"
      spark.sql("CREATE TABLE graftw.lake.evsql PARTITIONED BY (ts) AS " +
        s"SELECT $cols FROM ev_src_sqlw WHERE user_id <= 50")
      spark.sql(s"INSERT INTO graftw.lake.evsql SELECT $cols FROM ev_src_sqlw WHERE user_id > 50")
      // self-reading overwrite: the staged write materializes from the old
      // snapshot's (immutable) files BEFORE the manifest swap, so reading
      // the table being overwritten is safe by construction
      spark.sql("INSERT OVERWRITE graftw.lake.evsql " +
        s"SELECT $cols FROM graftw.lake.evsql WHERE user_id % 7 <> 3"): Unit
    }

  /** A warehouse whose lake/evdel table is CTAS'd from events and then
    * trimmed by a SQL `DELETE FROM` — the fixture behind the catalog
    * row-level-delete entry.
    */
  private def catalogDeleteWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-warehouse-sqldel:$dir") { wh =>
      spark.conf.set("spark.sql.catalog.graftd", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftd.warehouse", wh)
      new java.io.File(s"$wh/lake").mkdirs()
      Tables(spark, dir).events.createOrReplaceTempView("ev_src_sqldel")
      spark.sql("CREATE TABLE graftd.lake.evdel PARTITIONED BY (user_id) AS " +
        "SELECT event_id, ts, user_id, event_type, value FROM ev_src_sqldel")
      // DELETE conditions must translate to pushed source filters
      // (column-vs-literal algebra); richer predicates go through the
      // API delete, which takes an arbitrary Column
      spark.sql("DELETE FROM graftd.lake.evdel " +
        "WHERE event_type = 'click' AND user_id BETWEEN 20 AND 60"): Unit
    }

  /** A warehouse whose lake/evupd table is CTAS'd from events and then
    * reshaped by a SQL UPDATE (flag one cohort's clicks) and a SQL
    * MERGE INTO (late corrections + replayed inserts from a staged
    * source view) — the fixture behind the catalog row-level-write
    * entries.
    */
  private def catalogUpdateWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-warehouse-sqlupd:$dir") { wh =>
      spark.conf.set("spark.sql.catalog.graftu", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftu.warehouse", wh)
      new java.io.File(s"$wh/lake").mkdirs()
      Tables(spark, dir).events.createOrReplaceTempView("ev_src_sqlupd")
      spark.sql("CREATE TABLE graftu.lake.evupd PARTITIONED BY (user_id) AS " +
        "SELECT event_id, ts, user_id, event_type, value FROM ev_src_sqlupd")
      // group-based CoW UPDATE: only files whose user_id envelope
      // overlaps [10, 40] are rewritten
      spark.sql("UPDATE graftu.lake.evupd SET event_type = 'flagged', value = 0.0 " +
        "WHERE event_type = 'click' AND user_id BETWEEN 10 AND 40")
      // MERGE: corrections double matched purchase values for one user
      // band; unmatched correction rows insert as 'adjustment'
      spark.sql("""
        MERGE INTO graftu.lake.evupd t
        USING (SELECT event_id, ts, user_id, event_type, value * 2 AS value
               FROM ev_src_sqlupd WHERE event_type = 'purchase' AND user_id BETWEEN 50 AND 70
               UNION ALL
               SELECT -event_id AS event_id, ts, user_id, 'adjustment' AS event_type, value
               FROM ev_src_sqlupd WHERE event_type = 'purchase' AND user_id BETWEEN 50 AND 55) s
        ON t.event_id = s.event_id
        WHEN MATCHED THEN UPDATE SET t.value = s.value
        WHEN NOT MATCHED THEN INSERT (event_id, ts, user_id, event_type, value)
          VALUES (s.event_id, s.ts, s.user_id, s.event_type, s.value)
      """)
      // NOT MATCHED BY SOURCE: a reconciliation sweep — clicks in the
      // 95-99 user band with no counterpart in the (user-95-only)
      // source are deleted; the matched band survives untouched
      spark.sql("""
        MERGE INTO graftu.lake.evupd t
        USING (SELECT event_id FROM ev_src_sqlupd
               WHERE event_type = 'click' AND user_id = 95) s
        ON t.event_id = s.event_id
        WHEN NOT MATCHED BY SOURCE
          AND t.event_type = 'click' AND t.user_id BETWEEN 95 AND 99 THEN DELETE
      """): Unit
    }

  /** A catalog warehouse whose lake/evmor table runs the q196 erasure
    * lifecycle ENTIRELY from SQL: CTAS, `CALL graft.system
    * .delete_by_key` (equality tombstones from a registered keys view —
    * O(keys) bytes, zero data files rewritten), then a plain INSERT
    * INTO re-inserting one 'returned' row ABOVE the tombstones'
    * sequence.
    */
  private def catalogMorSqlWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-warehouse-morsql:$dir") { wh =>
      spark.conf.set("spark.sql.catalog.graftg", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftg.warehouse", wh)
      new java.io.File(s"$wh/lake").mkdirs()
      Tables(spark, dir).events.createOrReplaceTempView("ev_src_morsql")
      spark.sql("CREATE TABLE graftg.lake.evmor PARTITIONED BY (ts) AS " +
        "SELECT * FROM ev_src_morsql")
      spark.range(3).select((col("id") + 1).as("user_id"))
        .createOrReplaceTempView("gdpr_keys_morsql")
      spark.sql("CALL graftg.system.delete_by_key(table => 'lake.evmor', " +
        "key_col => 'user_id', source => 'gdpr_keys_morsql')")
      spark.sql("""
        INSERT INTO graftg.lake.evmor
        SELECT event_id, ts, user_id, 'returned' AS event_type, value, props
        FROM ev_src_morsql WHERE user_id = 2 ORDER BY event_id LIMIT 1
      """): Unit
    }

  /** A catalog WAREHOUSE containing lake/events as a manifest table
    * (same two-commit Jan-20 split as [[eventsTable]]) — the fixture
    * behind the DSv2 `graft.lake.events` SQL entry.
    */
  private def catalogWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-warehouse:$dir") { wh =>
      val p = s"$wh/lake/events"
      new java.io.File(p).mkdirs()
      val ev = Tables(spark, dir).events
      val split = lit("2024-01-20 00:00:00").cast("timestamp")
      ManifestTable.commit(
        ev.filter(col("ts") < split).repartitionByRange(10, col("ts")), p, track = Seq("ts"))
      Thread.sleep(3) // distinct commit clocks so q209's TIMESTAMP AS OF can separate v1/v2
      ManifestTable.commit(
        ev.filter(col("ts") >= split).repartitionByRange(6, col("ts")), p, track = Seq("ts")): Unit
    }

  val qs: Seq[Q] = Seq(
    Q(
      "q180_manifest_prune",
      "Manifest-table pruned range scan: resolve the committed per-file " +
        "min/max envelopes (O(files) metadata, one tiny local job), open " +
        "ONLY the files overlapping a 3-of-30-day ts window, run the " +
        "exact predicate on the survivors, aggregate. Bit-identical to " +
        "the plain filter by contract — the oracle scans the raw table — " +
        "while the manifest path opens ~2 of 16 range-clustered files " +
        "(ManifestTableSpec pins the skipping on livePaths).",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                     AND TIMESTAMP '2024-01-12 23:59:59.999999'
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = eventsTable(spark, dir)
        ManifestTable.prunedScan(spark, t, "ts",
            lit("2024-01-10 00:00:00").cast("timestamp"),
            lit("2024-01-12 23:59:59.999999").cast("timestamp"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q181_time_travel",
      "Snapshot-isolation time travel: the same aggregate against the " +
        "mid-month committed version (asOf v1 = rows landed before Jan " +
        "20) and against the head — each read resolves ONE manifest's " +
        "file list, so a snapshot is complete-or-invisible regardless " +
        "of in-flight writers. The oracle reconstructs both snapshots " +
        "from the commit split predicate.",
      Some(s"""
        SELECT 'v1' AS snap, count(*) AS n, $d30_2 AS sum_value
        FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        UNION ALL
        SELECT 'head' AS snap, count(*) AS n, $d30_2 AS sum_value
        FROM events
      """.trim),
      (spark, dir) => {
        val t = eventsTable(spark, dir)
        def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
          df.agg(count(lit(1)).as("n"),
              sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
                .cast("double").as("sum_value"))
            .select(lit(tag).as("snap"), col("n"), col("sum_value"))
        agg(ManifestTable.snapshot(spark, t, asOf = Some(1L)), "v1")
          .unionByName(agg(ManifestTable.snapshot(spark, t), "head"))
      },
    ),
    Q(
      "q182_merge_upsert",
      "Transactional MERGE (upsert) into the manifest table: every 97th " +
        "order's row replaced whole (price doubled, priority restamped), " +
        "every 101st mirrored to a negated-key insert; matched files " +
        "rewrite copy-on-write, the manifest swaps atomically, and the " +
        "oracle recomputes the merged state relationally from the raw " +
        "table — upsert correctness reduces to anti-join ∪ source.",
      Some("""
        WITH src AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice * 2 AS o_totalprice, o_orderdate,
                 'X-MERGED' AS o_orderpriority
          FROM orders WHERE o_orderkey % 97 = 0
          UNION ALL
          SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 101 = 0 AND o_orderkey <> 0
        ),
        merged AS (
          SELECT * FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
          UNION ALL
          SELECT * FROM src
        )
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
               count(CASE WHEN o_orderpriority = 'X-MERGED' THEN 1 END) AS n_merged
        FROM merged GROUP BY o_orderstatus
      """.trim),
      (spark, dir) => {
        val t = mergedOrders(spark, dir)
        ManifestTable.snapshot(spark, t)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_price"),
            count(when(col("o_orderpriority") === "X-MERGED", 1)).as("n_merged"))
      },
    ),
    Q(
      "q183_row_delete",
      "Row-level DELETE from the manifest table (clicks before Jan 15) " +
        "as file-granular copy-on-write: the ts-clustered layout means " +
        "only pre-cutoff files rewrite, later files keep their exact " +
        "manifest entries, and readers on the old head keep a complete " +
        "snapshot. The oracle applies SQL DELETE keep-semantics " +
        "(survive on FALSE or NULL) to the raw table.",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events
        WHERE NOT COALESCE(
          event_type = 'click' AND ts < TIMESTAMP '2024-01-15 00:00:00', FALSE)
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = deletedEvents(spark, dir)
        ManifestTable.snapshot(spark, t)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q185_change_feed",
      "Row-level change feed across the MERGE commit (Delta-CDF-style): " +
        "only files added/removed between the two manifests are read, " +
        "and rows a copy-on-write rewrite merely CARRIED (untouched " +
        "rows of rewritten files) cancel in the two-way EXCEPT ALL — " +
        "the feed is exactly the update pairs (old row out, new row " +
        "in) plus the fresh inserts. The oracle reconstructs the same " +
        "delta relationally from the merge source definition.",
      Some("""
        WITH src AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice * 2 AS o_totalprice, o_orderdate,
                 'X-MERGED' AS o_orderpriority
          FROM orders WHERE o_orderkey % 97 = 0
          UNION ALL
          SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 101 = 0 AND o_orderkey <> 0
        ),
        feed AS (
          SELECT 'insert' AS change, o_orderstatus, o_totalprice FROM src
          UNION ALL
          SELECT 'delete' AS change, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 97 = 0
        )
        SELECT change, o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM feed GROUP BY change, o_orderstatus
      """.trim),
      (spark, dir) => {
        val t = mergedOrders(spark, dir)
        ManifestTable.changes(spark, t, fromV = 1L, toV = 2L)
          .groupBy(col("_change").as("change"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_price"))
          .select(col("change"), col("o_orderstatus"), col("n"), col("sum_price"))
      },
    ),
    Q(
      "q189_member_lookup",
      "Point lookup through a per-file MEMBERSHIP index " +
        "(graft.sources.MemberIndex — the parquet/Iceberg-bloom role): " +
        "orders range-clustered on o_orderdate, so every file's " +
        "ORDERKEY envelope spans the whole domain and min/max skips " +
        "nothing — the Bloom fingerprints (no false negatives, fp-rate " +
        "only costs I/O) resolve the 5-key lookup to the few files " +
        "that can match, from O(files) metadata. The exact IN " +
        "predicate runs on the survivors, so the result is " +
        "bit-identical to the plain filter the oracle runs; " +
        "MemberIndexSpec pins the superset contract, the skipping, " +
        "and O(changed-files) incremental maintenance.",
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey IN (11, 222, 333, 444, 555)
        ORDER BY o_orderkey
      """.trim),
      (spark, dir) => {
        val t = keyIndexedOrders(spark, dir)
        MemberIndex.lookup(spark, t, "o_orderkey", Seq(11L, 222L, 333L, 444L, 555L))
          .orderBy("o_orderkey")
      },
    ),
    Q(
      "q199_sql_member_prune",
      "q189's point lookup as PLAIN SQL: the analyst types `WHERE " +
        "o_orderkey IN (...)` against the snapshot view and the " +
        "injected ManifestSkipping rule consults the Bloom sidecar " +
        "(MemberIndex) for the equality/IN conjunct — key-position " +
        "hashing runs the very xxhash64 expressions the build ran, " +
        "evaluated driver-side, so planner-side and executor-side " +
        "fingerprints can never drift. The table is date-clustered, so " +
        "every file's KEY envelope spans the whole domain and min/max " +
        "skips nothing — only the membership fingerprint prunes. Same " +
        "oracle as q189 proves SQL+rule == explicit indexed lookup == " +
        "raw filter; ManifestSkippingSpec pins rule-side candidates == " +
        "API-side candidatePaths and fresh-unindexed-file safety.",
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey IN (11, 222, 333, 444, 555)
        ORDER BY o_orderkey
      """.trim),
      (spark, dir) => {
        val t = keyIndexedOrders(spark, dir)
        ManifestTable.createView(spark, t, "member_orders_v")
        spark.sql("""
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
          FROM member_orders_v WHERE o_orderkey IN (11, 222, 333, 444, 555)
          ORDER BY o_orderkey
        """)
      },
    ),
    Q(
      "q190_cdf_view",
      "Incremental aggregate-view maintenance from the change feed " +
        "(graft.sources.ChangeFeedView — retraction-based IVM over the " +
        "storage layer's CDF): the per-status revenue rollup is " +
        "materialized at v1, then ADVANCED across the MERGE commit by " +
        "folding only q185's feed rows (+1/-1 signed counts, exact " +
        "DECIMAL signed sums — cancel-pairs retract updates, " +
        "zero-count keys drop exactly) — never rescanning the table. " +
        "The oracle recomputes the merged state relationally, so the " +
        "hash match proves feed-fold == full recompute, bit for bit. " +
        "At 100 TB: a selective merge advances the view by reading a " +
        "handful of copy-on-write files instead of re-aggregating " +
        "everything.",
      Some("""
        WITH src AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice * 2 AS o_totalprice, o_orderdate,
                 'X-MERGED' AS o_orderpriority
          FROM orders WHERE o_orderkey % 97 = 0
          UNION ALL
          SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 101 = 0 AND o_orderkey <> 0
        ),
        merged AS (
          SELECT * FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
          UNION ALL
          SELECT * FROM src
        )
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM merged GROUP BY o_orderstatus
      """.trim),
      (spark, dir) => {
        val t = mergedOrders(spark, dir)
        val atV1 = ChangeFeedView.init(spark, t, Seq("o_orderstatus"), "o_totalprice", asOf = Some(1L))
        ChangeFeedView.advance(spark, atV1, t, Seq("o_orderstatus"), "o_totalprice", 1L, 2L)
          .select(col("o_orderstatus"), col("n"), col("total").cast("double").as("sum_price"))
      },
    ),
    Q(
      "q196_mor_delete",
      "MERGE-ON-READ equality deletes (ManifestTable.deleteByKey — the " +
        "write-cheap sibling of q183's copy-on-write): tombstoning " +
        "three users writes O(keys) bytes and rewrites NOTHING; every " +
        "reader applies the tombstones through one sequence-scoped " +
        "anti join (delete seq > file seq), so a user re-inserted " +
        "AFTER the delete is never shadowed — the Iceberg " +
        "sequence-number rule, which a naive global anti join gets " +
        "wrong. The oracle reconstructs the same state relationally " +
        "(NOT IN plus the deterministic re-insert), so MoR read " +
        "semantics are hash-gated; the spec additionally pins the " +
        "zero-rewrite commit, materializeDeletes equivalence, and the " +
        "CoW/feed guards. At 100 TB: GDPR-class deletes in kilobytes, " +
        "debt repaid on the maintenance cadence.",
      Some(s"""
        WITH re AS (
          SELECT event_id, ts, user_id, 'returned' AS event_type, value, props
          FROM events WHERE user_id = 2
          ORDER BY event_id LIMIT 1
        ),
        snap AS (
          SELECT * FROM events WHERE user_id NOT IN (1, 2, 3)
          UNION ALL SELECT * FROM re
        )
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM snap GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = morEvents(spark, dir)
        ManifestTable.snapshot(spark, t)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q223_branch_wap",
      "WRITE-AUDIT-PUBLISH ON A BRANCH (Iceberg's spark.wap.branch " +
        "workflow; ManifestTable.createBranch/commitToBranch/" +
        "fastForward): two correction batches stage as SHADOW " +
        "snapshots on a 'corrections' branch — main readers never see " +
        "them, expiry/vacuum treat the branch head as a retention root " +
        "— the audit reads the branch (exactly the bytes that would " +
        "publish) and gates on it, then fast-forward links the audited " +
        "chain onto main METADATA-ONLY (ancestor-only, " +
        "crash-resumable; no data file moves). The readback proves the " +
        "published head carries base + both batches and that the " +
        "intermediate branch commit became a time-travelable main " +
        "version. Oracle reconstructs the union relationally.",
      Some(s"""
        WITH adj1 AS (
          SELECT -event_id AS event_id, ts, user_id, 'adjustment' AS event_type, value, props
          FROM events WHERE event_type = 'purchase' AND user_id BETWEEN 50 AND 55
        ),
        adj2 AS (
          SELECT -event_id AS event_id, ts, user_id, 'adjustment' AS event_type, value, props
          FROM events WHERE event_type = 'purchase' AND user_id BETWEEN 56 AND 60
        ),
        fin AS (
          SELECT * FROM events
          UNION ALL SELECT * FROM adj1
          UNION ALL SELECT * FROM adj2
        )
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value,
               CAST(3 AS BIGINT) AS head_version
        FROM fin GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val p = graft.Artifacts.cached(s"branch-wap:$dir") { t =>
          val ev = Tables(spark, dir).events
          ManifestTable.commit(ev.repartitionByRange(8, col("ts")), t, track = Seq("ts"))
          ManifestTable.createBranch(t, "corrections")
          def adj(lo: Int, hi: Int) = ev
            .filter(col("event_type") === "purchase"
              && col("user_id").between(lo, hi))
            .selectExpr("-event_id AS event_id", "ts", "user_id",
              "'adjustment' AS event_type", "value", "props")
          ManifestTable.commitToBranch(adj(50, 55), t, "corrections", Seq("ts"))
          ManifestTable.commitToBranch(adj(56, 60), t, "corrections", Seq("ts"))
          // the audit gate reads the BRANCH — exactly what would publish
          val staged = ManifestTable.branchSnapshot(spark, t, "corrections")
          require(staged.filter(col("event_id").isNull || col("value") < 0).count() == 0,
            "audit failed: corrections carry null ids or negative values")
          ManifestTable.fastForward(t, "corrections"): Unit
        }
        val headV = ManifestTable.latestVersion(p).get
        assert(headV == 3L && ManifestTable.branches(p).isEmpty,
          s"publish must land both staged commits and fold the branch (head=$headV)")
        // the intermediate branch commit is now ordinary main history
        // (>=: at tiny scale factors the correction band can be empty)
        assert(ManifestTable.snapshot(spark, p, asOf = Some(2L)).count() >=
          ManifestTable.snapshot(spark, p, asOf = Some(1L)).count(),
          "published intermediate version must be time-travelable")
        ManifestTable.snapshot(spark, p)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
          .withColumn("head_version", lit(headV))
      },
    ),
    Q(
      "q222_sql_mor_delete",
      "q196's GDPR-erasure lifecycle with EVERY step SQL: CTAS into the " +
        "catalog, CALL graft.system.delete_by_key (the merge-on-read " +
        "procedure — keys streamed from a registered view, O(keys) " +
        "bytes written, ZERO data files rewritten, where DELETE FROM " +
        "routes to copy-on-write), a plain INSERT INTO re-inserting a " +
        "'returned' row above the tombstones' sequence, and a plain " +
        "SELECT readback (MorApplyRewrite applies the tombstones " +
        "seq-scoped — the re-insert is never shadowed). Same oracle as " +
        "q196: the SQL surface and the typed API reach the identical " +
        "state. GraftCatalogSpec pins the zero-rewrite commit and the " +
        "procedure's argument guards.",
      Some(s"""
        WITH re AS (
          SELECT event_id, ts, user_id, 'returned' AS event_type, value, props
          FROM events WHERE user_id = 2
          ORDER BY event_id LIMIT 1
        ),
        snap AS (
          SELECT * FROM events WHERE user_id NOT IN (1, 2, 3)
          UNION ALL SELECT * FROM re
        )
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM snap GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val wh = catalogMorSqlWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graftg", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftg.warehouse", wh)
        spark.sql("""
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM graftg.lake.evmor GROUP BY event_type
        """)
      },
    ),
    Q(
      "q194_sql_manifest",
      "The SQL-first storage path end to end: the manifest table " +
        "registers as a plain temp view (ManifestTable.createView) and " +
        "the user just TYPES a range query — the injected " +
        "graft.plans.ManifestSkipping optimizer rule rewrites the scan " +
        "to the files whose committed envelopes overlap, automatically, " +
        "with the Filter retained so the transform is bit-identical by " +
        "construction. Same oracle as q180 proves view+rule == explicit " +
        "prunedScan == raw-table filter; ManifestSkippingSpec pins the " +
        "file-level pruning and the fallback guards. This is how an " +
        "analyst actually consumes the lake: SQL against a view, " +
        "skipping for free.",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                     AND TIMESTAMP '2024-01-12 23:59:59.999999'
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = eventsTable(spark, dir)
        ManifestTable.createView(spark, t, "manifest_events_v")
        spark.sql("""
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM manifest_events_v
          WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                       AND TIMESTAMP '2024-01-12 23:59:59.999999'
          GROUP BY event_type
        """)
      },
    ),
    Q(
      "q200_mor_cow_coexist",
      "MoR/CoW coexistence (the Iceberg regime): with three users' " +
        "equality-delete tombstones PENDING, a copy-on-write MERGE " +
        "(every 500th visible event restamped, value doubled) and then " +
        "a CoW DELETE (user 5's purchases) run directly — no forced " +
        "materializeDeletes between ops. Both rewrites compute through " +
        "the applied view (tombstoned rows fold out of rewritten files, " +
        "whose fresh sequence number the old tombstones never outrank) " +
        "and CARRY the pending tombstones, which keep applying to " +
        "untouched files on read. The oracle recomputes the whole " +
        "chain relationally, so coexistence semantics are hash-gated. " +
        "At 100 TB: a steady GDPR/CDC retraction stream no longer " +
        "serializes every upsert behind a table-scale materialization.",
      Some(s"""
        WITH vis AS (SELECT * FROM events WHERE user_id NOT IN (1, 2, 3)),
        src AS (
          SELECT event_id, ts, user_id, 'mor-merged' AS event_type,
                 value * 2 AS value, props
          FROM vis WHERE event_id % 500 = 0
        ),
        merged AS (
          SELECT * FROM vis v
          WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.event_id = v.event_id)
          UNION ALL SELECT * FROM src
        ),
        fin AS (
          SELECT * FROM merged
          WHERE NOT COALESCE(user_id = 5 AND event_type = 'purchase', FALSE)
        )
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM fin GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = morCowEvents(spark, dir)
        ManifestTable.snapshot(spark, t)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q201_mor_feed",
      "Change feed ACROSS merge-on-read tombstone commits: the span " +
        "v1 -> head crosses the deleteByKey, the merge, and the CoW " +
        "delete; tombstone-killed rows of files untouched by any " +
        "rewrite surface as 'delete' rows via a bounded probe (only " +
        "shared files that actually hold a newly-tombstoned row are " +
        "read, each at BOTH endpoints' applied views, the multiset " +
        "difference being exactly the newly-dead rows), while the " +
        "rewritten files' carried rows cancel in the file-diff half as " +
        "before. The oracle computes the same net diff as snapshot(v1) " +
        "EXCEPT ALL snapshot(head) both ways — feed == net state " +
        "delta, bit for bit, even across MoR boundaries.",
      Some(s"""
        WITH vis AS (SELECT * FROM events WHERE user_id NOT IN (1, 2, 3)),
        src AS (
          SELECT event_id, ts, user_id, 'mor-merged' AS event_type,
                 value * 2 AS value, props
          FROM vis WHERE event_id % 500 = 0
        ),
        merged AS (
          SELECT * FROM vis v
          WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.event_id = v.event_id)
          UNION ALL SELECT * FROM src
        ),
        fin AS (
          SELECT * FROM merged
          WHERE NOT COALESCE(user_id = 5 AND event_type = 'purchase', FALSE)
        ),
        ins AS (SELECT * FROM fin EXCEPT ALL SELECT * FROM events),
        del AS (SELECT * FROM events EXCEPT ALL SELECT * FROM fin),
        feed AS (
          SELECT 'insert' AS change, event_type, value FROM ins
          UNION ALL
          SELECT 'delete' AS change, event_type, value FROM del
        )
        SELECT change, event_type, count(*) AS n, $d30_2 AS sum_value
        FROM feed GROUP BY change, event_type
      """.trim),
      (spark, dir) => {
        val t = morCowEvents(spark, dir)
        ManifestTable.changes(spark, t, 1L, ManifestTable.latestVersion(t).get)
          .groupBy(col("_change").as("change"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
          .select(col("change"), col("event_type"), col("n"), col("sum_value"))
      },
    ),
    Q(
      "q202_catalog_sql",
      "The storage layer as a REAL catalog citizen (graft.sources." +
        "GraftCatalog, a DataSource V2 TableCatalog): `SELECT ... FROM " +
        "graft.lake.events` needs no createView and no injected-rule " +
        "dependency — the catalog resolves warehouse/lake/events to the " +
        "manifest table, `VERSION AS OF 1` rides the engine's OWN " +
        "time-travel syntax into the snapshot log, and the V2 scan " +
        "builder prunes files with the SAME envelope+Bloom machinery as " +
        "the optimizer rule before delegating to Spark's " +
        "ParquetScanBuilder (parquet pushdown + ReadSchema pruning " +
        "still engage on survivors — GraftCatalogSpec pins both plus " +
        "the file pruning). Oracle reconstructs head-window and " +
        "v1-snapshot rollups relationally: catalog SQL == view SQL == " +
        "API reads, bit for bit.",
      Some(s"""
        SELECT 'head' AS snap, event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                     AND TIMESTAMP '2024-01-12 23:59:59.999999'
        GROUP BY event_type
        UNION ALL
        SELECT 'v1' AS snap, event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val wh = catalogWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
        spark.sql("""
          SELECT 'head' AS snap, event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM graft.lake.events
          WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                       AND TIMESTAMP '2024-01-12 23:59:59.999999'
          GROUP BY event_type
          UNION ALL
          SELECT 'v1' AS snap, event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM graft.lake.events VERSION AS OF 1
          GROUP BY event_type
        """)
      },
    ),
    Q(
      "q204_cdf_consumer",
      "The lake's CDC story CLOSED END TO END: a long-lived consumer " +
        "(graft.streaming.ChangeFeedStream) holds a durable version " +
        "cursor on the orders table and, across a MERGE (every 97th " +
        "price doubled), a merge-on-read key delete (every 89th key " +
        "tombstoned — O(keys) bytes), and a CoW DELETE composing with " +
        "the pending tombstones (price > 450k), each poll drains " +
        "exactly the unseen commits as insert/delete rows and FOLDS " +
        "them into the materialized per-status rollup " +
        "(ChangeFeedView.fold — signed counts, exact DECIMAL signed " +
        "sums). The oracle recomputes the final state relationally, so " +
        "cursor-driven fold == full recompute, bit for bit; " +
        "ChangeFeedStreamSpec pins the delivery contract (advance " +
        "after sink, crash re-delivery, maintenance crossings). At " +
        "100 TB each poll reads only the files its commits touched — " +
        "the downstream view never rescans the table.",
      Some("""
        WITH src AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice * 2 AS o_totalprice, o_orderdate,
                 'X-MERGED' AS o_orderpriority
          FROM orders WHERE o_orderkey % 97 = 0
        ),
        merged AS (
          SELECT * FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
          UNION ALL SELECT * FROM src
        ),
        afterdel AS (SELECT * FROM merged WHERE o_orderkey % 89 <> 0),
        fin AS (
          SELECT * FROM afterdel
          WHERE NOT COALESCE(o_totalprice > 450000, FALSE)
        )
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM fin GROUP BY o_orderstatus
      """.trim),
      (spark, dir) => {
        val out = graft.Artifacts.cached(s"cdf-consumer:$dir") { base =>
          val t = s"$base/table"
          val cur = s"$base/cursor"
          val o = Tables(spark, dir).orders
          ManifestTable.commit(o.repartitionByRange(8, col("o_orderkey")), t, Seq("o_orderkey"))
          graft.streaming.ChangeFeedStream.init(cur, ManifestTable.latestVersion(t).get)
          var view = ChangeFeedView.init(spark, t, Seq("o_orderstatus"), "o_totalprice")
          def drain(): Unit =
            graft.streaming.ChangeFeedStream.poll(spark, t, cur, (feed, _, _) =>
              view = graft.operators.Lineage.pin(
                ChangeFeedView.fold(view, feed, Seq("o_orderstatus"), "o_totalprice"))): Unit
          // merge, then poll; MoR delete + CoW delete land BETWEEN polls
          // so one poll drains a multi-commit range
          val upd = o.filter(col("o_orderkey") % 97 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2)
            .withColumn("o_orderpriority", lit("X-MERGED"))
          ManifestTable.merge(upd, t, keys = Seq("o_orderkey"))
          drain()
          ManifestTable.deleteByKey(
            ManifestTable.snapshot(spark, t).filter(col("o_orderkey") % 89 === 0)
              .select("o_orderkey").distinct(), t, Seq("o_orderkey"))
          ManifestTable.delete(spark, t, col("o_totalprice") > 450000)
          drain()
          view.write.parquet(s"$base/view")
        }
        spark.read.parquet(s"$out/view")
          .select(col("o_orderstatus"), col("n"),
            col("total").cast("double").as("sum_price"))
      },
    ),
    Q(
      "q205_row_update",
      "Row-level UPDATE (ManifestTable.update — the third DML member " +
        "beside q183's DELETE and q182's MERGE): early error events get " +
        "value *= 2, evaluated against the OLD row, with SQL " +
        "semantics (FALSE and NULL conditions leave rows untouched) and " +
        "the committed type pinned per SET column. File-granular " +
        "copy-on-write through the applied view: the ts-clustered " +
        "layout means only pre-cutoff files rewrite, later files keep " +
        "their manifest entries, concurrent appends rebase, and pending " +
        "MoR tombstones compose (spec-pinned). The oracle applies the " +
        "same CASE rewrite relationally — UPDATE correctness reduces to " +
        "a projection identity.",
      Some(s"""
        WITH upd AS (
          SELECT event_id, ts, user_id, event_type,
                 CASE WHEN COALESCE(event_type = 'error'
                             AND ts < TIMESTAMP '2024-01-10 00:00:00', FALSE)
                      THEN value * 2 ELSE value END AS value,
                 props
          FROM events
        )
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM upd GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = graft.Artifacts.cached(s"manifest-events-update:$dir") { p =>
          val ev = Tables(spark, dir).events
          ManifestTable.commit(ev.repartitionByRange(10, col("ts")), p, track = Seq("ts"))
          ManifestTable.update(spark, p,
            col("event_type") === "error" &&
              col("ts") < lit("2024-01-10 00:00:00").cast("timestamp"),
            Map("value" -> col("value") * 2)): Unit
        }
        ManifestTable.snapshot(spark, t)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q206_pos_delete",
      "POSITIONAL merge-on-read deletes (ManifestTable.deleteWhere — " +
        "the Iceberg-v2-positional / Delta-deletion-vector role, " +
        "completing the tombstone pair next to q196's equality " +
        "deletes): DELETE WHERE for an arbitrary predicate writes only " +
        "(file-basename, row-index) pairs — named by the parquet " +
        "reader's own _metadata.row_index — and rewrites NOTHING; " +
        "readers remove exactly the named rows with one anti join. " +
        "Path-scoping replaces the sequence rule: a file rewritten by " +
        "any CoW op gets a new basename, so stale pairs can never " +
        "re-apply. The oracle applies the same predicate relationally, " +
        "so positional-MoR read semantics are hash-gated; the spec " +
        "additionally pins zero-rewrite commits, stacking with " +
        "equality tombstones, feed visibility, and materialize folding " +
        "both kinds. At 100 TB: predicate deletes in kilobytes where " +
        "CoW rewrites gigabytes, debt repaid on the maintenance " +
        "cadence.",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events
        WHERE NOT COALESCE(event_type = 'view' AND value > 50, FALSE)
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = graft.Artifacts.cached(s"manifest-events-posdel:$dir") { p =>
          val ev = Tables(spark, dir).events
          ManifestTable.commit(ev.repartitionByRange(10, col("ts")), p, track = Seq("ts"))
          ManifestTable.deleteWhere(spark, p,
            col("event_type") === "view" && col("value") > 50): Unit
        }
        ManifestTable.snapshot(spark, t)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q207_maintenance",
      "The table MAINTENANCE CADENCE end to end (ManifestTable." +
        "maintain — materialize MoR debt, binpack small files, expire " +
        "history, vacuum staging, in that fixed order): events land as " +
        "6 micro-batch-sized commits plus one equality and one " +
        "positional tombstone commit, then one maintain() call folds " +
        "the tombstones, compacts the small files into ts-clustered " +
        "replacements, and drops expired history — after which the " +
        "table is ONE clean snapshot whose rows are IDENTICAL to what " +
        "the raw data implies. The oracle recomputes that state " +
        "relationally, so maintenance content-neutrality is hash-gated " +
        "— the property that lets it run unattended beside ingest at " +
        "100 TB (each step is the same conflict-checked commit it is " +
        "standalone: races rebase or fail loudly, never corrupt).",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events
        WHERE user_id NOT IN (1, 2)
          AND NOT COALESCE(event_type = 'error' AND value < 5, FALSE)
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val t = graft.Artifacts.cached(s"manifest-events-maint:$dir") { p =>
          val ev = Tables(spark, dir).events
          // micro-batch-shaped ingest: 6 small commits
          (0 until 6).foreach { b =>
            ManifestTable.commit(ev.filter(pmod(col("event_id"), lit(6)) === b), p,
              track = Seq("ts")): Unit
          }
          ManifestTable.deleteByKey(
            spark.range(2).select((col("id") + 1).as("user_id")), p, Seq("user_id"))
          ManifestTable.deleteWhere(spark, p,
            col("event_type") === "error" && col("value") < 5)
          ManifestTable.maintain(spark, p, clusterBy = "ts",
            smallFileRows = 1000000L, targetFiles = 4, keepLast = 1,
            vacuumMinAgeMs = -1L): Unit
        }
        val m = ManifestTable.manifest(t, None)
        assert(!m.hasMorDeletes, "maintenance must fold all tombstones")
        ManifestTable.snapshot(spark, t)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q209_ts_travel",
      "SQL `TIMESTAMP AS OF` through the catalog: manifest heads stamp " +
        "their commit wall clock (provenance-only epoch micros; legacy " +
        "heads fall back to file mtime), and resolution monotonizes the " +
        "clocks over version order (Delta's clamp) so a clock " +
        "regression can never make time travel non-monotonic. The " +
        "query derives the v1 commit instant FROM THE TABLE'S OWN " +
        "METADATA and asks for that moment — which must resolve to " +
        "exactly the v1 snapshot the oracle reconstructs from the " +
        "commit-split predicate. Same contract as q202's VERSION AS OF " +
        "with the analyst-friendlier spelling.",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val wh = catalogWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
        // 1ms before v2's stamped clock: >= v1's stamp (the fixture
        // guarantees a >=3ms gap), strictly before v2 — resolves to v1
        val target = ManifestTable.manifest(s"$wh/lake/events", Some(2L))
          .commitTsMicros.getOrElse(
            throw new IllegalStateException("fresh commits must stamp a clock")) - 1000L
        val lit = java.time.format.DateTimeFormatter
          .ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS").withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochSecond(
            target / 1000000L, (target % 1000000L) * 1000L))
        spark.sql(s"""
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM graft.lake.events TIMESTAMP AS OF '$lit'
          GROUP BY event_type
        """)
      },
    ),
    Q(
      "q210_catalog_mor_sql",
      "Pending merge-on-read deletes THROUGH plain catalog SQL: the " +
        "graftmor.lake.morevents table carries live equality tombstones " +
        "(three users, one re-inserted above the tombstone's sequence) " +
        "and the user just types SELECT — the injected " +
        "graft.plans.MorApplyRewrite resolution rule swaps the DSv2 " +
        "relation for the applied-read plan (positional anti join + " +
        "sequence-scoped key join) at analysis time, re-aliased onto " +
        "the relation's own output so downstream references bind " +
        "unchanged. Same oracle as q196 proves catalog SQL == applied " +
        "API read, bit for bit, WITHOUT materializeDeletes — so at " +
        "100 TB a steady retraction stream never forces a maintenance " +
        "cycle between SQL reads. GraftCatalogSpec pins the rewrite " +
        "(incl. time travel) and the loud no-extensions refusal.",
      Some(s"""
        WITH re AS (
          SELECT event_id, ts, user_id, 'returned' AS event_type, value, props
          FROM events WHERE user_id = 2
          ORDER BY event_id LIMIT 1
        ),
        snap AS (
          SELECT * FROM events WHERE user_id NOT IN (1, 2, 3)
          UNION ALL SELECT * FROM re
        )
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM snap GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val wh = catalogMorWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graftmor", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftmor.warehouse", wh)
        assert(ManifestTable.manifest(s"$wh/lake/morevents", None).hasMorDeletes,
          "fixture must have PENDING tombstones — the point is reading through them")
        spark.sql("""
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM graftmor.lake.morevents
          GROUP BY event_type
        """)
      },
    ),
    Q(
      "q212_catalog_write_sql",
      "The catalog WRITE path: lake/evsql is built entirely through " +
        "SQL DML — CTAS with PARTITIONED BY declaring the stat-tracked " +
        "column, INSERT INTO appending the rest, and a SELF-READING " +
        "INSERT OVERWRITE dropping one user cohort — each statement " +
        "riding the same transactional surface as an API commit " +
        "(executors stage parquet, driver installs the manifest via " +
        "atomic create-if-absent; envelope stats collected at commit " +
        "time, so SQL-written files prune — GraftCatalogSpec pins 1-of-4 " +
        "file scans and the two-racing-inserts convergence). CTAS is " +
        "ATOMIC (StagingTableCatalog: definition + data land as ONE " +
        "v1 manifest; a failed CTAS is invisible), so the readback " +
        "joins the head against VERSION AS OF 2 (the pre-overwrite " +
        "snapshot), hash-gating both the final content " +
        "and the overwrite's time-travel-preserved history against the " +
        "oracle's reconstruction.",
      Some(s"""
        WITH cur AS (
          SELECT event_type, count(*) AS n, $d30_2 AS sum_value
          FROM events WHERE user_id % 7 <> 3 GROUP BY event_type
        ),
        pre AS (SELECT count(*) AS pre_overwrite_rows FROM events)
        SELECT cur.event_type, cur.n, cur.sum_value, pre.pre_overwrite_rows
        FROM cur CROSS JOIN pre
      """.trim),
      (spark, dir) => {
        val wh = catalogSqlWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graftw", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftw.warehouse", wh)
        spark.sql("""
          SELECT cur.event_type, cur.n, cur.sum_value, pre.pre_overwrite_rows
          FROM (SELECT event_type, count(*) AS n,
                       CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
                FROM graftw.lake.evsql GROUP BY event_type) cur
          CROSS JOIN (SELECT count(*) AS pre_overwrite_rows
                      FROM graftw.lake.evsql VERSION AS OF 2) pre
        """)
      },
    ),
    Q(
      "q213_catalog_delete_sql",
      "SQL row-level DELETE through the catalog (SupportsDelete -> the " +
        "file-granular CoW delete): the condition arrives as pushed " +
        "source filters, translates to the engine's delete algebra " +
        "(untranslatable conditions refused loudly in canDeleteWhere), " +
        "one column-pruned metadata pass finds the files holding " +
        "matching rows, ONLY those are rewritten, and the manifest " +
        "swaps atomically — at 100 TB a selective DELETE FROM rewrites " +
        "a handful of files while the pre-delete snapshot keeps " +
        "time-traveling (the readback joins VERSION AS OF 1 — the " +
        "atomic CTAS commit — to pin that). Oracle reconstructs the " +
        "surviving multiset from raw " +
        "events.",
      Some(s"""
        WITH cur AS (
          SELECT event_type, count(*) AS n, $d30_2 AS sum_value
          FROM events WHERE NOT (event_type = 'click' AND user_id BETWEEN 20 AND 60)
          GROUP BY event_type
        ),
        pre AS (SELECT count(*) AS pre_delete_rows FROM events)
        SELECT cur.event_type, cur.n, cur.sum_value, pre.pre_delete_rows
        FROM cur CROSS JOIN pre
      """.trim),
      (spark, dir) => {
        val wh = catalogDeleteWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graftd", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftd.warehouse", wh)
        spark.sql("""
          SELECT cur.event_type, cur.n, cur.sum_value, pre.pre_delete_rows
          FROM (SELECT event_type, count(*) AS n,
                       CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
                FROM graftd.lake.evdel GROUP BY event_type) cur
          CROSS JOIN (SELECT count(*) AS pre_delete_rows
                      FROM graftd.lake.evdel VERSION AS OF 1) pre
        """)
      },
    ),
    Q(
      "q214_catalog_rowlevel_sql",
      "SQL UPDATE and MERGE INTO through the catalog " +
        "(SupportsRowLevelOperations, group-based copy-on-write): the " +
        "UPDATE's pushed condition prunes the rewrite to the files " +
        "whose envelopes can hold a matching row, the MERGE reads its " +
        "corrections from a staged source view and lands matched " +
        "doubled values + unmatched 'adjustment' inserts in ONE atomic " +
        "commit, a second MERGE runs the full three-family clause set " +
        "with NOT MATCHED BY SOURCE deleting target-only rows in a " +
        "reconciliation band, and Spark's own rewrite rules drive all " +
        "of it through the operation's scan (which records the planned " +
        "file set) and the NATIVE batch write (executor tasks stream " +
        "parquet, driver swaps exactly the planned files, " +
        "conflict-checked). The readback also rides the _version " +
        "metadata column (max = head version 4 — the CTAS is one " +
        "atomic commit) and VERSION AS OF 1 " +
        "(pre-DML content preserved) — all hash-gated against the " +
        "oracle's reconstruction of flag-update + merge algebra, the " +
        "BY-SOURCE delete composed as an anti-join (DuckDB lacks the " +
        "clause).",
      Some(s"""
        WITH base AS (
          SELECT event_id, user_id,
            CASE WHEN event_type = 'click' AND user_id BETWEEN 10 AND 40
                 THEN 'flagged' ELSE event_type END AS event_type,
            CASE WHEN event_type = 'click' AND user_id BETWEEN 10 AND 40 THEN 0.0
                 WHEN event_type = 'purchase' AND user_id BETWEEN 50 AND 70 THEN value * 2
                 ELSE value END AS value
          FROM events
        ),
        adj AS (
          SELECT -event_id AS event_id, user_id, 'adjustment' AS event_type, value
          FROM events WHERE event_type = 'purchase' AND user_id BETWEEN 50 AND 55
        ),
        fin AS (SELECT * FROM base UNION ALL SELECT * FROM adj),
        -- NOT MATCHED BY SOURCE delete as an anti-join: clicks in the
        -- 95-99 band survive only when the (user-95) source matches
        fin2 AS (
          SELECT * FROM fin f
          WHERE NOT (f.event_type = 'click' AND f.user_id BETWEEN 95 AND 99)
             OR f.event_id IN (SELECT event_id FROM events
                               WHERE event_type = 'click' AND user_id = 95)
        ),
        cur AS (
          SELECT event_type, count(*) AS n, $d30_2 AS sum_value
          FROM fin2 GROUP BY event_type
        ),
        pre AS (SELECT count(*) AS pre_rows FROM events)
        SELECT cur.event_type, cur.n, cur.sum_value, pre.pre_rows,
               CAST(4 AS BIGINT) AS head_version
        FROM cur CROSS JOIN pre
      """.trim),
      (spark, dir) => {
        val wh = catalogUpdateWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graftu", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftu.warehouse", wh)
        spark.sql("""
          SELECT cur.event_type, cur.n, cur.sum_value, pre.pre_rows, hv.head_version
          FROM (SELECT event_type, count(*) AS n,
                       CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
                FROM graftu.lake.evupd GROUP BY event_type) cur
          CROSS JOIN (SELECT count(*) AS pre_rows
                      FROM graftu.lake.evupd VERSION AS OF 1) pre
          CROSS JOIN (SELECT max(_version) AS head_version FROM graftu.lake.evupd) hv
        """)
      },
    ),
    Q(
      "q211_maintained_feed",
      "The change feed STITCHED across a maintenance window: the " +
        "consumer's cursor (v1) predates a materializeDeletes (v4) that " +
        "removed the delete files the bounded feed keys on — " +
        "previously a table-sized applied-snapshot diff. The v4 head's " +
        "state-preserving `op` marker (applied view == parent's, by " +
        "construction) lets netChanges split the range AT the boundary, " +
        "run the file-bounded feed on each side, and fold the pieces " +
        "with multiset cancellation — reading only the files the REAL " +
        "commits touched, never the materialize rewrite, never the " +
        "untouched table. The oracle reconstructs the exact net feed " +
        "(three users' deletes, the returned row, the replayed batch), " +
        "so stitch == truth is hash-gated; ManifestTableSpec pins " +
        "boundedness on inputFiles. At 100 TB: the routine maintenance " +
        "cadence costs a lagging consumer O(touched files), not a " +
        "table scan.",
      Some(s"""
        WITH del AS (
          SELECT event_type, 'delete' AS change, value
          FROM events WHERE user_id IN (1, 2, 3)
        ),
        ret AS (
          SELECT 'returned' AS event_type, 'insert' AS change, value
          FROM (SELECT value, event_id FROM events WHERE user_id = 2
                ORDER BY event_id LIMIT 1)
        ),
        rep AS (
          SELECT 'replayed' AS event_type, 'insert' AS change, value
          FROM events WHERE user_id = 4
        ),
        feed AS (
          SELECT * FROM del UNION ALL SELECT * FROM ret UNION ALL SELECT * FROM rep
        )
        SELECT change, event_type, count(*) AS n, $d30_2 AS sum_value
        FROM feed GROUP BY change, event_type
      """.trim),
      (spark, dir) => {
        val t = maintainedFeedEvents(spark, dir)
        assert(ManifestTable.manifest(t, Some(4L)).statePreserving,
          "the materialize commit must carry the state-preserving marker")
        val head = ManifestTable.latestVersion(t).get
        ManifestTable.netChanges(spark, t, 1L, head)
          .groupBy(col("_change").as("change"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q192_restore",
      "Metadata-only RESTORE (ManifestTable.restore — Delta's RESTORE " +
        "semantics): a fat-finger merge multiplies every 7th order's " +
        "price by 100, then the table rolls back to v1 by committing a " +
        "new manifest that references v1's files VERBATIM — zero data " +
        "copied or rewritten, the bad commit stays time-travelable for " +
        "the audit trail, and GC keeps every file the restored head " +
        "references. The aggregate over the restored head must equal " +
        "the plain pre-merge rollup the oracle computes — at 100 TB the " +
        "alternative to this O(1) undo is rewriting the table.",
      Some("""
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_orderstatus
      """.trim),
      (spark, dir) => {
        val t = restoredOrders(spark, dir)
        ManifestTable.snapshot(spark, t)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_price"))
      },
    ),
    Q(
      "q215_catalog_stream_read",
      "The catalog's streaming READ half (spark.readStream.table over " +
        "a manifest table — graft.sources.GraftMicroBatchStream, " +
        "manifest versions as offsets): stream #1 delivers the " +
        "initial snapshot (events before Jan 20) to a parquet sink and " +
        "stops; a second commit appends the rest; stream #2 RESTARTS " +
        "from the same checkpoint and delivers exactly the files the " +
        "new commit appended — the offset log makes replay plan the " +
        "identical file list, so the sink holds every event exactly " +
        "once across the restart. The aggregate over the sink is " +
        "hash-gated against the oracle's full-table rollup: a " +
        "duplicated snapshot, a re-streamed file, or a missed commit " +
        "all flip counts. At 100 TB: an idle poll is one head " +
        "resolution, a drain is O(commits) metadata + appended bytes, " +
        "and the stream's retention pin keeps a lagging consumer's " +
        "commits alive (GraftStreamReadSpec pins change-commit " +
        "refusal, skipChangeCommits, and maintenance-commit skipping).",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val out = streamedEvents(spark, dir)
        spark.read.parquet(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
              .cast("double").as("sum_value"))
      },
    ),
    Q(
      "q220_star_dpp",
      "Runtime file pruning end to end (the lake's dynamic-partition-" +
        "pruning analog, SupportsRuntimeV2Filtering): a 12-file lake " +
        "fact range-clustered on l_orderkey joins a parquet dim whose " +
        "key_quartile selection localizes the matching keys — Spark's " +
        "DPP machinery hands the fact scan the dim's join-key values " +
        "AT EXECUTION (the dim broadcast is reused as the pruning " +
        "subquery), and the envelope survivor analysis drops the ~9 " +
        "fact files that cannot hold a matching key before any task " +
        "launches (GraftCatalogSpec pins planned-vs-survived). At " +
        "100 TB a star join touching one dim slice opens that slice's " +
        "fact files only. Oracle reconstructs the dim inline with " +
        "identical integer-division bucketing.",
      Some("""
        WITH dim AS (
          SELECT o_orderkey,
                 LEAST(3, (o_orderkey * 4) // (SELECT max(o_orderkey) + 1 FROM orders))
                   AS key_quartile,
                 o_orderpriority
          FROM orders
        )
        SELECT count(*) AS n,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM lineitem l JOIN dim d ON l.l_orderkey = d.o_orderkey
        WHERE d.key_quartile = 1 AND d.o_orderpriority <> '3-MEDIUM'
      """.trim),
      (spark, dir) => {
        val p = dppWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graftdpp", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftdpp.warehouse", s"$p/wh")
        spark.read.parquet(s"$p/dim").createOrReplaceTempView("dpp_order_dim")
        spark.sql("""
          SELECT count(*) AS n,
                 CAST(sum(CAST(l.l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
                 CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
          FROM graftdpp.lake.li l JOIN dpp_order_dim d ON l.l_orderkey = d.o_orderkey
          WHERE d.key_quartile = 1 AND d.o_orderpriority <> '3-MEDIUM'
        """)
      },
    ),
    Q(
      "q221_metadata_agg",
      "Aggregates answered from MANIFEST METADATA with zero file I/O " +
        "(SupportsPushDownAggregates): a filterless count(*)/min/max " +
        "over a catalog table folds per-file row counts and commit-" +
        "time envelope stats into a driver-local one-row scan — no " +
        "BatchScan, no tasks, the Iceberg metadata-aggregate " +
        "optimization; at 100 TB a bare count(*) is an O(files) " +
        "driver fold instead of a cluster job. The query fn asserts " +
        "the plan IS the LocalTableScan answer, and the hash gate " +
        "proves the metadata numbers equal the oracle's full scan.",
      Some("""
        SELECT count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts FROM events
      """.trim),
      (spark, dir) => {
        val p = aggWarehouse(spark, dir)
        spark.conf.set("spark.sql.catalog.graftagg", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftagg.warehouse", s"$p/wh")
        val df = spark.sql(
          "SELECT count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts " +
            "FROM graftagg.lake.evagg")
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
          s"metadata aggregate must answer without a scan, got:\n$plan")
        df
      },
    ),
    Q(
      "q216_catalog_rename_sql",
      "ALTER TABLE RENAME COLUMN as METADATA-ONLY schema evolution " +
        "(ManifestTable.renameColumn — zero data I/O where a naive " +
        "lake rename rewrites the table): lake/evren commits January's " +
        "events under the original `value` column, SQL renames it to " +
        "`amount`, and the rest of the month appends under the NEW " +
        "name. Old files keep their bytes under the old physical name; " +
        "the committed rename chain groups live files by NAME ERA, " +
        "reads each era under the names its bytes carry, and projects " +
        "back to the committed schema (one extra scan per era, never " +
        "per file — SchemaEvolutionSpec pins zero files written and " +
        "era-pushed envelope pruning). Plain SQL gets the era-union " +
        "plan through the injected rewrite rule; VERSION AS OF 1 still " +
        "reads the old schema. Hash-gated: a mis-grouped era would " +
        "NULL out half the amounts.",
      Some(s"""
        WITH cur AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_amount
          FROM events GROUP BY event_type
        ),
        pre AS (
          SELECT count(*) AS pre_rename_rows FROM events
          WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        )
        SELECT cur.event_type, cur.n, cur.sum_amount, pre.pre_rename_rows
        FROM cur CROSS JOIN pre
      """.trim),
      (spark, dir) => {
        val wh = renamedEvents(spark, dir)
        spark.conf.set("spark.sql.catalog.graftren", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftren.warehouse", wh)
        spark.sql("""
          SELECT cur.event_type, cur.n, cur.sum_amount, pre.pre_rename_rows
          FROM (SELECT event_type, count(*) AS n,
                       CAST(sum(CAST(amount AS DECIMAL(30,2))) AS DOUBLE) AS sum_amount
                FROM graftren.lake.evren GROUP BY event_type) cur
          CROSS JOIN (SELECT count(*) AS pre_rename_rows
                      FROM graftren.lake.evren VERSION AS OF 1) pre
        """)
      },
    ),
    Q(
      "q225_hidden_partition",
      "HIDDEN PARTITIONING (Iceberg's signature idea on the engine's " +
        "envelope machinery — graft.sources.TrackSpec): the events " +
        "lake table tracks days(ts) and bucket(8, user_id), so " +
        "per-file envelopes are collected on the TRANSFORMED values, " +
        "and a plain ts-range query — no synthetic day column " +
        "anywhere, the user never learns the table is day-partitioned " +
        "— prunes files through constraints DERIVED from the source " +
        "predicate (monotone day range; the hash bucket serves " +
        "equality). Plan-audited in-query: the V2 scan must open a " +
        "strict subset of the day-clustered files. Results are " +
        "bit-identical to the raw-table oracle by construction (the " +
        "retained filter runs exactly).",
      Some(s"""
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-11 00:00:00'
        GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"hidden-partition-warehouse:$dir") { w =>
          val p = s"$w/lake/hpev"
          new java.io.File(p).mkdirs()
          val ev = Tables(spark, dir).events
            .select(col("ts"), col("user_id"), col("event_type"), col("value"))
          ManifestTable.commit(ev.repartitionByRange(12, col("ts")), p,
            track = Seq("days(ts)", "bucket(8,user_id)")): Unit
        }
        spark.conf.set("spark.sql.catalog.grafthp", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.grafthp.warehouse", wh)
        val q = spark.sql(s"""
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM grafthp.lake.hpev
          WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-11 00:00:00'
          GROUP BY event_type
        """)
        // plan audit: the derived days(ts) constraint must prune the
        // day-clustered file set — a 3-of-30-day window cannot need
        // every file. Audited on an agg-free probe of the SAME
        // predicate (AQE wraps the agg plan and hides the scan node;
        // the scan builder prunes identically either way).
        val probe = spark.sql(s"""
          SELECT ts FROM grafthp.lake.hpev
          WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-11 00:00:00'
        """)
        val total = ManifestTable.manifest(s"$wh/lake/hpev", None).files.size
        val scanned = probe.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            (b.scan match {
              case g: graft.sources.GraftLakeScan => g.underlying
              case o => o
            }) match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case _ => 0
            }
        }.sum
        assert(scanned > 0 && scanned < total,
          s"hidden partitioning must prune the ts range: scanned $scanned of $total")
        q
      },
    ),
    Q(
      "q226_wap_sql",
      "q223's write-audit-publish lifecycle with EVERY step SQL — " +
        "Iceberg's spark.wap.branch parity (spark.graft.wap.branch): " +
        "while the session knob names a branch, plain INSERT INTOs " +
        "stage as shadow snapshots on it, plain SELECTs serve the " +
        "branch head (the audit reads exactly the bytes that would " +
        "publish, no VERSION AS OF ceremony), and ROW CORRECTIONS are " +
        "plain DELETE FROM / UPDATE — each a branch-scoped CoW " +
        "rewrite commit, zero CALLs: a mistake batch is deleted " +
        "outright and a typo'd label is updated in place, both " +
        "staged. Main stays isolated (asserted mid-lifecycle by " +
        "unsetting the knob) and CALL fast_forward publishes the " +
        "audited chain metadata-only. Same oracle as q223: the " +
        "SQL-only surface and the typed API converge on the identical " +
        "published table.",
      Some(s"""
        -- the mistake batch and the typo'd label are corrected ON THE
        -- BRANCH by plain DML before publish, so the oracle's final
        -- content is exactly base + the two (corrected) adjustments
        WITH adj1 AS (
          SELECT -event_id AS event_id, ts, user_id, 'adjustment' AS event_type, value, props
          FROM events WHERE event_type = 'purchase' AND user_id BETWEEN 50 AND 55
        ),
        adj2 AS (
          SELECT -event_id AS event_id, ts, user_id, 'adjustment' AS event_type, value, props
          FROM events WHERE event_type = 'purchase' AND user_id BETWEEN 56 AND 60
        ),
        fin AS (
          SELECT * FROM events
          UNION ALL SELECT * FROM adj1
          UNION ALL SELECT * FROM adj2
        )
        SELECT event_type, count(*) AS n, $d30_2 AS sum_value,
               CAST(6 AS BIGINT) AS head_version
        FROM fin GROUP BY event_type
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"wap-sql-warehouse:$dir") { w =>
          val t = s"$w/lake/wapev"
          new java.io.File(t).mkdirs()
          val ev = Tables(spark, dir).events
          ManifestTable.commit(ev.repartitionByRange(8, col("ts")), t, track = Seq("ts"))
          spark.conf.set("spark.sql.catalog.graftwap", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftwap.warehouse", w)
          spark.sql("CALL graftwap.system.create_branch(table => 'lake.wapev', name => 'corrections')")
          spark.conf.set("spark.graft.wap.branch", "corrections")
          try {
            def adj(lo: Int, hi: Int, label: String) = spark.sql(
              s"""INSERT INTO graftwap.lake.wapev
                  SELECT -event_id AS event_id, ts, user_id,
                         '$label' AS event_type, value, props
                  FROM graftwap.lake.wapev VERSION AS OF 1
                  WHERE event_type = 'purchase' AND user_id BETWEEN $lo AND $hi""")
            adj(50, 55, "adjustment")
            adj(56, 60, "adjustmnt") // typo'd label — corrected below
            // a mistaken batch — removed below by plain DELETE; any
            // rows do (they never publish), but there must BE some at
            // every sf, so take them from the base snapshot itself
            spark.sql(
              """INSERT INTO graftwap.lake.wapev
                 SELECT -event_id - 9000000 AS event_id, ts, user_id,
                        'mistake' AS event_type, value, props
                 FROM graftwap.lake.wapev VERSION AS OF 1 LIMIT 5""")
            // ROW CORRECTIONS are plain SQL DML while routing: each is
            // a branch-scoped CoW rewrite commit, zero CALLs
            spark.sql("DELETE FROM graftwap.lake.wapev WHERE event_type = 'mistake'")
            spark.sql("UPDATE graftwap.lake.wapev SET event_type = 'adjustment' " +
              "WHERE event_type = 'adjustmnt'")
            // main isolation while staged (the knob off = main)
            spark.conf.unset("spark.graft.wap.branch")
            val mainN = spark.sql("SELECT count(*) FROM graftwap.lake.wapev").head().getLong(0)
            val baseN = Tables(spark, dir).events.count()
            assert(mainN == baseN, s"main must stay isolated while staged: $mainN != $baseN")
            spark.conf.set("spark.graft.wap.branch", "corrections")
            // the audit is a PLAIN select — reads serve the branch
            val bad = spark.sql(
              "SELECT count(*) FROM graftwap.lake.wapev WHERE event_id IS NULL OR value < 0 " +
                "OR event_type IN ('mistake', 'adjustmnt')")
              .head().getLong(0)
            require(bad == 0,
              "audit failed: corrections carry null ids, negative values, or uncorrected rows")
            spark.sql("CALL graftwap.system.fast_forward(table => 'lake.wapev', name => 'corrections')"): Unit
          } finally spark.conf.unset("spark.graft.wap.branch")
        }
        spark.conf.set("spark.sql.catalog.graftwap", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftwap.warehouse", wh)
        val headV = ManifestTable.latestVersion(s"$wh/lake/wapev").get
        assert(headV == 6L && ManifestTable.branches(s"$wh/lake/wapev").isEmpty,
          s"SQL publish must land 3 staged appends + 2 staged CoW rewrites and fold " +
            s"the branch (head=$headV)")
        spark.sql(s"""
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value,
                 CAST($headV AS BIGINT) AS head_version
          FROM graftwap.lake.wapev GROUP BY event_type
        """)
      },
    ),
    Q(
      "q227_sql_view",
      "SQL views over catalog tables — the DSv2 ViewCatalog, wired in " +
        "by the engine's extensions (OSS Spark ships the API with no " +
        "analyzer support; a parse-time rewrite handles CREATE/DROP/" +
        "SHOW VIEWS, a resolution rule expands view reads): CREATE " +
        "VIEW persists one JSON document in the warehouse (restart-" +
        "surviving, nothing materialized), a SELECT through the view " +
        "re-resolves the definition text against the catalog — so it " +
        "plans through the same scan builder and prunes like the " +
        "direct query — and the final aggregate reads ONLY the view.",
      Some(s"""
        WITH purview AS (
          SELECT user_id, event_type, value FROM events WHERE event_type = 'purchase'
        )
        SELECT user_id, count(*) AS n, $d30_2 AS sum_value
        FROM purview GROUP BY user_id
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"sql-view-warehouse:$dir") { w =>
          val t = s"$w/lake/vev"
          new java.io.File(t).mkdirs()
          val ev = Tables(spark, dir).events
          ManifestTable.commit(ev.repartitionByRange(8, col("ts")), t, track = Seq("ts"))
          spark.conf.set("spark.sql.catalog.graftvw", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftvw.warehouse", w)
          spark.sql("CREATE VIEW graftvw.lake.purview AS " +
            "SELECT user_id, event_type, value FROM graftvw.lake.vev " +
            "WHERE event_type = 'purchase'")
          // the document is on disk under the warehouse, not in session
          // state — the restart-survival contract
          assert(new java.io.File(s"$w/lake/_views/purview.json").isFile,
            "view must persist as one warehouse JSON document")
        }
        spark.conf.set("spark.sql.catalog.graftvw", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftvw.warehouse", wh)
        assert(spark.sql("SHOW VIEWS IN graftvw.lake").collect()
          .exists(_.getString(1) == "purview"), "SHOW VIEWS must list it")
        spark.sql(s"""
          SELECT user_id, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
          FROM graftvw.lake.purview GROUP BY user_id
        """)
      },
    ),
    Q(
      "q228_zorder_prune",
      "CALL graft.system.zorder as a first-class oracled operation: a " +
        "hash-scattered two-dimension lake table (every file spans the " +
        "full range of BOTH dimensions — provably un-prunable) " +
        "re-clusters by Morton interleaving through the transactional " +
        "rewrite swap; the corner-range aggregate then matches the " +
        "oracle bit-for-bit (content neutrality THROUGH the oracle " +
        "gate, not just a hash spec) and an in-query plan audit proves " +
        "the re-clustered envelopes pruned the V2 scan.",
      Some("""
        WITH t AS (
          SELECT l_orderkey % 1024 AS x, l_partkey % 1024 AS y, l_quantity FROM lineitem
        )
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
        FROM t WHERE x < 256 AND y < 256
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"zorder-warehouse:$dir") { w =>
          val t = s"$w/lake/zli"
          new java.io.File(t).mkdirs()
          val li = Tables(spark, dir).lineitem
            .selectExpr("l_orderkey % 1024 AS x", "l_partkey % 1024 AS y", "l_quantity")
          // round-robin scatter: every file spans both dimensions
          ManifestTable.commit(li.repartition(8), t, track = Seq("x", "y"))
          spark.conf.set("spark.sql.catalog.graftzo", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftzo.warehouse", w)
          spark.sql("CALL graftzo.system.zorder(table => 'lake.zli', cols => 'x,y', " +
            "bits => 10, num_files => 16)"): Unit
        }
        spark.conf.set("spark.sql.catalog.graftzo", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftzo.warehouse", wh)
        // plan audit on an agg-free probe of the SAME predicate (AQE
        // wraps the agg plan; the scan builder prunes identically)
        val probe = spark.sql(
          "SELECT x FROM graftzo.lake.zli WHERE x < 256 AND y < 256")
        val total = ManifestTable.manifest(s"$wh/lake/zli", None).files.size
        val scanned = probe.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            (b.scan match {
              case g: graft.sources.GraftLakeScan => g.underlying
              case o => o
            }) match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case _ => 0
            }
        }.sum
        assert(scanned > 0 && scanned < total,
          s"the z-ordered corner query must prune: scanned $scanned of $total")
        spark.sql("""
          SELECT count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
          FROM graftzo.lake.zli WHERE x < 256 AND y < 256
        """)
      },
    ),
    Q(
      "q229_delete_mode",
      "write.delete.mode as a PERSISTED TBLPROPERTY steering plain SQL " +
        "DELETE FROM (Iceberg's table-config contract): CTAS declares " +
        "merge-on-read, so the first DELETE commits O(matching rows) " +
        "positional tombstones and rewrites ZERO data files (audited: " +
        "identical file list, tombstones present — at 100 TB a " +
        "GDPR-class erasure costs kilobytes); ALTER TABLE SET " +
        "TBLPROPERTIES flips to copy-on-write and the SAME statement " +
        "shape now swaps rewritten files while CARRYING the pending " +
        "tombstones. The readback rides MorApplyRewrite (tombstones " +
        "apply seq-scoped on read) and must match the oracle's direct " +
        "double-NOT-IN reconstruction bit for bit.",
      Some("""
        SELECT count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderkey % 10 <> 3 AND o_orderkey % 10 <> 7
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"delete-mode-warehouse:$dir") { w =>
          val t = s"$w/lake/dmord"
          new java.io.File(t).mkdirs()
          val o = Tables(spark, dir).orders
            .selectExpr("o_orderkey", "o_orderkey % 10 AS bucket", "o_totalprice")
          ManifestTable.commit(o.repartitionByRange(8, col("o_orderkey")), t,
            track = Seq("o_orderkey"))
          ManifestTable.setProperties(t, Map("write.delete.mode" -> "merge-on-read"))
          spark.conf.set("spark.sql.catalog.graftdm", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftdm.warehouse", w)
          val before = ManifestTable.manifest(t, None)
          spark.sql("DELETE FROM graftdm.lake.dmord WHERE bucket = 3"): Unit
          val mor = ManifestTable.manifest(t, None)
          assert(mor.files.map(_.path) == before.files.map(_.path),
            "merge-on-read DELETE must rewrite no data files")
          assert(mor.posDeleteFiles.nonEmpty,
            "merge-on-read DELETE must land positional tombstones")
          spark.sql("ALTER TABLE graftdm.lake.dmord " +
            "SET TBLPROPERTIES('write.delete.mode'='copy-on-write')"): Unit
          spark.sql("DELETE FROM graftdm.lake.dmord WHERE bucket = 7"): Unit
          val cow = ManifestTable.manifest(t, None)
          assert(cow.files.map(_.path) != mor.files.map(_.path),
            "copy-on-write DELETE must swap rewritten files")
          assert(cow.posDeleteFiles.size == mor.posDeleteFiles.size,
            "the CoW rewrite carries the pending tombstones")
        }
        spark.conf.set("spark.sql.catalog.graftdm", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftdm.warehouse", wh)
        spark.sql("""
          SELECT count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
          FROM graftdm.lake.dmord
        """)
      },
    ),
    Q(
      "q230_write_distribution",
      "write.distribution-mode=range as a persisted table property " +
        "(Iceberg's write-layout contract via DSv2 " +
        "RequiresDistributionAndOrdering): a plain SQL INSERT INTO from " +
        "a hash-scattered source — every input partition spans the " +
        "whole key domain — lands as range-clustered, internally sorted " +
        "files with DISJOINT envelopes (audited from the committed " +
        "manifest), sized by write.target-file-bytes; the narrow range " +
        "readback then prunes the V2 scan (plan-audited in-query) and " +
        "matches the oracle bit-for-bit. At 100 TB: one write-side " +
        "shuffle, declared ONCE on the table, buys every subsequent " +
        "range query its file skipping.",
      Some("""
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
        FROM lineitem WHERE l_orderkey % 100000 < 5000
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"write-dist-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftwd", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftwd.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          spark.sql("CREATE TABLE graftwd.lake.wdli (k BIGINT, l_quantity DOUBLE) " +
            "PARTITIONED BY (k) TBLPROPERTIES('write.distribution-mode'='range', " +
            "'write.target-file-bytes'='262144')")
          Tables(spark, dir).lineitem
            .selectExpr("l_orderkey % 100000 AS k", "l_quantity")
            // hash-scatter so the write-side shuffle is the ONLY thing
            // that can produce a clustered layout
            .repartition(8).createOrReplaceTempView("wd_src")
          // unit scales sit under AQE's 1MB coalesce floor; lower it so
          // the table's advisory binds, then restore
          val minKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
          val prevMin = spark.conf.getOption(minKey)
          spark.conf.set(minKey, "16384")
          try spark.sql("INSERT INTO graftwd.lake.wdli SELECT * FROM wd_src"): Unit
          finally prevMin match {
            case Some(v) => spark.conf.set(minKey, v)
            case None => spark.conf.unset(minKey)
          }
          val m = ManifestTable.manifest(s"$w/lake/wdli", None)
          assert(m.files.size > 1, "the clustered insert must write several files")
          val envs = m.files.map(f => (f.mins("k").get.toLong, f.maxs("k").get.toLong))
            .sortBy(_._1)
          envs.sliding(2).foreach {
            case Seq((_, aMax), (bMin, _)) =>
              assert(aMax <= bMin, s"range-mode envelopes must be disjoint: $envs")
            case _ => ()
          }
        }
        spark.conf.set("spark.sql.catalog.graftwd", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftwd.warehouse", wh)
        val head = ManifestTable.manifest(s"$wh/lake/wdli", None)
        val total = head.files.size
        // audit probe below the SECOND file's min envelope: with the
        // disjointness the build asserted, exactly the first file(s)
        // can match — prunable at ANY scale, independent of where the
        // range split landed relative to the oracle's fixed predicate
        val cut = head.files.map(_.mins("k").get.toLong).sorted.apply(1)
        val probe = spark.sql(s"SELECT k FROM graftwd.lake.wdli WHERE k < $cut")
        val scanned = probe.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            (b.scan match {
              case g: graft.sources.GraftLakeScan => g.underlying
              case o => o
            }) match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case _ => 0
            }
        }.sum
        assert(scanned > 0 && scanned < total,
          s"the clustered layout must prune the narrow range: scanned $scanned of $total")
        spark.sql("""
          SELECT count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
          FROM graftwd.lake.wdli WHERE k < 5000
        """)
      },
    ),
    Q(
      "q231_mor_upsert_sql",
      "MERGE-ON-READ row-level SQL DML end to end (SupportsDelta + the " +
        "Iceberg identifier-field contract): the table declares " +
        "identifier.columns plus write.update.mode / write.merge.mode = " +
        "merge-on-read, so a plain UPDATE and a three-clause MERGE INTO " +
        "(matched update, matched delete, not-matched insert) each " +
        "commit as ONE atomic delta — equality tombstones for the " +
        "touched identifiers + fresh files for the new row versions — " +
        "with ZERO files rewritten (audited: every original file " +
        "survives both statements verbatim). The MERGE's read applies " +
        "the UPDATE's pending tombstones (MorApplyRewrite on the delta " +
        "read — MoR DML chains), the readback applies all of it " +
        "seq-scoped, and the oracle reconstructs the full lifecycle " +
        "relationally. At 100 TB: a CDC upsert stream in O(delta) bytes " +
        "per statement, debt repaid on the maintenance cadence.",
      Some("""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 10 = 4 THEN o_totalprice * 2 ELSE o_totalprice END AS p
          FROM orders),
        after_merge AS (
          SELECT k, CASE WHEN k % 7 = 0 THEN 1000.0 ELSE p END AS p
          FROM base WHERE NOT (k % 7 = 0 AND k % 14 <> 0)),
        ins AS (SELECT -(o_orderkey + 1) AS k, 5.0 AS p FROM orders WHERE o_orderkey % 11 = 0)
        SELECT count(*) AS n,
               CAST(sum(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_p
        FROM (SELECT * FROM after_merge UNION ALL SELECT * FROM ins)
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"mor-upsert-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftmu", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftmu.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          Tables(spark, dir).orders.selectExpr("o_orderkey AS k", "o_totalprice AS p")
            .createOrReplaceTempView("mu_src")
          spark.sql("CREATE TABLE graftmu.lake.muord TBLPROPERTIES(" +
            "'identifier.columns'='k', 'write.update.mode'='merge-on-read', " +
            "'write.merge.mode'='merge-on-read') AS SELECT * FROM mu_src")
          val t = s"$w/lake/muord"
          val before = ManifestTable.manifest(t, None)
          spark.sql("UPDATE graftmu.lake.muord SET p = p * 2 WHERE k % 10 = 4"): Unit
          val m1 = ManifestTable.manifest(t, None)
          assert(before.files.map(_.path).forall(m1.files.map(_.path).contains) &&
            m1.deleteFiles.nonEmpty,
            "MoR UPDATE must add tombstones + new rows, never rewrite")
          spark.sql("SELECT k, CAST(1000.0 AS DOUBLE) AS nv FROM mu_src WHERE k % 7 = 0 " +
            "UNION ALL SELECT -(k + 1) AS k, CAST(5.0 AS DOUBLE) AS nv FROM mu_src WHERE k % 11 = 0")
            .createOrReplaceTempView("mu_delta")
          spark.sql("""
            MERGE INTO graftmu.lake.muord t USING mu_delta s ON t.k = s.k
            WHEN MATCHED AND t.k % 14 = 0 THEN UPDATE SET p = s.nv
            WHEN MATCHED THEN DELETE
            WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, s.nv)
          """): Unit
          val m2 = ManifestTable.manifest(t, None)
          assert(before.files.map(_.path).forall(m2.files.map(_.path).contains),
            "MoR MERGE must leave every original file in place")
        }
        spark.conf.set("spark.sql.catalog.graftmu", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftmu.warehouse", wh)
        spark.sql("""
          SELECT count(*) AS n,
                 CAST(sum(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_p
          FROM graftmu.lake.muord
        """)
      },
    ),
    Q(
      "q232_rtas",
      "Atomic REPLACE TABLE AS SELECT (StagingTableCatalog — the " +
        "Iceberg atomic-swap shape): a raw per-order table is REPLACED " +
        "in one commit by its per-customer rollup with a DIFFERENT " +
        "schema, partitioning column, and property set (REPLACE " +
        "redefines the table; the staged write lands invisibly and " +
        "commitStagedChanges installs definition + data as one " +
        "version). The readback folds a scalar subquery over VERSION " +
        "AS OF 1 into the head's aggregate — the replaced raw world " +
        "stays time-travelable, and the 1-row history side plugs in as " +
        "a pre-executed ScalarSubquery, not a join — so the hash gate " +
        "proves both the swap's content and the preserved history. At " +
        "100 TB: publish a recomputed gold table under the same name " +
        "with zero partially-visible states and an O(1) rollback " +
        "(restore v1).",
      Some("""
        WITH rolled AS (
          SELECT o_custkey,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey
        )
        SELECT agg.n_customers, agg.total_spend, agg.max_orders,
               (SELECT CAST(count(*) AS BIGINT) FROM orders) AS raw_rows
        FROM (SELECT CAST(count(*) AS BIGINT) AS n_customers,
                     CAST(sum(CAST(spend AS DECIMAL(30,2))) AS DOUBLE) AS total_spend,
                     CAST(max(n_orders) AS BIGINT) AS max_orders
              FROM rolled) agg
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"rtas-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftrt", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftrt.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          Tables(spark, dir).orders.selectExpr("o_orderkey", "o_custkey", "o_totalprice")
            .createOrReplaceTempView("rt_src")
          spark.sql("CREATE TABLE graftrt.lake.gold PARTITIONED BY (o_orderkey) " +
            "TBLPROPERTIES('tier'='raw') AS SELECT * FROM rt_src")
          spark.sql("REPLACE TABLE graftrt.lake.gold PARTITIONED BY (o_custkey) " +
            "TBLPROPERTIES('tier'='gold') AS " +
            "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, " +
            "CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS spend " +
            "FROM rt_src GROUP BY o_custkey"): Unit
          val m = ManifestTable.manifest(s"$w/lake/gold", None)
          assert(m.version == 2L && m.track == Seq("o_custkey") &&
            m.props == Map("tier" -> "gold"),
            "RTAS must swap definition and content in ONE commit")
        }
        spark.conf.set("spark.sql.catalog.graftrt", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftrt.warehouse", wh)
        spark.sql("""
          SELECT agg.n_customers, agg.total_spend, agg.max_orders,
                 (SELECT CAST(count(*) AS BIGINT)
                  FROM graftrt.lake.gold VERSION AS OF 1) AS raw_rows
          FROM (SELECT CAST(count(*) AS BIGINT) AS n_customers,
                       CAST(sum(CAST(spend AS DECIMAL(30,2))) AS DOUBLE) AS total_spend,
                       CAST(max(n_orders) AS BIGINT) AS max_orders
                FROM graftrt.lake.gold) agg
        """)
      },
    ),
    Q(
      "q233_widen",
      "Metadata-only safe type widening (Iceberg's schema-evolution " +
        "matrix, `ALTER TABLE ... ALTER COLUMN ... TYPE`): a lineitem " +
        "rollup lands under NARROW types (int keys, float price), three " +
        "ALTERs widen them to bigint/double touching ZERO data files " +
        "(old files read under the wide schema via the parquet reader's " +
        "widening promotions; float envelopes re-render through the " +
        "exact float->double conversion so range pruning stays " +
        "bit-correct), and an INSERT then lands a row only the wide " +
        "types can hold. The readback aggregates across both eras. At " +
        "100 TB: outgrowing int32 keys costs one O(files)-metadata " +
        "commit, not a table rewrite.",
      Some("""
        WITH src AS (
          SELECT CAST(l_orderkey AS INTEGER) AS ok,
                 CAST(l_quantity AS INTEGER) AS qty,
                 CAST(l_extendedprice AS REAL) AS price
          FROM lineitem
        ),
        wide AS (
          SELECT CAST(ok AS BIGINT) AS ok, CAST(qty AS BIGINT) AS qty,
                 CAST(price AS DOUBLE) AS price
          FROM src
          UNION ALL SELECT CAST(9000000000 AS BIGINT), CAST(7 AS BIGINT), 0.125
        )
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qty) AS BIGINT) AS total_qty,
               CAST(max(ok) AS BIGINT) AS max_ok,
               min(price) AS min_price,
               max(price) AS max_price
        FROM wide
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"widen-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftwd", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftwd.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          Tables(spark, dir).lineitem
            .selectExpr("CAST(l_orderkey AS INT) AS ok",
              "CAST(l_quantity AS INT) AS qty",
              "CAST(l_extendedprice AS FLOAT) AS price")
            .createOrReplaceTempView("wd_src")
          spark.sql("CREATE TABLE graftwd.lake.wide PARTITIONED BY (ok) AS " +
            "SELECT /*+ REPARTITION_BY_RANGE(8, ok) */ * FROM wd_src")
          val before = ManifestTable.manifest(s"$w/lake/wide", None)
          spark.sql("ALTER TABLE graftwd.lake.wide ALTER COLUMN ok TYPE BIGINT")
          spark.sql("ALTER TABLE graftwd.lake.wide ALTER COLUMN qty TYPE BIGINT")
          spark.sql("ALTER TABLE graftwd.lake.wide ALTER COLUMN price TYPE DOUBLE")
          val m = ManifestTable.manifest(s"$w/lake/wide", None)
          assert(m.files.map(_.path) == before.files.map(_.path) &&
            m.retypes.size == 3,
            "widening must be three metadata-only commits over the same files")
          spark.sql("INSERT INTO graftwd.lake.wide VALUES " +
            "(CAST(9000000000 AS BIGINT), CAST(7 AS BIGINT), CAST(0.125 AS DOUBLE))"): Unit
        }
        spark.conf.set("spark.sql.catalog.graftwd", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftwd.warehouse", wh)
        spark.sql("""
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(qty) AS BIGINT) AS total_qty,
                 CAST(max(ok) AS BIGINT) AS max_ok,
                 min(price) AS min_price,
                 max(price) AS max_price
          FROM graftwd.lake.wide
        """)
      },
    ),
    Q(
      "q234_zorder_write",
      "Write-time z-order clustering (`write.distribution-mode = " +
        "'zorder'`): the table DECLARES 2-D clustering on (p_size, " +
        "bucketed partkey) and every plain SQL INSERT range-partitions " +
        "+ sorts by the Morton value (the catalog's own zorder " +
        "ScalarFunction resolved through RequiresDistributionAndOrdering " +
        "— the q228 maintenance pass's key, applied at ingest so no " +
        "separate CALL is ever needed). The readback is the corner " +
        "window q228 exists for, and the query asserts it PRUNES files " +
        "whose bounding boxes miss the corner. At 100 TB: corner-query " +
        "locality is a property of the table, not of remembering to " +
        "run maintenance.",
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p_retailprice_cents) AS BIGINT) AS cents
        FROM (SELECT CAST(p_retailprice * 100 AS BIGINT) AS p_retailprice_cents,
                     CAST(p_size AS BIGINT) AS x,
                     CAST(p_partkey % 1024 AS BIGINT) AS y
              FROM part)
        WHERE x < 13 AND y < 256
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"zorder-write-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftzw", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftzw.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          Tables(spark, dir).part
            .selectExpr("CAST(p_retailprice * 100 AS BIGINT) AS cents",
              "CAST(p_size AS BIGINT) AS x",
              "CAST(p_partkey % 1024 AS BIGINT) AS y")
            .createOrReplaceTempView("zw_src")
          spark.sql("CREATE TABLE graftzw.lake.zw (cents BIGINT, x BIGINT, y BIGINT) " +
            "PARTITIONED BY (x, y) TBLPROPERTIES(" +
            "'write.distribution-mode'='zorder', 'write.target-file-bytes'='16384')")
          spark.sql("INSERT INTO graftzw.lake.zw " +
            "SELECT /*+ REPARTITION(8) */ * FROM zw_src"): Unit
        }
        spark.conf.set("spark.sql.catalog.graftzw", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftzw.warehouse", wh)
        val q = spark.sql("""
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS cents
          FROM graftzw.lake.zw WHERE x < 13 AND y < 256
        """)
        val total = ManifestTable.manifest(s"$wh/lake/zw", None).files.size
        val scanned = q.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            (b.scan match {
              case g: graft.sources.GraftLakeScan => g.underlying
              case o => o
            }) match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case _ => 0
            }
        }.sum
        assert(total < 2 || scanned < total,
          s"the corner window must prune ingest-clustered files ($scanned of $total)")
        q
      },
    ),
    Q(
      "q236_zorder_write_mixed",
      "Write-time z-order on NON-INTEGRAL dimensions: the table declares " +
        "2-D clustering on a raw (timestamp, string) pair and every SQL " +
        "INSERT clusters through the zorder function's monotone per-type " +
        "surrogates (minutes-since-epoch for the timestamp, binary " +
        "prefix for the string — graft.sources.ZOrderFunction), no " +
        "integral pre-transform anywhere in the schema. The readback is " +
        "the time-window x category corner every event table serves, and " +
        "the query asserts it PRUNES files on both envelope dimensions. " +
        "At 100 TB: (ts, region) ingest locality without maintaining a " +
        "derived integer twin of every dimension.",
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,2)) * 100) AS BIGINT) AS cents
        FROM events
        WHERE ts < TIMESTAMP '2024-01-08 00:00:00' AND event_type = 'click'
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"zorder-write-mixed-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftzm", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftzm.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          Tables(spark, dir).events
            .selectExpr("ts", "event_type AS etype",
              "CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT) AS cents")
            .createOrReplaceTempView("zm_src")
          spark.sql("CREATE TABLE graftzm.lake.zm (ts TIMESTAMP, etype STRING, cents BIGINT) " +
            "PARTITIONED BY (ts, etype) TBLPROPERTIES(" +
            "'write.distribution-mode'='zorder', 'write.target-file-bytes'='16384')")
          spark.sql("INSERT INTO graftzm.lake.zm " +
            "SELECT /*+ REPARTITION(8) */ * FROM zm_src"): Unit
        }
        spark.conf.set("spark.sql.catalog.graftzm", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftzm.warehouse", wh)
        val q = spark.sql("""
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS cents
          FROM graftzm.lake.zm
          WHERE ts < TIMESTAMP '2024-01-08 00:00:00' AND etype = 'click'
        """)
        val total = ManifestTable.manifest(s"$wh/lake/zm", None).files.size
        val scanned = q.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            (b.scan match {
              case g: graft.sources.GraftLakeScan => g.underlying
              case o => o
            }) match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case _ => 0
            }
        }.sum
        assert(total < 2 || scanned < total,
          s"the (ts, etype) corner must prune ingest-clustered files ($scanned of $total)")
        q
      },
    ),
    Q(
      "q237_column_defaults",
      "Column DEFAULT values as PURE METADATA (Iceberg v3's " +
        "initial-default/write-default split on Spark 4's " +
        "SUPPORT_COLUMN_DEFAULT_VALUE surface): an orders rollup gains " +
        "region (DEFAULT 'emea') and flag (no default) via ADD COLUMN " +
        "touching ZERO data files — every pre-add file reads the " +
        "IMMUTABLE initial default natively in the parquet reader; " +
        "INSERTs that omit the column fill the WRITE default at " +
        "analysis; SET DEFAULT moves only future writes. The query also " +
        "audits the pruning claim: pre-add files are known-constant " +
        "'emea', so the region='apac' probe must skip them without any " +
        "envelope. At 100 TB: backfilling a new dimension costs one " +
        "O(files)-metadata commit, not a table rewrite.",
      Some("""
        WITH rws AS (
          SELECT o_orderkey AS ok, 'emea' AS region, CAST(NULL AS BIGINT) AS flag
          FROM orders
          UNION ALL SELECT CAST(9000000001 AS BIGINT), 'apac', CAST(5 AS BIGINT)
          UNION ALL SELECT CAST(9000000002 AS BIGINT), 'emea', CAST(NULL AS BIGINT)
          UNION ALL SELECT CAST(9000000003 AS BIGINT), 'apac', CAST(NULL AS BIGINT)
        )
        SELECT region, CAST(count(*) AS BIGINT) AS n,
               CAST(count(flag) AS BIGINT) AS n_flag,
               CAST(max(ok) AS BIGINT) AS max_ok
        FROM rws GROUP BY region ORDER BY region
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"defaults-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftdf", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftdf.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          Tables(spark, dir).orders.selectExpr("o_orderkey AS ok")
            .createOrReplaceTempView("df_src")
          spark.sql("CREATE TABLE graftdf.lake.defs PARTITIONED BY (ok) AS " +
            "SELECT /*+ REPARTITION_BY_RANGE(4, ok) */ ok FROM df_src")
          val before = ManifestTable.manifest(s"$w/lake/defs", None)
          spark.sql("ALTER TABLE graftdf.lake.defs " +
            "ADD COLUMN region STRING DEFAULT 'emea'")
          spark.sql("ALTER TABLE graftdf.lake.defs ADD COLUMN flag BIGINT")
          val after = ManifestTable.manifest(s"$w/lake/defs", None)
          assert(after.files == before.files,
            "ADD COLUMN ... DEFAULT must be a metadata-only commit")
          spark.sql("INSERT INTO graftdf.lake.defs VALUES (9000000001, 'apac', 5)")
          spark.sql("INSERT INTO graftdf.lake.defs (ok) VALUES (9000000002)")
          spark.sql("ALTER TABLE graftdf.lake.defs ALTER COLUMN region SET DEFAULT 'apac'")
          spark.sql("INSERT INTO graftdf.lake.defs (ok) VALUES (9000000003)"): Unit
        }
        spark.conf.set("spark.sql.catalog.graftdf", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftdf.warehouse", wh)
        // prune audit: the pre-add files are known-constant 'emea' on an
        // UNTRACKED column (the claim comes from the added-in stamp, no
        // envelope exists) — region = 'apac' must skip all of them
        val probe = spark.sql(
          "SELECT count(*) FROM graftdf.lake.defs WHERE region = 'apac'")
        val total = ManifestTable.manifest(s"$wh/lake/defs", None).files.size
        val scanned = probe.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            (b.scan match {
              case g: graft.sources.GraftLakeScan => g.underlying
              case o => o
            }) match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case _ => 0
            }
        }.sum
        assert(scanned < total,
          s"pre-add files must prune on the initial-default claim ($scanned of $total)")
        spark.sql("""
          SELECT region, CAST(count(*) AS BIGINT) AS n,
                 CAST(count(flag) AS BIGINT) AS n_flag,
                 CAST(max(ok) AS BIGINT) AS max_ok
          FROM graftdf.lake.defs GROUP BY region ORDER BY region
        """)
      },
    ),
    Q(
      "q238_profile_sql",
      "Column profiling from plain SQL: CALL graft.system.profile runs " +
        "the one-pass profile (Stats.profile/profileApprox) through the " +
        "stored-procedure surface and returns the rows as a result-set " +
        "scan — the 100 TB first-look reachable the way zorder is. The " +
        "query pins the EXACT twin (rsd => 0: count(DISTINCT)) so every " +
        "cell hash-matches the oracle's direct aggregates; serving the " +
        "sketch is the same CALL at the default rsd.",
      Some("""
        WITH b AS (SELECT c_custkey, c_mktsegment FROM customer),
        a AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(count(c_custkey) AS BIGINT) AS nn1,
          CAST(count(DISTINCT c_custkey) AS BIGINT) AS ndv1,
          CAST(min(c_custkey) AS DOUBLE) AS mn1,
          CAST(max(c_custkey) AS DOUBLE) AS mx1,
          CAST(count(c_mktsegment) AS BIGINT) AS nn2,
          CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS ndv2,
          CAST(min(c_mktsegment) AS VARCHAR) AS mns2,
          CAST(max(c_mktsegment) AS VARCHAR) AS mxs2 FROM b)
        SELECT 'c_custkey' AS col_name, n, n - nn1 AS n_null, ndv1 AS ndv,
               mn1 AS min_num, mx1 AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM a
        UNION ALL
        SELECT 'c_mktsegment', n, n - nn2, ndv2,
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mns2, mxs2
        FROM a
        ORDER BY col_name
      """.trim),
      (spark, dir) => {
        val wh = graft.Artifacts.cached(s"profile-warehouse:$dir") { w =>
          spark.conf.set("spark.sql.catalog.graftpf", "graft.sources.GraftCatalog")
          spark.conf.set("spark.sql.catalog.graftpf.warehouse", w)
          new java.io.File(s"$w/lake").mkdirs()
          ManifestTable.commit(
            Tables(spark, dir).customer.select("c_custkey", "c_mktsegment"),
            s"$w/lake/prof", track = Seq("c_custkey")): Unit
        }
        spark.conf.set("spark.sql.catalog.graftpf", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graftpf.warehouse", wh)
        spark.sql("CALL graftpf.system.profile(" +
          "table => 'lake.prof', columns => 'c_custkey, c_mktsegment', rsd => 0.0)")
          .orderBy("col_name")
      },
    ),
  )

  /** Built once per (session, sf dir): a star pair for the runtime-
    * pruning query — lineitem as a lake fact range-clustered on
    * l_orderkey (12 files), and a parquet dim labeling each order with
    * its orderkey QUARTILE (a non-key attribute whose selection is
    * key-localized, the shape DPP exists for).
    */
  private def dppWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-dpp:$dir") { p =>
      val wh = s"$p/wh"
      val fact = s"$wh/lake/li"
      new java.io.File(fact).mkdirs()
      val li = Tables(spark, dir).lineitem
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      ManifestTable.commit(
        li.repartitionByRange(12, col("l_orderkey")), fact, track = Seq("l_orderkey"))
      val o = Tables(spark, dir).orders
      val maxKey = o.agg(max(col("o_orderkey"))).head().getLong(0)
      // pure INTEGER division (div/`//`) so both engines bucket
      // identically — double division rounds at quartile boundaries
      o.select(col("o_orderkey"),
          least(lit(3L), expr(s"(o_orderkey * 4) div ${maxKey + 1}")).as("key_quartile"),
          col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$p/dim")
    }

  /** Built once per (session, sf dir): events as a catalog table with
    * ts tracked — the metadata-aggregate query's fixture.
    */
  private def aggWarehouse(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-agg:$dir") { p =>
      val wh = s"$p/wh"
      val t = s"$wh/lake/evagg"
      new java.io.File(t).mkdirs()
      ManifestTable.commit(
        Tables(spark, dir).events.repartitionByRange(6, col("ts")), t, track = Seq("ts")): Unit
    }

  /** Built once per (session, sf dir): events committed pre-rename
    * (January under `value`), SQL-renamed to `amount`, the rest
    * appended under the new name — two live name eras.
    */
  private def renamedEvents(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-rename:$dir") { p =>
      val wh = s"$p/wh"
      spark.conf.set("spark.sql.catalog.graftren", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftren.warehouse", wh)
      val tdir = s"$wh/lake/evren"
      new java.io.File(tdir).mkdirs()
      val ev = Tables(spark, dir).events
      val split = lit("2024-01-20 00:00:00").cast("timestamp")
      ManifestTable.commit(
        ev.filter(col("ts") < split).repartition(4), tdir, track = Seq("ts"))
      spark.sql("ALTER TABLE graftren.lake.evren RENAME COLUMN value TO amount")
      ManifestTable.commit(
        ev.filter(col("ts") >= split).withColumnRenamed("value", "amount")
          .repartition(3), tdir, track = Seq("ts"))
    } + "/wh"

  /** Built once per (session, sf dir): a catalog table committed in
    * two halves, consumed by TWO runs of a checkpointed
    * `readStream.table` stream into one parquet sink — run #1 takes
    * the initial snapshot, run #2 restarts after the second commit and
    * drains exactly the appended files. Returns the sink directory;
    * its content is the exactly-once union the q215 oracle gates.
    */
  private def streamedEvents(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.Artifacts.cached(s"catalog-stream-read:$dir") { p =>
      val wh = s"$p/wh"
      spark.conf.set("spark.sql.catalog.graftstr", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftstr.warehouse", wh)
      val tdir = s"$wh/lake/evstream"
      new java.io.File(tdir).mkdirs()
      val ev = Tables(spark, dir).events
      val split = lit("2024-01-20 00:00:00").cast("timestamp")
      ManifestTable.commit(
        ev.filter(col("ts") < split).repartition(4), tdir, track = Seq("ts"))
      def drain(): Unit = {
        val q = spark.readStream.table("graftstr.lake.evstream")
          .writeStream.format("parquet")
          .option("path", s"$p/out")
          .option("checkpointLocation", s"$p/ckpt")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      drain() // initial snapshot
      ManifestTable.commit(
        ev.filter(col("ts") >= split).repartition(3), tdir, track = Seq("ts"))
      drain() // checkpointed restart: appended files only
    } + "/out"
}
