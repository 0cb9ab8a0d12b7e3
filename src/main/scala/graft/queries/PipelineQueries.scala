package graft.queries

import graft.{Num, Tables}
import graft.multimodal.Multimodal
import graft.operators.{FieldMapping, MappingCompiler}
import graft.pipeline.{SyncJob, VerifiedUpdates}
import graft.sources.ExtJson
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked analogs of the reference's pipeline semantics
  * (SURVEY.md §2.2-§2.5), each driven through the real engine module it
  * exercises: mapping-schema transform (MappingCompiler), watermark
  * ranged sync + lifecycle stats (SyncJob), verified-data keyed upsert
  * (VerifiedUpdates), entity split, enrichment lookup, BSON extended-
  * JSON round-trip (ExtJson), multimodal feature plumbing (Multimodal),
  * and gap sessionization (batch twin of the streaming path).
  */
object PipelineQueries {

  val qs: Seq[Q] = Seq(
    Q(
      "q41_mapping_transform",
      "Per-tenant mapping-schema transform: config -> compiled projection " +
        "(rename/cast/derive), fused into the scan by codegen. The " +
        "CustomerTransformationStep analog (SURVEY §2.2 #11).",
      Some("""
        SELECT c_custkey AS contact_id, c_name AS full_name,
          lower(c_mktsegment) AS segment, c_acctbal AS balance,
          CAST(c_nationkey AS VARCHAR) AS nation_code
        FROM customer
      """.trim),
      (spark, dir) => {
        val mapping = Seq(
          FieldMapping("c_custkey", "contact_id", Some("bigint")),
          FieldMapping("c_name", "full_name"),
          FieldMapping("lower(c_mktsegment)", "segment"),
          FieldMapping("c_acctbal", "balance", Some("double")),
          FieldMapping("c_nationkey", "nation_code", Some("string")),
        )
        MappingCompiler.transform(Tables(spark, dir).customer, mapping)
      },
    ),
    Q(
      "q42_incremental_sync",
      "Watermark ranged scan: rows after (ts, id) — the CDC-style " +
        "incremental batch (SURVEY §2.4 #25). The predicate is a Catalyst " +
        "filter, pushed into the parquet scan (or a JDBC subquery at the " +
        "real source).",
      Some("""
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
        WHERE o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
           OR (o_orderdate = TIMESTAMP '1997-06-01 00:00:00' AND o_orderkey > 3000)
      """.trim),
      (spark, dir) => {
        val wm = SyncJob.Watermark(java.sql.Timestamp.valueOf("1997-06-01 00:00:00"), 3000L)
        SyncJob.rangedScan(Tables(spark, dir).orders, "o_orderdate", "o_orderkey", wm)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      },
    ),
    Q(
      "q43_sync_stats",
      "Sync lifecycle bookkeeping: per-batch stats row (records_count, " +
        "from_id/to_id, advanced watermark, COMPLETED | NO_DATA) — the " +
        "data_sync_stats row of SURVEY §2.4 #27, incl. the empty-batch path.",
      Some("""
        WITH live AS (
          SELECT * FROM orders
          WHERE o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
             OR (o_orderdate = TIMESTAMP '1997-06-01 00:00:00' AND o_orderkey > 3000)),
        drained AS (
          SELECT * FROM orders WHERE o_orderdate > TIMESTAMP '2999-01-01 00:00:00')
        SELECT entity, records_count, from_id, to_id, new_watermark_ts, new_watermark_id,
          CASE WHEN records_count = 0 THEN 'NO_DATA' ELSE 'COMPLETED' END AS status
        FROM (
          SELECT 'orders' AS entity, count(*) AS records_count,
            min(o_orderkey) AS from_id, max(o_orderkey) AS to_id,
            max(o_orderdate) AS new_watermark_ts,
            max(CASE WHEN o_orderdate = (SELECT max(o_orderdate) FROM live)
                     THEN o_orderkey END) AS new_watermark_id
          FROM live
          UNION ALL
          SELECT 'orders_drained' AS entity, count(*), min(o_orderkey),
            max(o_orderkey), max(o_orderdate),
            max(CASE WHEN o_orderdate = (SELECT max(o_orderdate) FROM drained)
                     THEN o_orderkey END)
          FROM drained)
        ORDER BY entity
      """.trim),
      (spark, dir) => {
        val orders = Tables(spark, dir).orders
        val live = SyncJob.rangedScan(orders, "o_orderdate", "o_orderkey",
          SyncJob.Watermark(java.sql.Timestamp.valueOf("1997-06-01 00:00:00"), 3000L))
        val drained = SyncJob.rangedScan(orders, "o_orderdate", "o_orderkey",
          SyncJob.Watermark(java.sql.Timestamp.valueOf("2999-01-01 00:00:00"), 0L))
        SyncJob.syncStats(live, "o_orderdate", "o_orderkey", "orders")
          .unionAll(SyncJob.syncStats(drained, "o_orderdate", "o_orderkey", "orders_drained"))
      },
    ),
    Q(
      "q44_keyed_upsert",
      "Verified-data corrections: last-writer-wins keyed point updates " +
        "applied as dedup-to-latest + co-partitioned left join (SURVEY §2.5 " +
        "#30) — two update versions per key, seq 2 wins.",
      Some("""
        SELECT c_custkey, c_name, c_nationkey,
          CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 0.5 ELSE c_acctbal END AS c_acctbal,
          CASE WHEN c_custkey % 97 = 0 THEN 'VERIFIED_V2' ELSE c_mktsegment END AS c_mktsegment
        FROM customer ORDER BY c_custkey
      """.trim),
      (spark, dir) => {
        val base = Tables(spark, dir).customer
        val keyed = base.filter(col("c_custkey") % 97 === 0)
        val upd1 = keyed.select(col("c_custkey"), lit(1L).as("seq"),
          lit("VERIFIED_V1").as("new_segment"), (col("c_acctbal") + 100.0).as("new_acctbal"))
        val upd2 = keyed.select(col("c_custkey"), lit(2L).as("seq"),
          lit("VERIFIED_V2").as("new_segment"), (col("c_acctbal") + 0.5).as("new_acctbal"))
        VerifiedUpdates(base, upd1.unionAll(upd2), Seq("c_custkey"), "seq",
          Map("c_mktsegment" -> "new_segment", "c_acctbal" -> "new_acctbal"))
      },
    ),
    Q(
      "q45_entity_split",
      "Read+split fan-out: one event stream projected into two typed " +
        "entity branches with branch-specific transforms, then unioned — " +
        "the read_input_file split of SURVEY §2.2 #10, as two narrow " +
        "projections of one scan instead of temp-file materialization.",
      Some("""
        SELECT 'contact' AS entity, event_id, user_id,
          upper(event_type) AS tag, value
        FROM events WHERE event_type = 'signup'
        UNION ALL
        SELECT 'transaction' AS entity, event_id, user_id,
          'txn-' || CAST(event_id AS VARCHAR) AS tag, value * 100 AS value
        FROM events WHERE event_type = 'purchase'
      """.trim),
      (spark, dir) => {
        val ev = Tables(spark, dir).events
        val contacts = ev.filter(col("event_type") === "signup").select(
          lit("contact").as("entity"), col("event_id"), col("user_id"),
          upper(col("event_type")).as("tag"), col("value"))
        val txns = ev.filter(col("event_type") === "purchase").select(
          lit("transaction").as("entity"), col("event_id"), col("user_id"),
          concat(lit("txn-"), col("event_id").cast("string")).as("tag"),
          (col("value") * 100).as("value"))
        contacts.unionAll(txns)
      },
    ),
    Q(
      "q46_enrich_lookup",
      "EnrichmentStep analog (SURVEY §2.2 #13): derived attributes plus " +
        "broadcast dimension lookups (nation, region) — fixed-cardinality " +
        "dims, so the broadcast hint is correct at any scale.",
      Some("""
        SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name,
          CASE WHEN c_acctbal < 0 THEN 'delinquent'
               WHEN c_acctbal < 5000 THEN 'standard' ELSE 'premium' END AS balance_tier,
          CAST(length(c_name) AS BIGINT) AS name_len
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        ORDER BY c_custkey
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .select(
            col("c_custkey"), col("c_name"),
            col("n_name").as("nation_name"), col("r_name").as("region_name"),
            when(col("c_acctbal") < 0, "delinquent")
              .when(col("c_acctbal") < 5000, "standard")
              .otherwise("premium").as("balance_tier"),
            length(col("c_name")).cast("long").as("name_len"))
      },
    ),
    Q(
      "q47_extended_json",
      "BSON extended-JSON round-trip (SURVEY §1.1): encode $oid/$date/" +
        "$numberDecimal wrappers from typed columns, re-parse with " +
        "ExtJson.normalize (from_json + wrapper collapse, all codegen) — " +
        "the oracle computes the expected scalars directly, so the check " +
        "proves the round-trip is lossless.",
      Some("""
        SELECT o_orderkey,
          lpad(lower(hex(o_orderkey)), 24, '0') AS _id,
          o_orderdate AS created,
          CAST(CAST(o_custkey AS VARCHAR) || '.25' AS DOUBLE) AS amount,
          o_orderpriority AS priority
        FROM orders ORDER BY o_orderkey
      """.trim),
      (spark, dir) => {
        import ExtJson._
        val fields: Seq[(String, Kind)] =
          Seq("_id" -> Oid, "created" -> Date, "amount" -> Dec, "priority" -> Plain)
        // sort via Sorting.projected: a plain orderBy would run the whole
        // encode+decode pipeline twice (range-boundary sampling pass)
        graft.Sorting.projected(Tables(spark, dir).orders, col("o_orderkey")) { ord =>
          val encoded = ord.select(
            col("o_orderkey"),
            ExtJson.encode(Seq(
              ("_id", lpad(lower(hex(col("o_orderkey"))), 24, "0"), Oid),
              ("created", col("o_orderdate"), Date),
              ("amount", concat(col("o_custkey").cast("string"), lit(".25")), Dec),
              ("priority", col("o_orderpriority"), Plain),
            )).as("js"))
          ExtJson.normalizeDF(encoded, col("js"), fields, keep = Seq("o_orderkey"))
        }
      },
    ),
    Q(
      "q138_csv_roundtrip",
      "CSV sink -> source round trip (graft.sources.CsvIO, pinned " +
        "RFC-4180 dialect: doubled-quote escaping, NULL sentinel, ISO " +
        "micros timestamps): orders rows with free-text commas survive " +
        "write+read losslessly — the oracle reads the parquet truth " +
        "directly, so the hash-match proves fidelity for bigint/" +
        "timestamp/double/text. Read takes an explicit schema (never " +
        "inferSchema's extra full pass); CSV is the landing ramp, " +
        "parquet the query path.",
      Some("""
        SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority,
          CASE WHEN o_orderkey % 11 = 0 THEN NULL
               WHEN o_orderkey % 7 = 0 THEN ''
               ELSE o_orderpriority || ',"' || o_orderstatus || chr(92) || ' x,y '
          END AS hostile
        FROM orders
      """.trim),
      (spark, dir) => {
        val src = Tables(spark, dir).orders.selectExpr(
          "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority",
          // commas, quotes, a backslash (chr to keep both SQL dialects
          // literal-escape-free), leading/trailing spaces, '' vs NULL
          "CASE WHEN o_orderkey % 11 = 0 THEN NULL " +
            "WHEN o_orderkey % 7 = 0 THEN '' " +
            "ELSE concat(o_orderpriority, ',\"', o_orderstatus, chr(92), ' x,y ') END AS hostile")
        val out = graft.Artifacts.scratch("csvrt")
        graft.sources.CsvIO.write(src, out)
        graft.sources.CsvIO.read(spark, out, src.schema)
      },
    ),
    Q(
      "q142_session_paths",
      "User-journey path mining (graft.operators.Funnel.sessionPaths): " +
        "30-min gap sessions (q49's rule), each session's first 8 event " +
        "types as a '>'-joined path, top-20 journeys by count. Two " +
        "windows on ONE user-key shuffle, per-session fold, top-k via " +
        "TakeOrderedAndProject — all string/integer exact.",
      Some("""
        WITH e AS (
          SELECT user_id, event_id, ts, event_type,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events),
        b AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM e),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM b),
        p AS (SELECT user_id, sess,
                array_to_string(list(event_type ORDER BY ts, event_id)[1:8], '>') AS path
              FROM s GROUP BY user_id, sess)
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20
      """.trim),
      (spark, dir) =>
        graft.operators.Funnel.sessionPaths(Tables(spark, dir).events,
          "user_id", "ts", "event_id", "event_type"),
    ),
    Q(
      "q141_incremental_join",
      "Incremental JOIN-view maintenance (graft.pipeline.ViewMaintain): " +
        "orders ⋈ customer materialized view folded through 4 keyed " +
        "batches — inserts in thirds, an LWW price update wave, then " +
        "tombstone deletes — re-joining ONLY touched keys per batch " +
        "(O(|Δ|) dim-join work, never O(|fact|)). The oracle computes " +
        "the final state directly, so the hash-match proves the delta " +
        "algebra (retraction ∪ LWW-resolved re-join) converges to the " +
        "from-scratch join.",
      Some("""
        SELECT o.o_orderkey,
          CASE WHEN o.o_orderkey % 9 = 0 THEN o.o_totalprice + 1000.0 ELSE o.o_totalprice END AS o_totalprice,
          o.o_custkey, c.c_name
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey % 10 <> 0
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val base = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        def ins(i: Int) = base.filter(col("o_orderkey") % 3 === i)
          .withColumn("seq", lit(i.toLong)).withColumn("deleted", lit(false))
        // %9 == 0 implies %3 == 0: every update targets a batch-0 insert
        val upd = base.filter(col("o_orderkey") % 9 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("seq", lit(1L)).withColumn("deleted", lit(false))
        val tomb = base.filter(col("o_orderkey") % 10 === 0)
          .withColumn("seq", lit(3L)).withColumn("deleted", lit(true))
        val (_, view) = graft.pipeline.ViewMaintain.foldBatches(
          Seq(ins(0), ins(1).unionByName(upd), ins(2), tomb),
          "o_orderkey", "seq", "deleted",
          t.customer.select("c_custkey", "c_name"), "o_custkey", "c_custkey")
        view.select("o_orderkey", "o_totalprice", "o_custkey", "c_name")
      },
    ),
    Q(
      "q48_multimodal_features",
      "Multimodal plumbing: text -> opaque binary payload + metadata, " +
        "feature extraction via partition-parallel batched decode " +
        "(mapPartitions; codec stubbed deterministically) — the oracle " +
        "recomputes byte stats from the source text, proving the binary " +
        "round-trip and the typed Dataset path.",
      Some("""
        SELECT doc_id, 'text/plain' AS modality,
          CAST(strlen(text) AS BIGINT) AS n_bytes,
          CAST(list_sum(list_transform(string_split(text, ''), mc -> ascii(mc))) AS BIGINT) AS byte_sum,
          CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_byte
        FROM documents
      """.trim),
      (spark, dir) => {
        // no output sort: the result contract is a SET (the driver's
        // comparator canonicalizes), and a map-only query's orderBy
        // would execute the projection twice for range sampling
        Multimodal.extractFeatures(Multimodal.asMedia(Tables(spark, dir).documents))
          .drop("feature")
      },
    ),
    Q(
      "q61_image_decode",
      "REAL image codec end-to-end: render each document's bytes into a " +
        "grayscale PNG (javax.imageio encode), decode it back through the " +
        "real ImageIO decoder, and extract pixel features. Gray8 PNG is " +
        "lossless, so the oracle can recompute luma stats straight from " +
        "the source text — proving actual decoded pixels, not a stub.",
      Some("""
        SELECT doc_id,
          CAST(64 AS BIGINT) AS width,
          CAST(greatest(1, CAST(ceil(strlen(text) / 64.0) AS BIGINT)) AS BIGINT) AS height,
          CAST(list_sum(list_transform(string_split(text, ''), mc -> ascii(mc))) AS BIGINT) AS luma_sum,
          CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_luma
        FROM documents ORDER BY doc_id
      """.trim),
      (spark, dir) => {
        // Oracle-domain note (here and q63): Spark computes over UTF-8
        // BYTES; the SQL recomputes via per-CHARACTER ascii(), and
        // list_sum of an empty list is NULL. The forms coincide exactly
        // on non-empty ASCII text — which TESTDATA documents are by
        // construction — and diverge outside it.
        // The PNG encode+decode is by far the most expensive projection in
        // the catalog — absolutely not one to execute twice for sampling
        graft.Sorting.projected(Tables(spark, dir).documents, col("doc_id"))(d =>
          Multimodal.extractImageFeatures(Multimodal.asPngMedia(d, width = 64)).toDF())
      },
    ),
    Q(
      "q63_audio_decode",
      "REAL audio codec end-to-end: render each document's bytes as " +
        "unsigned 16-bit samples in a mono PCM WAV (javax.sound.sampled " +
        "encode), decode back through the real WAV reader, and extract " +
        "sample features. 16-bit PCM is lossless, so the oracle recomputes " +
        "sample stats straight from the source text — proving actual " +
        "decoded samples, not a stub.",
      Some("""
        SELECT doc_id,
          CAST(8000 AS BIGINT) AS sample_rate,
          CAST(strlen(text) AS BIGINT) AS n_samples,
          CAST(list_sum(list_transform(string_split(text, ''), mc -> ascii(mc))) AS BIGINT) AS sample_sum,
          CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_sample
        FROM documents ORDER BY doc_id
      """.trim),
      (spark, dir) => {
        // WAV encode+decode is an expensive projection like the PNG one:
        // sort via the projected helper so it runs once, not twice
        graft.Sorting.projected(Tables(spark, dir).documents, col("doc_id"))(d =>
          Multimodal.extractAudioFeatures(Multimodal.asWavMedia(d, sampleRate = 8000)).toDF())
      },
    ),
    Q(
      "q81_video_frames",
      "REAL multi-frame video codec end-to-end: chop each document's " +
        "bytes into 16x8 gray frames, encode as ONE animated GIF " +
        "(javax.imageio multi-frame writer, identity gray palette), parse " +
        "the container back and FRAME-SAMPLE every 2nd frame through the " +
        "real reader. Indexed-gray GIF is lossless, so the oracle " +
        "recomputes sampled-frame byte sums straight from the source text " +
        "— proving real container parsing + per-frame decode, not a stub.",
      Some("""
        WITH f AS (SELECT doc_id, text,
                     CAST(greatest(1, CAST(ceil(strlen(text) / 128.0) AS BIGINT)) AS BIGINT) AS n_frames,
                     CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_luma
                   FROM documents),
        s AS (SELECT doc_id, text, n_frames, head_luma,
                unnest(generate_series(0, n_frames - 1, 2)) AS fr
              FROM f),
        l AS (SELECT doc_id, n_frames, head_luma,
                coalesce(list_sum(list_transform(string_split(substr(text, fr * 128 + 1, 128), ''), vc -> ascii(vc))), 0) AS fl
              FROM s)
        SELECT doc_id, CAST(max(n_frames) AS BIGINT) AS n_frames,
          count(*) AS n_sampled, CAST(sum(fl) AS BIGINT) AS luma_sum,
          CAST(max(head_luma) AS BIGINT) AS head_luma
        FROM l GROUP BY doc_id ORDER BY doc_id
      """.trim),
      (spark, dir) => {
        // GIF encode+decode is an expensive projection like PNG/WAV:
        // sort via the projected helper so it runs once, not twice
        graft.Sorting.projected(Tables(spark, dir).documents, col("doc_id"))(d =>
          Multimodal.extractVideoFeatures(Multimodal.asGifVideo(d, frameW = 16, frameH = 8), every = 2).toDF())
      },
    ),
    Q(
      "q122_image_phash",
      "Perceptual-hash image dedup ACROSS ENCODINGS: every document " +
        "image plus a contrast-remapped re-encoding of it (decode -> " +
        "px*3/2 clamp -> re-encode through the real PNG codec, variant " +
        "id = doc_id + 1e6); 64-bit dHash (exact cross-multiplied " +
        "gradient signs over decoded pixels) packed into 4x16-bit " +
        "bands; candidate pairs from band equi-joins only (pigeonhole: " +
        "Hamming <= 3 implies a shared band — 100% recall, never an " +
        "images^2 product), exact popcount verify. Every original " +
        "pairs with its re-encoded variant; monotone intensity maps " +
        "are dHash's invariance class, spatial shifts are its " +
        "documented limit (shingle dedup covers those, q26-q28).",
      Some(imagePhashOracleSql),
      (spark, dir) => {
        val media = Multimodal.asPngMedia(Tables(spark, dir).documents, width = 64)
        val corpus = Multimodal.withContrastVariants(media, mulNum = 3, mulDen = 2)
        Multimodal.phashNearDups(Multimodal.imageDHash(corpus).toDF(), maxHamming = 3)
      },
    ),
    Q(
      "q123_audio_vad",
      "Windowed audio activity (VAD front-end): REAL WAV decode, " +
        "160-sample (20 ms @ 8 kHz) frames, per-frame integer energy " +
        "sum(s^2); a frame is active iff mean square > 9800 via exact " +
        "cross-multiplication. Per doc: frame count, active count, " +
        "total/peak energy, silence ratio — the speech pipeline's " +
        "silence-trimming statistics, map-only over the corpus.",
      Some("""
        WITH s AS (SELECT doc_id,
                     list_transform(string_split(text, ''), av_c -> ascii(av_c)) AS smp,
                     strlen(text) AS n
                   FROM documents),
        f AS (SELECT doc_id, n, smp,
                greatest(1, CAST(ceil(n / 160.0) AS BIGINT)) AS n_frames
              FROM s),
        u AS (SELECT doc_id, n, smp, n_frames,
                unnest(generate_series(0, n_frames - 1)) AS fi
              FROM f),
        e AS (SELECT doc_id, n_frames, fi,
                CAST(coalesce(list_sum(list_transform(
                  smp[fi*160 + 1 : least((fi+1)*160, n)], av_x -> av_x * av_x)), 0) AS BIGINT) AS se,
                least((fi+1)*160, n) - fi*160 AS flen
              FROM u),
        g AS (SELECT doc_id, max(n_frames) AS n_frames,
                CAST(sum(CASE WHEN se > 9800 * flen THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
                CAST(sum(se) AS BIGINT) AS total_energy,
                CAST(max(se) AS BIGINT) AS peak_energy
              FROM e GROUP BY doc_id)
        SELECT doc_id, n_frames, n_active, total_energy, peak_energy,
          CAST(n_frames - n_active AS DOUBLE) / CAST(n_frames AS DOUBLE) AS silence_ratio
        FROM g ORDER BY doc_id
      """.trim),
      (spark, dir) => {
        val media = Multimodal.asWavMedia(Tables(spark, dir).documents, sampleRate = 8000)
        Multimodal.extractAudioActivity(media, frameLen = 160, meanSqFloor = 9800L).toDF()
      },
    ),
    Q(
      "q49_sessionize",
      "Gap-based sessionization (30-min inactivity) per user over events: " +
        "lag + running break-count windows, then per-session aggregates — " +
        "the batch twin of the streaming session_window path.",
      Some("""
        WITH e AS (
          SELECT user_id, event_id, ts, value,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events),
        b AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM e),
        s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM b)
        SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
          count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(spark, dir).events
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("brk",
            when(col("prev_us").isNull || (unix_micros(col("ts")) - col("prev_us")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_idx",
            sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_idx")
          .agg(
            min("ts").as("session_start"),
            max("ts").as("session_end"),
            count(lit(1)).as("n_events"),
            Num.dsum(col("value")).as("sum_value"))
      },
    ),
  )

  /** q122's oracle: recompute the padded gray pixels from the source
    * text (Gray8 PNG is lossless — the q61 contract), apply the same
    * clamped px*3/2 intensity map for the variant, derive the 64
    * cross-multiplied dHash gradient bits, pack the same 4×16-bit
    * bands, and mirror the band-equi-join candidate generation +
    * popcount filter. Every integer op mirrors the Scala kernel
    * exactly, so the pair set is hash-identical.
    */
  private def imagePhashOracleSql: String = {
    // chunk i of an m-pixel image: 1-based slice [i*m//64+1 .. (i+1)*m//64]
    def bits(src: String) =
      s"""SELECT img_id,
        list_transform(generate_series(0, 63), ph_i ->
          coalesce(list_sum($src[(ph_i*m)//64 + 1 : ((ph_i+1)*m)//64]), 0)) AS cs,
        list_transform(generate_series(0, 63), ph_i ->
          ((ph_i+1)*m)//64 - (ph_i*m)//64) AS cl"""
    val bandJoin = (0 to 3).map(b =>
      s"SELECT a.img_id AS img_a, b.img_id AS img_b FROM bands a JOIN bands b " +
        s"ON a.b$b = b.b$b AND a.img_id < b.img_id").mkString("\n          UNION\n          ")
    s"""
        WITH src AS (
          SELECT doc_id,
            list_transform(string_split(text, ''), ph_c -> ascii(ph_c)) AS raw,
            strlen(text) AS n,
            greatest(1, CAST(ceil(strlen(text) / 64.0) AS BIGINT)) AS h
          FROM documents),
        pad AS (
          SELECT doc_id, 64*h AS m,
            list_concat(raw, list_transform(generate_series(1, 64*h - n), ph_z -> 0)) AS p
          FROM src),
        imgs AS (
          SELECT doc_id AS img_id, m, p AS px FROM pad
          UNION ALL
          SELECT doc_id + 1000000 AS img_id, m,
            list_transform(p, ph_p -> least(255, greatest(0, (ph_p * 3) // 2))) AS px
          FROM pad),
        ch AS (${bits("px")} FROM imgs),
        bt AS (
          SELECT img_id,
            list_transform(generate_series(0, 63), ph_i ->
              CASE WHEN cs[ph_i+1] * greatest(cl[(ph_i+1) % 64 + 1], 1)
                        > cs[(ph_i+1) % 64 + 1] * greatest(cl[ph_i+1], 1)
                   THEN 1 ELSE 0 END) AS b
          FROM ch),
        bands AS (
          SELECT img_id,
            CAST(list_sum(list_transform(generate_series(0,15), ph_j -> b[ph_j+1]  * (1<<ph_j))) AS BIGINT) AS b0,
            CAST(list_sum(list_transform(generate_series(0,15), ph_j -> b[ph_j+17] * (1<<ph_j))) AS BIGINT) AS b1,
            CAST(list_sum(list_transform(generate_series(0,15), ph_j -> b[ph_j+33] * (1<<ph_j))) AS BIGINT) AS b2,
            CAST(list_sum(list_transform(generate_series(0,15), ph_j -> b[ph_j+49] * (1<<ph_j))) AS BIGINT) AS b3
          FROM bt),
        cand AS (
          $bandJoin),
        hm AS (
          SELECT c.img_a, c.img_b,
            CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                 bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
          FROM cand c
          JOIN bands a ON a.img_id = c.img_a
          JOIN bands b ON b.img_id = c.img_b)
        SELECT img_a, img_b, hamming FROM hm WHERE hamming <= 3 ORDER BY img_a, img_b
    """.trim
  }
}
