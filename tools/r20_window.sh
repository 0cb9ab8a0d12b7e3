#!/bin/bash
# Round-20 closing measurement window: ONE quiet session, everything
# sequential, floor and numerator interleaved (the r18/r19 protocol,
# trimmed for the optimization round's clock):
#  - the fresh Verify's oracle_sql.json comes from the /verify run made
#    minutes earlier at the SAME HEAD (231/231 pass recorded in
#    OPTIMIZATION_r20.md) instead of a second identical run;
#  - the sf1 DuckDB floor is NOT re-swept: no oracle SQL changed this
#    round, so ORACLE_TIMES_SF1.json (r19, 3-sweep spreads) remains the
#    floor — this window's box runs ~1.1x SLOWER than r19's (see the
#    sf0.1 floor pair below), so sf1 ratios quoted against the r19
#    floor are upper bounds for this window;
#  - the AQE job-floor A/B is carried from r19 (floor_aqe_on/off.json —
#    nothing in this round touches the sub-0.15s cohort's plans).
set -e
cd /root/repo
log() { echo "[window $(date +%H:%M:%S)] $*"; }

SUBSET="q100_lm_train q101_incremental_exact q104_bm25 q105_span_dup q106_rrf_hybrid q108_bm25_build q109_collocations q110_profile q119_ratio_share q121_pagerank q122_image_phash q123_audio_vad q124_semdedup q129_winsorize q130_basket_pairs q131_triangles q132_bfs q134_mad_outliers q138_csv_roundtrip q140_window_zoo q141_incremental_join q142_session_paths q144_streaks q152_fd_check q154_cohort_ltv q158_abc q160_jaccard_prefix q163_scalejoin_flagship q166_sql_topk_join q168_sql_semi_join q170_sql_distinct_agg q172_sql_window_rank q184_pq_adc q188_ivfpq q191_sharded_topk q198_ann_route_indexed q201_mor_feed q208_lsh_auto q217_substring_dedup q218_recursive_sql q224_cosine_auto q225_hidden_partition q226_wap_sql q227_sql_view q228_zorder_prune q229_delete_mode q230_write_distribution q231_mor_upsert_sql q232_rtas q233_widen q234_zorder_write q235_profile_approx q236_zorder_write_mixed q237_column_defaults q26_ngram_jaccard q28_lsh_candidates q33_embedding_neardup q34_ann_lsh q52_cube q55_approx_distinct q58_approx_percentile q60_corpus_curation q63_audio_decode q67_decontaminate q70_dedup_clusters q72_rarity_terms q80_bigram_lm q82_leakage_split q84_gapfill q87_funnel q8_distinct_agg q92_scd2 q93_corpus_export q97_outliers q98_phrase_build q99_lsh_build q238_profile_sql"

log "1/7 DuckDB floor sweep #1 (5 sweeps) -> ORACLE_TIMES.json (oracle_sql from the same-HEAD /verify run)"
test -f /tmp/verify_out2/oracle_sql.json
python3 tools/time_oracle.py /root/testdata/sf0.1 /tmp/verify_out2/oracle_sql.json ORACLE_TIMES.json 5 > /tmp/w_floor1.log 2>&1
python3 -c "import json; d=json.load(open('ORACLE_TIMES.json')); print('floor1 total', round(d['total'],2), len(d['queries']))"

log "2/7 Spark bench #1 -> bench_full.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_full.json sbt -batch "runMain graft.Bench" > /tmp/w_bench1.log 2>&1
python3 -c "import json; d=json.load(open('bench_full.json')); print('bench1 total', round(d['value'],2), len(d['queries']), 'failed', d['failed'])"

log "3/7 Spark bench #2 -> bench_full_pair2.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_full_pair2.json sbt -batch "runMain graft.Bench" > /tmp/w_bench2.log 2>&1
python3 -c "import json; d=json.load(open('bench_full_pair2.json')); print('bench2 total', round(d['value'],2), len(d['queries']), 'failed', d['failed'])"

log "4/7 DuckDB floor sweep #2 (drift bound, 3 sweeps) -> /tmp/oracle_post.json"
python3 tools/time_oracle.py /root/testdata/sf0.1 /tmp/verify_out2/oracle_sql.json /tmp/oracle_post.json 3 > /tmp/w_floor2.log 2>&1
python3 -c "import json; d=json.load(open('/tmp/oracle_post.json')); print('floor2 total', round(d['total'],2))"

log "5/7 sf0.001 + sf0.01 benches (slope inputs)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf0.001.json sbt -batch "runMain graft.Bench" > /tmp/w_b0001.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf0.01.json sbt -batch "runMain graft.Bench" > /tmp/w_b001.log 2>&1
echo "slope benches done"

log "6/7 sf1 subset bench -> bench_sf1_subset.json (floor carried from r19 — box 1.1x slower, ratios conservative)"
SPARK_GRAFT_SF_DIR=/root/repo/sfgen/sf1 SPARK_GRAFT_BENCH_OUT=bench_sf1_subset.json sbt -batch "runMain graft.Bench $SUBSET" > /tmp/w_bsf1.log 2>&1
python3 -c "import json; d=json.load(open('bench_sf1_subset.json')); print('sf1 total', round(d['value'],2), len(d['queries']), 'failed', d['failed'])"

log "7/7 scale slopes"
python3 tools/scale_slopes.py /tmp/bench_sf0.001.json /tmp/bench_sf0.01.json bench_full.json bench_sf1_subset.json SCALE_SLOPES.json
python3 -c "import json; print(json.load(open('SCALE_SLOPES.json'))['summary'])"
log "window complete"
