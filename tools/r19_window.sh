#!/bin/bash
# Round-19 closing measurement window: ONE quiet session, everything
# sequential, floor and numerator interleaved (the r18 protocol, r19: sf1 floor raised to 3 sweeps with per-sweep spreads (verdict #2)).
set -e
cd /root/repo
log() { echo "[window $(date +%H:%M:%S)] $*"; }

SUBSET="q100_lm_train q101_incremental_exact q104_bm25 q105_span_dup q106_rrf_hybrid q108_bm25_build q109_collocations q110_profile q119_ratio_share q121_pagerank q122_image_phash q123_audio_vad q124_semdedup q129_winsorize q130_basket_pairs q131_triangles q132_bfs q134_mad_outliers q138_csv_roundtrip q140_window_zoo q141_incremental_join q142_session_paths q144_streaks q152_fd_check q154_cohort_ltv q158_abc q160_jaccard_prefix q163_scalejoin_flagship q166_sql_topk_join q168_sql_semi_join q170_sql_distinct_agg q172_sql_window_rank q184_pq_adc q188_ivfpq q191_sharded_topk q198_ann_route_indexed q201_mor_feed q208_lsh_auto q217_substring_dedup q218_recursive_sql q224_cosine_auto q225_hidden_partition q226_wap_sql q227_sql_view q228_zorder_prune q229_delete_mode q230_write_distribution q231_mor_upsert_sql q232_rtas q233_widen q234_zorder_write q235_profile_approx q236_zorder_write_mixed q237_column_defaults q26_ngram_jaccard q28_lsh_candidates q33_embedding_neardup q34_ann_lsh q52_cube q55_approx_distinct q58_approx_percentile q60_corpus_curation q63_audio_decode q67_decontaminate q70_dedup_clusters q72_rarity_terms q80_bigram_lm q82_leakage_split q84_gapfill q87_funnel q8_distinct_agg q92_scd2 q93_corpus_export q97_outliers q98_phrase_build q99_lsh_build q238_profile_sql"

log "1/9 fresh Verify at sf0.01 (oracle_sql.json for the 230-query set)"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_final" > /tmp/w_verify.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_final 2>&1 | tail -1

log "2/9 DuckDB floor sweep #1 (5 sweeps) -> ORACLE_TIMES.json"
python3 tools/time_oracle.py /root/testdata/sf0.1 /tmp/verify_final/oracle_sql.json ORACLE_TIMES.json 5 > /tmp/w_floor1.log 2>&1
python3 -c "import json; d=json.load(open('ORACLE_TIMES.json')); print('floor1 total', round(d['total'],2), len(d['queries']))"

log "3/9 Spark bench #1 -> bench_full.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_full.json sbt -batch "runMain graft.Bench" > /tmp/w_bench1.log 2>&1
python3 -c "import json; d=json.load(open('bench_full.json')); print('bench1 total', round(d['value'],2), len(d['queries']), 'failed', d['failed'])"

log "4/9 Spark bench #2 -> bench_full_pair2.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_full_pair2.json sbt -batch "runMain graft.Bench" > /tmp/w_bench2.log 2>&1
python3 -c "import json; d=json.load(open('bench_full_pair2.json')); print('bench2 total', round(d['value'],2), len(d['queries']), 'failed', d['failed'])"

log "5/9 DuckDB floor sweep #2 (drift bound, 3 sweeps) -> /tmp/oracle_post.json"
python3 tools/time_oracle.py /root/testdata/sf0.1 /tmp/verify_final/oracle_sql.json /tmp/oracle_post.json 3 > /tmp/w_floor2.log 2>&1
python3 -c "import json; d=json.load(open('/tmp/oracle_post.json')); print('floor2 total', round(d['total'],2))"

log "6/9 sf0.001 + sf0.01 benches (slope inputs)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf0.001.json sbt -batch "runMain graft.Bench" > /tmp/w_b0001.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf0.01.json sbt -batch "runMain graft.Bench" > /tmp/w_b001.log 2>&1
echo "slope benches done"

log "7/9 sf1 subset bench -> bench_sf1_subset.json"
SPARK_GRAFT_SF_DIR=/root/repo/sfgen/sf1 SPARK_GRAFT_BENCH_OUT=bench_sf1_subset.json sbt -batch "runMain graft.Bench $SUBSET" > /tmp/w_bsf1.log 2>&1
python3 -c "import json; d=json.load(open('bench_sf1_subset.json')); print('sf1 total', round(d['value'],2), len(d['queries']), 'failed', d['failed'])"

log "8/9 sf1 oracle floor (3 sweeps, per-sweep spreads) -> ORACLE_TIMES_SF1.json"
python3 tools/time_oracle.py /root/repo/sfgen/sf1 /tmp/verify_final/oracle_sql.json ORACLE_TIMES_SF1.json 3 $SUBSET > /tmp/w_osf1.log 2>&1
python3 -c "import json; d=json.load(open('ORACLE_TIMES_SF1.json')); print('sf1 floor total', round(d['total'],2), len(d['queries']))"

log "9/9 scale slopes"
python3 tools/scale_slopes.py /tmp/bench_sf0.001.json /tmp/bench_sf0.01.json bench_full.json bench_sf1_subset.json SCALE_SLOPES.json
python3 -c "import json; print(json.load(open('SCALE_SLOPES.json'))['summary'])"
log "window complete"

log "10/10 job-floor A/B: the sub-0.15s cohort with AQE on vs off (decomposition receipt for verdict #3)"
COHORT=$(python3 -c "
import json
d = json.load(open('bench_full.json'))['queries']
print(' '.join(sorted(k for k, v in d.items() if v < 0.15)))")
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=floor_aqe_on.json \
  sbt -batch "runMain graft.Bench $COHORT" > /tmp/w_floor_on.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=floor_aqe_off.json \
  SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.enabled=false" \
  sbt -batch "runMain graft.Bench $COHORT" > /tmp/w_floor_off.log 2>&1
python3 -c "
import json
on = json.load(open('floor_aqe_on.json')); off = json.load(open('floor_aqe_off.json'))
print('floor cohort:', len(on['queries']), 'queries; AQE on', round(on['value'],2), 's / off', round(off['value'],2), 's; failed', on['failed'], off['failed'])"
log "window complete (incl. floor A/B)"
