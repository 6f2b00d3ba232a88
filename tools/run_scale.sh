#!/usr/bin/env bash
# The r17 SCALE PROTOCOL, as one reproducible script — partition-honest
# shuffle (4/16/64 at 1x/10x/100x: a fixed partition count at 100x data
# manufactures spill superlinearity no production config sees; at 100 TB
# partitions track the cluster — ADJUDICATIONS r16/r17), plus the
# fixed-4 continuity control key.
#
# Usage: tools/run_scale.sh {gen|base|10x|100x}
#   gen  — regenerate bigdata/sf1 (10 copies) and bigdata/sf10 (100
#          copies; dir name historical) from /root/testdata/sf0.1
#   base — sf0.1 run of the union battery at SHUFFLE=4  -> /tmp/bench_sf01.json
#   10x  — bigdata/sf1 run at SHUFFLE=16                -> /tmp/bench_sf1.json
#   100x — bigdata/sf10 run at SHUFFLE=64 + control     -> /tmp/bench_sf10.json
# then assemble:
#   python3 tools/scale_report.py /tmp/bench_sf01.json /tmp/bench_sf1.json  10  BENCH10X_rN.json  PLANS_r{N-1}.json target/plans
#   python3 tools/scale_report.py /tmp/bench_sf01.json /tmp/bench_sf10.json 100 BENCH100X_rN.json PLANS_r{N-1}.json target/plans
# (snapshot target/plans between runs — each bench overwrites it; and
# graft.Bench overwrites BENCHFULL_latest.json: this script saves/restores it.)
set -euo pipefail
cd "$(dirname "$0")/.."

# union battery (10x keys ∪ 100x keys, r17): stage pseudo-keys last
KEYS_BASE="corpus_dup_sources corpus_overlap corpus_overlap_incr decontam_bloom decontam_runs decontam_runs_idx decontam_scrub_idx decontam_semantic dedup_best_keep dedup_clusters dedup_clusters_incr dedup_containment dedup_containment_idx dedup_containment_incr dedup_embed_cosine dedup_exact dedup_incremental dedup_lines dedup_minhash_lsh dedup_ngram_jaccard dedup_semantic dedup_semantic_incr dedup_simhash dedup_soft dedup_sorted_neighborhood dedup_span_keepfirst_idx dedup_spans doc_pack doc_shuffle emb_kmeans_int ev_asof ev_cumsum ev_first_last ev_funnel ev_retention ev_session ev_topk_per_user ev_window_sliding knn_brute knn_filtered knn_ivf_int knn_ivfadc_filtered knn_ivfadc_int knn_pq_int knn_self_topk mix_novelty pipeline_audit pipeline_audit_full pipeline_curate_full pipeline_curate_neardup pipeline_curate_scrub q18_bigorders q1_agg q21_waiting q2_join5 retrieve_rrf split_leakage text_bm25 text_decontam text_ngram_freq text_tokens"
KEYS_10X="$KEYS_BASE"
KEYS_100X="corpus_overlap decontam_bloom decontam_runs decontam_scrub_idx dedup_clusters dedup_clusters_incr dedup_containment_incr dedup_embed_cosine dedup_exact dedup_lines dedup_minhash_lsh dedup_ngram_jaccard dedup_semantic dedup_semantic_incr dedup_simhash dedup_sorted_neighborhood dedup_spans doc_pack doc_shuffle emb_kmeans_int ev_asof ev_cumsum ev_first_last ev_funnel ev_retention ev_session ev_topk_per_user ev_window_sliding knn_brute knn_filtered knn_ivf_int knn_pq_int knn_self_topk mix_novelty pipeline_audit pipeline_curate_full pipeline_curate_neardup pipeline_curate_scrub q18_bigorders q1_agg q21_waiting q2_join5 retrieve_rrf split_leakage text_bm25 text_decontam text_ngram_freq text_tokens"

# Bench OVERWRITES the committed BENCHFULL_latest.json baseline on every
# run: protect it for the WHOLE script, restored even on failure/Ctrl-C
# (without the trap, an abort between Bench's overwrite and the restore
# leaves scale numbers in the cross-round baseline).
cp BENCHFULL_latest.json /tmp/BENCHFULL_protect.json
trap 'cp /tmp/BENCHFULL_protect.json BENCHFULL_latest.json' EXIT

run_bench() { # sfdir shuffle outfile keys...
  local sfdir="$1" shuffle="$2" out="$3"; shift 3
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_PASSES=2 SPARK_GRAFT_SLOW_RERUN=0 \
    SPARK_GRAFT_SHUFFLE="$shuffle" \
    sbt -batch "runMain graft.Bench $* pipeline ann index" | tail -2
  cp target/bench.json "$out"
  echo "wrote $out (plans in target/plans — snapshot before the next run)"
}

case "${1:-}" in
  gen)
    SPARK_GRAFT_COPIES=10  sbt -batch "runMain graft.tools.Gen10x /root/testdata/sf0.1 bigdata/sf1"  | tail -1
    SPARK_GRAFT_COPIES=100 sbt -batch "runMain graft.tools.Gen10x /root/testdata/sf0.1 bigdata/sf10" | tail -1 ;;
  base) run_bench /root/testdata/sf0.1 4  /tmp/bench_sf01.json $KEYS_BASE ;;
  10x)  run_bench "$PWD/bigdata/sf1"   16 /tmp/bench_sf1.json  $KEYS_10X ;;
  100x)
    run_bench "$PWD/bigdata/sf10" 64 /tmp/bench_sf10.json $KEYS_100X
    # snapshot the 100x plan surface BEFORE the control run — the
    # control's dumpPlans rewrites dedup_clusters.txt under SHUFFLE=4,
    # which would contaminate the plan_diff evidence of the main run
    python3 tools/plan_diff.py --snapshot target/plans /tmp/plans_100x.json
    # fixed-4 continuity control (merge into the artifact's
    # fixed_partition_control field by hand/python; use
    # /tmp/plans_100x.json — NOT target/plans — for the assemble step)
    SPARK_GRAFT_SF_DIR="$PWD/bigdata/sf10" SPARK_GRAFT_PASSES=2 \
      SPARK_GRAFT_SLOW_RERUN=0 SPARK_GRAFT_SHUFFLE=4 \
      sbt -batch "runMain graft.Bench dedup_clusters" | grep metric || true ;;
  *) echo "usage: $0 {gen|base|10x|100x}"; exit 2 ;;
esac
