#!/usr/bin/env bash
# Stress-bench protocol (r15, verdict #7): the 21-query scaling subset at
# the 10x (sf1) and 100x (sf10) replicas, SAME DAY, reps >= 2, big heap.
#
# Why each knob exists:
#  - -J-Xmx80g: sbt's default 4 GB heap thrashes 60M-row shuffles at sf10
#    (r14 lesson); the box has 128 GB.
#  - reps >= 2 + Bench's discarded warmup: the r14 sf10 numbers were 1-rep
#    single-runs and cost adjudication time (verdict #7).
#  - the sf1 twin on the SAME subset, same day: absolute times drift
#    1.3-1.4x between days on identical code — only the sf10/sf1 ratio is
#    a stable scaling signal.
#
# Replicas (rebuild if /root/testdata changed since):
#   sbt -batch "runMain graft.tools.ScaleData /root/testdata/sf0.1 target/testdata/sf1 10"
#   sbt -J-Xmx80g -batch "runMain graft.tools.ScaleData /root/testdata/sf0.1 target/testdata/sf10 100"
#
# Usage: tools/stress_bench.sh [suffix]   (writes BENCH_STRESS_sf1<suffix>.json
#                                          and BENCH_STRESS_sf10<suffix>.json)
set -euo pipefail
cd "$(dirname "$0")/.."
SUFFIX="${1:-}"
QUERIES="q1_agg,q3_join_agg,q5_multijoin,q_topk,q_median,pg_nodes,pg_edges,pg_jsonl,kg_pagerank,events_window,sessionize_events,dedup_minhash,dedup_ngram_fallback,dedup_embedding,dedup_embedding_inc,ann_lsh,ann_ivf,corpus_hll,text_quality,token_count,pack_sequences"
for sf in sf1 sf10; do
  out="BENCH_STRESS_${sf}${SUFFIX}.json"
  echo "== $sf -> $out"
  # env-prefix form (no line between the continuations and the command —
  # a stray comment there silently drops every assignment); keep ALL
  # three JSON lines (full per-query map, timings_b36, short total)
  SPARK_GRAFT_SF_DIR="target/testdata/$sf" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_REPS="${SPARK_GRAFT_BENCH_REPS:-2}" \
    sbt -J-Xmx80g -batch 'runMain graft.Bench' 2>/dev/null | grep '^{' > "$out"
  head -c 400 "$out"; echo
done
