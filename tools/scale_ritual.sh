#!/usr/bin/env bash
# sf1 -> sf10 scaling ritual (BASELINE.md "Round-14: sf1 -> sf10 scaling").
# Builds the scaled corpora if absent, then benches the heavy-gate subset
# at both SFs with per-gate wall/cpu/jobs + the host canary. Compare the
# two JSON lines: a gate whose wall ratio is far above ~10x at 10x data
# (after dividing out the canary) has a super-linear plan.
#
#   tools/scale_ritual.sh [gates-csv]
#
# Results land in /tmp/bench_sfscale_{sf1,sf10}.json.
set -euo pipefail
cd "$(dirname "$0")/.."

GATES="${1:-agg_rollup,asof_speculative,corpus_bpe_merges,corpus_dsir_select,corpus_quality_classifier,datalog_mutual,datalog_pull_nested,datalog_pull_opts,datalog_pull_recursive,datalog_timeout,dedup_embedding_lsh,dedup_minhash,dedup_ngram_jaccard,dedup_semantic,dedup_simhash,dedup_stream_filter,graph_pagerank,scan_project,text_boilerplate,text_top_terms,recursive_reach,corpus_fuzzy_decontam,join_equi,filter_range}"

[ -d /tmp/graft-scale-sf1 ] || python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/graft-scale-sf1 10
[ -d /tmp/graft-scale-sf10 ] || python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/graft-scale-sf10 100

for sf in sf1 sf10; do
  echo "=== $sf ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft-scale-$sf SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$GATES" SPARK_GRAFT_BENCH_WARMUP=0 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | head -1 | tee /tmp/bench_sfscale_$sf.json
done
