#!/bin/bash
# Round-15 A/B adjudication of the BENCH_r14 regression cluster
# (verdict ask #1): three interleaved HEAD-vs-r13(70a6abc) pairs on
# the 12 flagged queries at sf0.1, then two interleaved pairs testing
# the artifact-warmup-phase hypothesis on HEAD alone (the cluster
# benched WITH the stored-artifact queries present — so the warm
# phase runs and builds artifacts at the timed dir before the timed
# loop — vs the cluster benched alone). Dev tool, not shipped.
set -u
cd /root/repo
CLUSTER=text_rare_bigram_rate,dedup_chunk_stats,dedup_source_overlap,domain_mix_resample,sim_mmr_rerank,mm_scene_cuts,stream_blocklist_screen,t9_rollup,mm_decode_png,mm_g711_roundtrip,pipeline_chunks,mm_resize_png
WARMSET=$CLUSTER,sim_rrf_topk_loaded,sim_ivf2_topk_loaded,eval_langid_prf_loaded,text_hard_negatives,text_hybrid_topk,stream_bm25_screen,dedup_incremental
OUT=/root/repo/target/ab_r15
mkdir -p "$OUT"

arm () { # label workdir only
  local label=$1 dir=$2 only=$3
  echo "=== $label $(date +%T) ==="
  (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$only" \
    SPARK_GRAFT_BENCHQ="$OUT/$label.json" \
    sbt -batch "runMain graft.Bench") > "$OUT/$label.log" 2>&1
  echo "rc=$? $label done $(date +%T)"
}

for p in 1 2 3; do
  arm "head_$p" /root/repo "$CLUSTER"
  arm "r13_$p" /root/repo/.abr13 "$CLUSTER"
done
for p in 1 2; do
  arm "warm_$p" /root/repo "$WARMSET"
  arm "plain_$p" /root/repo "$CLUSTER"
done
echo "AB COMPLETE $(date +%T)"
