#!/bin/bash
# Fresh-machine cache chain: rebuild every bench tier SERIALLY on the one
# tunneled TPU (parallel launches contend for the single host core and the
# chip). Each step is resumable (phase checkpoints / out-dir persistence),
# so re-running this script continues where the last run stopped.
#
#   bash benchmarks/warm_chain.sh >> /tmp/chain.log 2>&1 &
#
# Order = bench-priority: 100K headline tier, DPR 2.1M tier, 10M waypoint
# (R=32 — the recall lever measured at DPR scale), then the 20M waypoint
# (VERDICT r2 item #1). The 20M run spans hours and is expected to resume
# across driver rounds.
set -u
cd "$(dirname "$0")/.."
B=$HOME/.cache/leann_tpu_bench

echo "=== chain start $(date -u +%FT%TZ) ==="

echo "--- step 1: 100K tier ---"
python -c "import sys; sys.path[:0]=['.','benchmarks']; \
  from bench import ensure_tier2; ensure_tier2()" \
  && touch /tmp/chain_tier2_done

echo "--- step 2: DPR 2.1M tier (R=32, f32 host matrix) $(date -u +%FT%TZ) ---"
N=2100000 OUT=$B/dpr21m_r32 LOG=/tmp/warm_dpr.log STALL_S=1200 \
  bash benchmarks/run_scale.sh --graph-degree 32 --emb-dtype f32 \
  && touch /tmp/chain_dpr_done

echo "--- step 3: 10M tier (R=32, f16) $(date -u +%FT%TZ) ---"
N=10000000 OUT=$B/s10m LOG=/tmp/s10m.log \
  bash benchmarks/run_scale.sh --graph-degree 32 \
  && touch /tmp/chain_s10m_done

echo "--- step 3b: 10M R=48 re-prune (reuses step 3's ckpt_knn; the bench
headline variant — question recall 0.9844 @ 24 ms/q vs 0.9167 at R=32) ---"
N=10000000 OUT=$B/s10m LOG=/tmp/r48.log \
  LEANN_KNN_CANDIDATES=64 \
  bash benchmarks/run_scale.sh --graph-degree 48 --prefix big10m_r48.leann \
  && touch /tmp/chain_s10m_r48_done

echo "--- step 4: 20M waypoint (R=24, f16) $(date -u +%FT%TZ) ---"
N=20000000 OUT=$B/s20m LOG=/tmp/s20m.log \
  bash benchmarks/run_scale.sh \
  && touch /tmp/chain_s20m_done

echo "=== chain end $(date -u +%FT%TZ) ==="
