#!/bin/bash
# Supervised 10M+ scale run: relaunch on crash OR log-stall (the tunneled TPU
# worker is known to wedge mid-build — clients hang in futex wait with no
# error). Every phase checkpoints (scale_10m.py --out-dir + the builder's
# build_checkpoint_dir), so a relaunch resumes at the last finished phase
# instead of hour zero. Kills only the exact child pid, never by pattern.
#
# Usage: N=20000000 OUT=~/.cache/leann_tpu_bench/s20m LOG=/tmp/s20m.log \
#        bash benchmarks/run_scale.sh [extra scale_10m.py args...]
set -u
N=${N:-20000000}
OUT=${OUT:-$HOME/.cache/leann_tpu_bench/s20m}
LOG=${LOG:-/tmp/s20m.log}
STALL_S=${STALL_S:-2400}      # no log growth for 40 min = wedged dispatch
ATTEMPTS=${ATTEMPTS:-6}
RETRY_SLEEP=${RETRY_SLEEP:-300}
POLL_S=${POLL_S:-120}
SCRIPT=${SCRIPT:-benchmarks/scale_10m.py}   # overridable for the unit test
cd "$(dirname "$0")/.."

# Bounded TPU-health gate: a wedged worker makes clients hang in futex wait
# with no error, so a blind relaunch burns ~40 min of host prep + watchdog
# wait per attempt. Probe (tiny matmul + the np.asarray sync) before each
# attempt and poll here — WITHOUT consuming attempts — until the worker
# answers. PROBE=0 disables (CPU-only runs / tests).
PROBE=${PROBE:-1}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-240}
PROBE_SLEEP=${PROBE_SLEEP:-300}
tpu_healthy() {
  timeout "$PROBE_TIMEOUT" python -c "
import jax, numpy as np
x = jax.numpy.ones((256, 256), jax.numpy.bfloat16)
np.asarray(x @ x)
print('tpu ok')" >> "$LOG" 2>&1
}

# Defaults only for flags the caller did NOT pass — relying on argparse
# last-wins for duplicated flags is one parser change away from silently
# building mislabeled tiers (e.g. R=24 graphs in an R=32 tier dir).
DEFAULTS=()
case " $* " in *" --graph-degree "*) ;; *) DEFAULTS+=(--graph-degree 24);; esac
case " $* " in *" --emb-dtype "*)    ;; *) DEFAULTS+=(--emb-dtype f16);;   esac
case " $* " in *" --complexity "*)   ;; *) DEFAULTS+=(--complexity 1024);; esac

for attempt in $(seq 1 "$ATTEMPTS"); do
  if [ "$PROBE" = "1" ]; then
    until tpu_healthy; do
      echo "=== tpu probe failed (wedged?); waiting ${PROBE_SLEEP}s $(date -u +%FT%TZ) ===" >> "$LOG"
      sleep "$PROBE_SLEEP"
    done
  fi
  echo "=== attempt $attempt $(date -u +%FT%TZ) ===" >> "$LOG"
  python -u "$SCRIPT" --n-chunks "$N" --out-dir "$OUT" \
    "${DEFAULTS[@]}" "$@" >> "$LOG" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep "$POLL_S"
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "=== watchdog: log quiet ${age}s, killing $pid ===" >> "$LOG"
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== done rc=0 $(date -u +%FT%TZ) ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $attempt exited rc=$rc; retrying in ${RETRY_SLEEP}s ===" >> "$LOG"
  sleep "$RETRY_SLEEP"
done
echo "=== giving up after $ATTEMPTS attempts ===" >> "$LOG"
exit 1
