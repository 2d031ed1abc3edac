#!/bin/bash
# Second-input-size replication of the 2->8-core north-rule pair: 3M records
# (half the committed 6M row), same protocol — separate JVMs per leg,
# interleaved rounds, canary bracketing, min over rounds. Purpose: show the
# >=0.8 efficiency is not a single-size artifact.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/runs/auto_pair_2to8_3m_$(date -u +%Y%m%d_%H%M).log
export SPARK_GRAFT_SCALE_TRIALS=1
export SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local
export SPARK_DRIVER_MEMORY=16g
# data-proportional shuffle partitions: 6M used 192 => 3M uses 96
export SPARK_GRAFT_SHUFFLE_PARTITIONS=96

canary() {
  python - <<'PY'
import time
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 2.0:
    for _ in range(100000): pass
    n += 100000
print(f"canary_mops={n / (time.perf_counter() - t0) / 1e6:.1f}")
PY
}
log() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }
leg() {
  log "leg cores=$1 n=$2 start $(canary) $(uptime | sed 's/.*load/load/')"
  OUT=$(timeout 5400 python bench.py --scale-one "$1" "$2" 2>/dev/null | tail -1)
  log "leg cores=$1 n=$2 done $(canary) :: $OUT"
}
log "=== pair: 3M records, rounds interleaved (8,2) x2 ==="
for round in 1 2; do
  for cores in 8 2; do
    leg "$cores" 3000000
  done
done
log "=== done ==="
