#!/bin/bash
# 8->32-core pair at 6M records, data-proportional shuffle partitions (192)
# — retry of the DRAM-ceiling-bounded 8->32 step in a quieter host window
# (2026-08-18 canary 58-70 Mops vs 23-39 on the r4 measurement days). Same
# protocol as the 0.822-scoring 2->8 pair: separate JVMs per leg, warm-up
# excluded, interleaved rounds, min over trials.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/runs/auto_pair_8to32_6m_16g_dp192_$(date -u +%Y%m%d).log
export SPARK_GRAFT_SCALE_TRIALS=1
export SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local
export SPARK_DRIVER_MEMORY=16g
export SPARK_GRAFT_SHUFFLE_PARTITIONS=192

canary() {
  python - <<'EOF'
import time
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 2.0:
    for _ in range(100000): pass
    n += 100000
print(f"canary_mops={n / (time.perf_counter() - t0) / 1e6:.1f}")
EOF
}

log() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

leg() {  # leg <cores> <records>
  log "leg cores=$1 n=$2 start $(canary) $(uptime | sed 's/.*load/load/')"
  OUT=$(timeout 5400 python bench.py --scale-one "$1" "$2" 2>/dev/null | tail -1)
  log "leg cores=$1 n=$2 done $(canary) :: $OUT"
  echo "$OUT"
}

log "=== pair: 6M records, shuffle_partitions=192, rounds (32,8) x2 ==="
for round in 1 2; do
  for cores in 32 8; do
    leg "$cores" 6000000 > /dev/null
  done
done
log "=== done ==="
