#!/bin/bash
# 2->8-core pair at 6M records with DATA-PROPORTIONAL shuffle partitions
# (SPARK_GRAFT_SHUFFLE_PARTITIONS=192 ~= 22GB dedup shuffle / ~115MB per
# task) — the A/B counterpart of the default-partitions pair measured
# earlier today (local[8] 841.3s / local[2] 2058.2s -> eff 0.612).
# Rationale: with the default max(8, cores) = 8 partitions, the 148M-triple
# dedup reduce runs ~2.7GB/task; at local[8] each task's execution-memory
# share is 16g*0.6/8 ~= 1.2GB (heavy spill) while at local[2] it is 4.8GB
# (little spill) — the spill cost lands asymmetrically on the 8-leg and is
# charged to "scaling". Data-proportional sizing is the documented intended
# config for large inputs (session.py); AQE coalesces surplus partitions so
# small stages are unaffected.
set -u
cd "$(dirname "$0")"
LOG=../BENCH/runs/auto_pair_2to8_6m_16g_dp192_$(date -u +%Y%m%d).log
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

log "=== A/B pair: 6M records, shuffle_partitions=192, rounds (8,2) x2 ==="
for round in 1 2; do
  for cores in 8 2; do
    leg "$cores" 6000000 > /dev/null
  done
done
log "=== done ==="
