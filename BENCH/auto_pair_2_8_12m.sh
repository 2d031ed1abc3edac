#!/bin/bash
# 2->8-core pair at 12M records (60M turns) — extends the efficiency-vs-size
# curve (0.36 @ 0.3M, 0.716 @ 3M, 0.822/0.825 @ 6M) one doubling further.
# Protocol: BENCH/SCALING.md — data-proportional partitions scaled with the
# data (384 at 12M vs 192 at 6M, ~115MB/reduce task), each leg its own JVM,
# one interleaved (8,2) round (a single round is ~1.6h; the 6M pairs carry
# the multi-round evidence), spin canary + uptime bracketed per leg.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/runs/auto_pair_2to8_12m_16g_dp384_$(date -u +%Y%m%d).log
export SPARK_GRAFT_SCALE_TRIALS=1
export SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local
export SPARK_DRIVER_MEMORY=16g
export SPARK_GRAFT_SHUFFLE_PARTITIONS=384

canary() {
  python - <<'PYEOF'
import time
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 2.0:
    for _ in range(100000): pass
    n += 100000
print(f"canary_mops={n / (time.perf_counter() - t0) / 1e6:.1f}")
PYEOF
}

log() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

leg() {  # leg <cores> <records>
  log "leg cores=$1 n=$2 start $(canary) $(uptime | sed 's/.*load/load/')"
  OUT=$(timeout 9000 python bench.py --scale-one "$1" "$2" 2>/dev/null | tail -1)
  log "leg cores=$1 n=$2 done $(canary) :: $OUT"
  echo "$OUT"
}

log "=== pair: 12M records, one interleaved (8,2) round, dp384 ==="
for cores in 8 2; do
  leg "$cores" 12000000 > /dev/null
done
log "=== done ==="
