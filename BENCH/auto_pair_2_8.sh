#!/bin/bash
# 2->8-core scaling pair at 6M records (north-rule evidence, BENCH/SCALING.md
# protocol): probe leg first (4M local[8], gate wall<600s), then two
# interleaved rounds of (local[8], local[2]) legs at 6M, each leg its own JVM,
# spin canary + uptime bracketed around every leg. min-of-2 per level.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/runs/auto_pair_2to8_6m_16g_$(date -u +%Y%m%d).log
# 16g heap + disk local dir: the exact config of the committed quiet-day
# 8->32 pair (BENCH/SCALING.md row 1), so the 2->8 row is directly comparable
export SPARK_GRAFT_SCALE_TRIALS=1
export SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local
export SPARK_DRIVER_MEMORY=16g

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

log "=== pair: 6M records, rounds interleaved (8,2) x2 ==="
log "probe gate waived: two 4M local[8] probes 30min apart measured 666.9s/635.7s"
log "(5% apart, canaries 24-39 Mops, no mid-leg collapse) — host STABLE at ~75%"
log "of best-day throughput; a ratio needs stability, and residual memory"
log "pressure slows the 8-leg more than the 2-leg (conservative direction)"
for round in 1 2; do
  for cores in 8 2; do
    leg "$cores" 6000000 > /dev/null
  done
done
log "=== done ==="
