#!/bin/bash
# Queued real-TPU tasks for the next healthy tunnel window, in risk order:
# novel-kernel compiles FIRST and each in its own bounded subprocess (a
# pathological Mosaic compile can kill the axon relay for the session —
# CLAUDE.md; never retry a hung step, just read the log and move on).
#
#   bash tools/chip_queue.sh [outdir]          # default /tmp/chip_queue
#
# Steps that hang are killed by their timeout; later steps still run, but
# if step 0/1 (probe) hangs the tunnel is dead — STOP, nothing else will
# work.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_queue}
mkdir -p "$OUT"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name (timeout ${to}s) ==="
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log"
  echo "--- $name rc=$rc"
  [ "$rc" = 124 ] && echo "!!! $name TIMED OUT — if this was a compile, do NOT retry it"
  return 0
}

# 0. liveness (fails fast or hangs; 6 min bound)
run probe 360 python -c "import jax; print(jax.devices())"
grep -qi "tpu\|axon" "$OUT/probe.log" || {
  echo "TUNNEL DEAD — aborting queue"; exit 1; }

# 1. Mosaic pathology toys (subprocess-per-variant inside)
run mosaic_probe 1200 python tools/mosaic_probe.py

# 2. shared-softmax compile+time, one variant per subprocess
run shsm_b4_bf16 900 python -c "from bench import bench_breakdown_b4; print(bench_breakdown_b4(only=['full','shared_sm']))"
run shsm_b4_q8   900 python -c "from bench import bench_breakdown_b4; print(bench_breakdown_b4(only=['q8_full','q8_shared_sm','q8_shared_sm128']))"

# 3. the B=8 wave (novel vmem configuration)
run shsm_b8_q8   900 python -c "from bench import bench_batched_decode; print(bench_batched_decode(B=8, impl='fused_step_q8:shsm'))"

# 4. vocoder phase split (XLA only — low risk)
run vocoder_breakdown 1200 python -c "from bench import bench_vocoder_breakdown; print(bench_vocoder_breakdown())"

# 5. full smoke (all production programs incl. 7b/8b/8c)
run tpu_smoke 3600 python tpu_smoke.py --assets /tmp/gsv_assets

# 6. fresh bench artifact
run bench 3600 python bench.py
echo "queue done — logs in $OUT"
