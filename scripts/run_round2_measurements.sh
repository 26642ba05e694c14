#!/bin/bash
# One-shot TPU measurement queue for the late-round-2 items (NEXT.md 2/6):
# run everything pending in ONE healthy TPU window, smallest jobs first so
# a mid-sequence worker stall loses the least. Never overlaps two TPU
# processes (sequential), never killed by pattern (each step under timeout).
#
# Usage: bash scripts/run_round2_measurements.sh [outdir]
set -u
OUT=${1:-/tmp/round2_meas}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a "$OUT/driver.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc ($(date +%T)) ===" | tee -a "$OUT/driver.log"
  return $rc
}

# 0. health probe: fresh-shape matmul with forced readback
step probe 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time()
x = jnp.ones((733, 519), jnp.float32)
print('probe ok', np.asarray(x @ x.T).shape, f'{time.time()-t0:.1f}s')
" || { echo "TPU unhealthy; aborting" | tee -a "$OUT/driver.log"; exit 1; }

# 1. dragon headline (fast, confirms bench contract before big jobs)
step bench 570 python bench.py

# 2. grid-matcher crossover at 12.5M (NEXT item 6 remaining half)
step match_grid 1200 python scripts/bench_match_grid.py \
  --n 12.5e6 --cs 1000,100000

# 3. blocked slab join S0 sensitivity at 12.5M (forced join)
step slab_s0_12p5 1800 python scripts/diag_slab_s0.py \
  --n 12.5e6 --force --s0 auto,32768,131072,524288

# 4. full gated registration 12.5M (production path, new planner)
step gated_12p5 1200 python scripts/bench_gated_scale.py \
  --sizes 12.5e6 --out "$OUT/gated_12p5.json"

# 4a0. pipelined vs sequential band-ref compaction dispatch
step pipeline_ab_12p5 1200 python scripts/diag_pipeline_ab.py 12.5e6

# 4a. lattice-resolution sensitivity: is finest-fitting cell_div optimal
# now that the slab join made band resolution cheap?
step cell_div_12p5 1800 python scripts/diag_cell_div.py \
  --n 12.5e6 --divs 16,8,4

# 4b. in-loop matcher ref_tile sweep at scale (auto-cap calibration)
step rt_scale 1500 python scripts/diag_rt_scale.py --n 12.5e6,50e6

# 5. the real 50M case: S0 model choice vs one fixed alternative
step slab_s0_50 2400 python scripts/diag_slab_s0.py --n 50e6 --s0 auto,131072

# 6. full gated registration 50M (headline row)
step gated_50 2400 python scripts/bench_gated_scale.py \
  --sizes 50e6 --repeats 1 --out "$OUT/gated_50.json"

# 7. upload-stall A/B (last: leaves the worker in a post-big-job state)
step upload_stall 1800 python scripts/diag_upload_stall.py --n 12.5e6

echo "ALL DONE ($(date +%T))" | tee -a "$OUT/driver.log"
