#!/bin/bash
# One-shot on-chip validation + bench gate (round 4 exit gate —
# VERDICT r3 item 5). Logs land in /tmp/tpu_r4/; after a full pass,
# fold the numbers into benchmarks/results_r4.md and commit.
#
# Runs each stage sequentially with its own log under /tmp/tpu_r3/ and
# a generous timeout; a failing stage does not stop later stages.
# Remote Mosaic compiles take 30-120 s per program, so the full pass
# is expected to take ~30-60 min cold (much less with a warm
# JAX_COMPILATION_CACHE_DIR).
#
# Usage:  bash benchmarks/tpu_runall.sh  [stage...]
#   stages: smoke bench paths binning bigmesh bigtex scatbis bisect audit
#           texpipe texk fusion
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOGDIR=${TPU_LOGDIR:-/tmp/tpu_r5}
mkdir -p "$LOGDIR"

want() {  # want <name> [stage...]: true if no stage args given or <name> listed
  [ "$#" -le 1 ] && return 0
  local n="$1"; shift
  for s in "$@"; do [ "$s" = "$n" ] && return 0; done
  return 1
}
ARGS=("$@")

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  if ! want "$name" "${ARGS[@]+"${ARGS[@]}"}"; then return 0; fi
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ==="
  tail -5 "$LOGDIR/$name.log" | sed 's/^/    /'
}

# 1. Per-kernel Mosaic compile/correctness isolation (9 stages inside).
run smoke   3600 python benchmarks/smoke_r3.py
# 2. Headline + textured bench (2 JSON lines).
run bench   1800 python bench.py
# 3. Dense (nc==1) + CSR rasterizer branches at real shapes.
run paths   1800 python benchmarks/smoke_paths.py
# 3b. Binning-prepass stage breakdown (argsort vs layout cost).
run binning 2400 python benchmarks/profile_binning.py
# 3c. _csr_layout tail breakdown (slot map / gather / pack / gaabb).
run csrtail 2400 python benchmarks/profile_csrtail.py
# 4. Big-mesh throughput (CSR segments): 81k / 1M tris.
run bigmesh 2400 python benchmarks/profile_bigmesh.py
# 5. Big-texture fused sampler (HBM windowed gather) incl. earth-scale atlas.
run bigtex  3600 python benchmarks/profile_bigtex.py
# 5b. bwd Mosaic-crash bisection: row-blocked scatter hypothesis
# first (tiny programs), then the big-texture configs.
run scatbis 3600 python benchmarks/bisect_scatter.py
run bisect  3600 python benchmarks/bisect_bigtex.py 8 11 7
# 6. bf16 hi/lo scatter audit + on-chip pipeline FD gradient check.
run audit   2400 python benchmarks/audit_scatter.py
# 7. Textured-pipeline stage profile.
run texpipe 2400 python benchmarks/profile_texpipe.py
# 7b. Texture-sampler axis-scaling micro-profile (which axis costs).
run texk    2400 python benchmarks/profile_texkernel.py
# 8. Headline-pipeline cumulative stage profile (where the 22 ms goes).
run fusion  2400 python benchmarks/profile_fusion.py
# 8b. Pipeline-backward kernel stage ablation (where the bwd ms go).
run bwdk    3600 python benchmarks/profile_bwdkernel.py

echo "=== all logs in $LOGDIR ==="
grep -l "Traceback\|rc=1" "$LOGDIR"/*.log 2>/dev/null || true
