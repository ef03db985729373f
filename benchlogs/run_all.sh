#!/bin/sh
# Re-measure every BENCH.md row on the TPU and store raw JSON lines here.
# Each row of BENCH.md is one of these commands; run from the repo root.
# Heavy-compile rows (fast_matmul ~8.5 min) are last.
set -x
cd "$(dirname "$0")/.."
out=benchlogs
run() { name=$1; shift; python bench.py "$@" >"$out/$name.json" 2>"$out/$name.log"; }

# Config 2 — batched solves
run batch_rollout_turbo_sharded1 --config batch --mode rollout_turbo --sharded --devices 1
run batch_rollout_turbo          --config batch --mode rollout_turbo
run batch_rollout                --config batch --mode rollout

# Config 3 — sequential SLAM
run slam                 --config slam
run slam_og              --config slam --og
run slam_fullscale       --config slam --full-scale
run slam_fullscale_og    --config slam --full-scale --og

# Config 4 — multi-swarm relocalization
run multiswarm_rollout_turbo --config multiswarm --mode rollout_turbo
run multiswarm_fast          --config multiswarm
run multiswarm_fast_matmul   --config multiswarm --mode fast_matmul

# Config 5 — virtual-mesh scaling shape (CPU, not TPU numbers)
for d in 1 2 4 8; do
  run cpumesh_d$d --config batch --mode fast --sharded --devices $d \
      --cpu-mesh 8 --batch 64
done
