#!/bin/sh
# Round-5 new rows. Run detached; keep the TPU otherwise idle.
cd "$(dirname "$0")/.."
row() {
    name="$1"; shift
    echo "[r5] $name: $*"
    timeout 1500 python bench.py "$@" > "benchlogs/$name.json" 2> "benchlogs/$name.log" \
        || echo "[r5] $name FAILED rc=$?"
}
row latency_fullscale --config latency --full-scale --reps 100
row recovery_fullscale_auto --config recovery --full-scale
row slam_fullscale_8robots_r8192_flat_rollout_local_turbo \
    --config slam --robots 8 --fleet-mode flat --mode rollout_local_turbo \
    --full-scale --ring-rows 8192 --reps 3
row slam_fullscale_2robots_r8192_flat_rollout_local_turbo \
    --config slam --robots 2 --fleet-mode flat --mode rollout_local_turbo \
    --full-scale --ring-rows 8192 --reps 3
row batch_rollout_local_ee4 --config batch --mode rollout_local --early-exit 4
row latency_fullscale_rollout --config latency --full-scale --reps 100 \
    --mode rollout_local_turbo
echo "[r5] rows complete"
