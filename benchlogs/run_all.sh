#!/bin/sh
# Re-measure every BENCH.md row on the TPU and store raw JSON lines here.
# Each BENCH.md table row's command is one of these `run` lines and its
# committed artifact is benchlogs/<name>.json (PARITY.md cites the same
# names).  Run from anywhere; heavy-compile rows (fast_matmul ~8.5 min,
# multiswarm bf16 ~11 min) are last.  A wedged axon readback is retried by
# bench.py's built-in supervisor (timeout + 2 retries).  bench.py keeps a
# persistent XLA compile cache in ../.jax_cache (NDTPSO_BENCH_NO_CACHE=1
# opts out), so re-runs start warm and rows are schedule-pinned.
set -x
cd "$(dirname "$0")/.."
out=benchlogs
run() { name=$1; shift; python bench.py "$@" >"$out/$name.json" 2>"$out/$name.log"; \
        echo "=== $name rc=$? $(cat $out/$name.json)"; }
# Like run, but with a per-run supervisor timeout (long compiles/programs).
run_t() { t=$1; name=$2; shift 2; \
          NDTPSO_BENCH_TIMEOUT=$t python bench.py "$@" >"$out/$name.json" 2>"$out/$name.log"; \
          echo "=== $name rc=$? $(cat $out/$name.json)"; }

# Config 2 — batched solves (B=256, 4096p x 50i; turbo defaults to ee2,
# the r5 measured knee)
run batch_rollout_turbo_ee2           --config batch --mode rollout_turbo
run batch_rollout_turbo_bf16_ee2      --config batch --mode rollout_turbo_bf16
run batch_rollout_turbo_ee1           --config batch --mode rollout_turbo --early-exit 1
run batch_rollout_turbo_ee3           --config batch --mode rollout_turbo --early-exit 3
run batch_rollout_turbo_ee4           --config batch --mode rollout_turbo --early-exit 4
run batch_rollout_turbo_ee4_sharded1  --config batch --mode rollout_turbo --sharded --devices 1 --early-exit 4
run batch_rollout_turbo_ee6_sharded1  --config batch --mode rollout_turbo --sharded --devices 1 --early-exit 6
run batch_rollout_turbo_bf16_ee4_sharded1 --config batch --mode rollout_turbo_bf16 --sharded --devices 1 --early-exit 4
run batch_rollout_turbo_sharded1      --config batch --mode rollout_turbo --sharded --devices 1 --early-exit 0
run batch_rollout_turbo               --config batch --mode rollout_turbo --early-exit 0
run batch_rollout_turbo_bf16          --config batch --mode rollout_turbo_bf16 --early-exit 0
run batch_rollout                     --config batch --mode rollout
run batch_rollout_bf16                --config batch --mode rollout_bf16

# Config 3 — sequential SLAM (50p x 30i; local_exact default)
run slam                 --config slam
run slam_og              --config slam --og
run slam_rollout_local   --config slam --mode rollout_local
run slam_fullscale       --config slam --full-scale
run slam_fullscale_og    --config slam --full-scale --og
run slam_fullscale_rollout_local       --config slam --full-scale --mode rollout_local
run slam_fullscale_rollout_local_turbo --config slam --full-scale --mode rollout_local_turbo
run slam_8robots         --config slam --robots 8
run slam_8robots_flat    --config slam --robots 8 --fleet-mode flat

# Fleet — flat path (robot axis folded into the cell axis; no copy wall)
run_t 900 slam_fullscale_2robots_flat       --config slam --full-scale --robots 2 --fleet-mode flat
run_t 900 slam_fullscale_2robots_r8192_flat --config slam --full-scale --robots 2 --ring-rows 8192 --fleet-mode flat
run_t 900 slam_fullscale_8robots_r8192_flat --config slam --full-scale --robots 8 --ring-rows 8192 --fleet-mode flat
run_t 900 slam_fullscale_8robots_r8192      --config slam --full-scale --robots 8 --ring-rows 8192
run_t 900 slam_soak2400 --config slam --soak 2400 --og
run_t 900 slam_soak2400_noog --config slam --soak 2400 --reps 2

# Fleet rollout — the flagship kernels driving the 2/8-robot fleets
# (ONE B=robots Pallas call per step, parallel/fleet.py:_align_rollout_fleet)
run_t 900 slam_fullscale_2robots_r8192_flat_rollout_local_turbo \
    --config slam --full-scale --robots 2 --ring-rows 8192 --fleet-mode flat \
    --mode rollout_local_turbo --reps 3
# (Threefry, not turbo: robot 4's turbo draw on this fixed fixture fails
# the accuracy gate — one bad draw, reproduced bitwise solo, see
# benchlogs/fleet_rollout_robot4.json + the BENCH fleet-rollout note.)
run_t 900 slam_fullscale_8robots_r8192_flat_rollout_local \
    --config slam --full-scale --robots 8 --ring-rows 8192 --fleet-mode flat \
    --mode rollout_local --reps 3

# Recovery — kidnapped-robot relocalization event latency (pure defaults:
# grid_beam_stride=0 auto-resolves per map scale)
run recovery             --config recovery
run_t 900 recovery_fullscale --config recovery --full-scale

# Latency — one-scan-in-one-pose-out dispatch distribution (p50/p95 +
# no-op relay floor; the reference's 10 Hz online operating mode)
run latency_fullscale --config latency --full-scale --reps 100
run latency_fullscale_rollout --config latency --full-scale --reps 100 \
    --mode rollout_local_turbo

# Batch early-exit through the LOCAL rollout kernel (forwarding fixed r5).
# 128p: the local kernel's batch niche is reference-budget populations —
# its per-(point,particle) VPU work is off-roofline at 4096p.
run batch_rollout_local_ee4 --config batch --mode rollout_local \
    --early-exit 4 --particles 128 --batch 64

# Fleet recovery escalation + 2-process gloo throughput (standalone
# experiment drivers, own artifacts)
timeout 1200 python experiments/fleet_recovery_latency.py \
    > $out/fleet_recovery_latency.log 2>&1 \
    || echo "fleet_recovery_latency FAILED rc=$?"
timeout 900 python experiments/dist_bench.py \
    > $out/dist_bench.log 2>&1 || echo "dist_bench FAILED rc=$?"

# Config 4 — multi-swarm relocalization (16 x 4096p x 50i; turbo modes
# default to --early-exit 4, the headline operating point)
run multiswarm_rollout_turbo_ee4      --config multiswarm --mode rollout_turbo
run multiswarm_rollout_turbo_bf16_ee4 --config multiswarm --mode rollout_turbo_bf16
run multiswarm_rollout_turbo      --config multiswarm --mode rollout_turbo --early-exit 0
run multiswarm_rollout_turbo_bf16 --config multiswarm --mode rollout_turbo_bf16 --early-exit 0
run multiswarm_fast               --config multiswarm
run multiswarm_fast_matmul        --config multiswarm --mode fast_matmul

# Config 5 — virtual-mesh scaling shape (CPU, not TPU numbers)
for d in 1 2 4 8; do
  run cpumesh_d$d --config batch --mode fast --sharded --devices $d \
      --cpu-mesh 8 --batch 64
done
echo "run_all done"
