#!/bin/sh
# Round-3 extras: the reference's 50-particle budget through the rollout
# kernel in the sequential SLAM loop (VERDICT r2 item 3's bench leg) —
# compare against the local_exact default measured by run_all.sh.
set -x
cd "$(dirname "$0")/.."
out=benchlogs
run() { name=$1; shift; python bench.py "$@" >"$out/$name.json" 2>"$out/$name.log"; \
        echo "=== $name rc=$? $(cat $out/$name.json)"; }

run slam_rollout_turbo --config slam --mode rollout_turbo
run slam_rollout       --config slam --mode rollout
# Recovery re-measure with forced readbacks (block_until_ready through the
# axon relay returned before execution; see bench.py:timed).
run recovery           --config recovery
# A/B the full-scale stencil patch (r2's 317.6 was measured pre-patch;
# this round's patched run measured 142.5 — find the regression).
run slam_fullscale_nopatch --config slam --full-scale --patch-range 0
# Fleet at deployment scale: window 100 x 8 robots OOMs (17.86G > 15.75G
# HBM, measured — benchlogs/slam_fullscale_8robots.log); window 40 is the
# documented trade-off row (forgetting horizon vs HBM).
NDTPSO_BENCH_TIMEOUT=900 python bench.py --config slam --full-scale --robots 8 --window-slots 40 \
    >"$out/slam_fullscale_8robots_w40.json" 2>"$out/slam_fullscale_8robots_w40.log"
echo "=== slam_fullscale_8robots_w40 rc=$? $(cat $out/slam_fullscale_8robots_w40.json)"
NDTPSO_BENCH_TIMEOUT=900 python bench.py --config slam --soak 2400 --og \
    >"$out/slam_soak2400.json" 2>"$out/slam_soak2400.log"
echo "=== slam_soak2400 rc=$? $(cat $out/slam_soak2400.json)"
python experiments/tpu_bitwise_fleet.py \
    >"$out/tpu_bitwise_fleet.txt" 2>"$out/tpu_bitwise_fleet.log"
echo "=== tpu_bitwise_fleet rc=$? $(cat $out/tpu_bitwise_fleet.txt | tail -1)"
echo "run_extra done"
