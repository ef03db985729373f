#!/bin/sh
# Round-3 follow-ups after the patch-default flip and the _relocalize
# one-hot-binder rework.
set -x
cd "$(dirname "$0")/.."
out=benchlogs
run() { name=$1; shift; python bench.py "$@" >"$out/$name.json" 2>"$out/$name.log"; \
        echo "=== $name rc=$? $(cat $out/$name.json)"; }

# Recovery event latency with the MXU-binder refine/polish stages
# (replaces the 320 ms gather-bound measurement).
run recovery --config recovery

# Full-scale OG row with the (now default) full-table roll.
run slam_fullscale_og --config slam --full-scale --og

# Fleet at deployment scale: window 40 + stencil patch (full-table rolls
# x8 robots OOM; the patch is the fleet's HBM knob: 600 KB vs 216 MB per
# robot of transient bind state).
NDTPSO_BENCH_TIMEOUT=900 python bench.py --config slam --full-scale --robots 8 \
    --window-slots 40 --patch-range 30 \
    >"$out/slam_fullscale_8robots_w40.json" 2>"$out/slam_fullscale_8robots_w40.log"
echo "=== slam_fullscale_8robots_w40 rc=$? $(cat $out/slam_fullscale_8robots_w40.json)"
echo "run_extra2 done"
