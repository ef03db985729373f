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
echo "run_extra done"
