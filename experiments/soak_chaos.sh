#!/bin/sh
# Drives experiments/soak_chaos.py one variant per process (axon wedge
# isolation), 2 attempts each with a 1500 s timeout.  Run DETACHED via
# `setsid sh experiments/soak_chaos.sh &` and keep the TPU otherwise idle.
cd "$(dirname "$0")/.."
for v in xla_base xla_key1 xla_key2 xla_key3 xla_ulp_pos xla_ulp_neg \
         kern_base kern_key1 kern_key2; do
    if [ -f "benchlogs/soak_chaos/$v.json" ]; then
        echo "[soak_chaos] $v already done, skipping"
        continue
    fi
    for attempt in 1 2; do
        echo "[soak_chaos] $v attempt $attempt"
        timeout 1500 python experiments/soak_chaos.py --variant "$v" \
            >> benchlogs/soak_chaos/driver.log 2>&1 && break
        echo "[soak_chaos] $v attempt $attempt failed (rc=$?), cooling 120s"
        sleep 120
    done
done
echo "[soak_chaos] campaign complete"
