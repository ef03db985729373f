#!/bin/sh
# Bisect the B=256 bf16 rollout readback wedge (VERDICT r2 item 1).
#
# Known triangulation going in:
#   - batch  rollout_turbo       B=256 f32   : OK   (3143 solves/s, BENCH_r02)
#   - batch  rollout_turbo_bf16  B=256       : WEDGE at first readback, 3/3
#   - multiswarm rollout_turbo_bf16 (B=16)   : OK   (142.8 relocs/s)
# Axes to separate: batch size B, rng_mode (turbo vs threefry), beam count.
# Each run is supervised by bench.py itself (child + timeout); we add no
# retries so a wedge costs one timeout, not three.
set -x
cd "$(dirname "$0")/.."
export NDTPSO_BENCH_TIMEOUT=${NDTPSO_BENCH_TIMEOUT:-420}
export NDTPSO_BENCH_RETRIES=0
out=experiments/bisect_bf16
mkdir -p "$out"
run() { name=$1; shift; echo "=== $name: $*" >&2; \
        python bench.py "$@" >"$out/$name.json" 2>"$out/$name.log"; \
        echo "=== $name rc=$?" >&2; }

run b32_turbo_bf16  --config batch --mode rollout_turbo_bf16 --batch 32
run b64_turbo_bf16  --config batch --mode rollout_turbo_bf16 --batch 64
run b128_turbo_bf16 --config batch --mode rollout_turbo_bf16 --batch 128
run b256_threefry_bf16 --config batch --mode rollout_bf16 --batch 256
run b256_turbo_bf16_again --config batch --mode rollout_turbo_bf16 --batch 256
echo "bisect done" >&2
