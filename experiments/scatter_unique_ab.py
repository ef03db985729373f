"""Attack the 8-robot flat-fleet scatter ceiling (round-4 VERDICT item 4).

The 8-robot full-scale step spends 17.6 of 21.8 ms in `fleet_build_touched`
— ~26 gather/scatter passes over ~12k update rows into the flat [B*C] cell
fields and [B*R] ring rows (experiments/fleet_step_bisect.py).  XLA moves
~55 ns/row/pass: latency-bound random row access, "honest work".  This
experiment measures every candidate lever on the primitive, at the exact
fleet shapes (B=8, C=360k, M=12288 rows):

1. `xla_set`        — the shipped `.at[fid].set(vals, mode='drop')`.
2. `xla_set_sorted` — same scatter, ids pre-sorted (locality for the
                      scatter engine; sort cost measured separately).
3. `xla_set_unique` — ids sorted + deduped with DISTINCT out-of-bounds
                      sentinels, scattered with `unique_indices=True`
                      (lets XLA drop the collision-serialization).
4. `pallas_rowdma`  — the prescribed aliased Pallas kernel: operand lives
                      in HBM, aliased input->output, one K-deep pipelined
                      async-copy per row from a VMEM staging block
                      (`input_output_aliases` + `make_async_copy`).
5. `xla_gather`     — the matching gather (`x[safe]`) for the read half.
6. `fused3_pallas`  — pallas_rowdma writing THREE fields per row per pass
                      (the fusion argument: one index stream, 3 payloads).

Each variant runs standalone (dispatch-pipelined reps) AND inside a
50-step `lax.scan` carry (the deployment context — carry aliasing can
change a lowering completely, as round 3's copy wall proved).

Run on the TPU: python experiments/scatter_unique_ab.py
Writes benchlogs/scatter_unique_ab.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, C, M = 8, 360_000, 12_288  # robots, cells, update rows per step
R = B * C
W = 2  # field row width (cur_sum-like)
PIPE = 8  # DMA pipeline depth
REPS = 30
SCAN_T = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --- the Pallas aliased row-DMA scatter ------------------------------------
def _rowdma_kernel(idx_ref, vals_ref, op_ref, out_ref, sem, *, m, n_fields):
    """Scatter-set m rows: out[idx[i]] = vals[i].  op/out are HBM-aliased;
    dropped rows were pre-mapped to the junk row R (operand padded R+1).
    K-deep pipeline: start DMA i, wait DMA i-PIPE (same descriptor)."""
    def dma(i, f):
        return pltpu.make_async_copy(
            vals_ref[f].at[pl.ds(i, 1)],
            out_ref[f].at[pl.ds(idx_ref[i], 1)],
            sem.at[(i * n_fields + f) % (PIPE * n_fields)],
        )

    def start(i):
        for f in range(n_fields):
            dma(i, f).start()

    def wait(i):
        for f in range(n_fields):
            dma(i, f).wait()

    def body(i, _):
        @pl.when(i < m)
        def _():
            start(i)

        @pl.when(i >= PIPE)
        def _():
            wait(i - PIPE)

        return 0

    jax.lax.fori_loop(0, m + PIPE, body, 0)


def make_pallas_scatter(n_fields, width, n_rows=R):
    shapes = tuple(
        jax.ShapeDtypeStruct((n_rows + 1, width), jnp.float32)
        for _ in range(n_fields)
    )

    @jax.jit
    def scat(idx, vals, ops):
        # inputs: idx (scalar prefetch), then n_fields vals, then n_fields
        # operands; operands aliased to the n_fields outputs.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=(
                # vals stay in HBM: VMEM tiles are (·,128) and a [1,2] VMEM
                # slice is un-DMA-able (Mosaic: "slice shape along dim 1
                # must be aligned to tiling (128)") — narrow rows would
                # force a 64x width padding of every real field, which is
                # itself a cost this kernel idea has to carry.  HBM->HBM
                # row DMA measures the per-descriptor ceiling directly.
                [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
                * (2 * n_fields)
            ),
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            ] * n_fields,
            scratch_shapes=[pltpu.SemaphoreType.DMA((PIPE * n_fields,))],
        )
        kern = functools.partial(_rowdma_kernel, m=M, n_fields=n_fields)

        def kernel(idx_ref, *refs):
            vals_refs = refs[:n_fields]
            op_refs = refs[n_fields:2 * n_fields]
            out_refs = refs[2 * n_fields:3 * n_fields]
            sem = refs[-1]
            kern(idx_ref, vals_refs, op_refs, out_refs, sem)

        return pl.pallas_call(
            kernel,
            out_shape=shapes,
            grid_spec=grid_spec,
            input_output_aliases={
                # arg order after scalar prefetch: vals×F then ops×F; alias
                # op f -> output f.
                1 + n_fields + f: f for f in range(n_fields)
            },
        )(idx, *vals, *ops)

    return scat


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    on_tpu = dev.platform == "tpu"
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    rs = np.random.RandomState(0)
    # Realistic id distribution: per robot, ~200 distinct cells around a
    # pose, each hit by several beams, plus the prev-scan repeat — exactly
    # the concat([ids, prev]) shape of the fleet step.
    per = M // B
    ids = np.empty((B, per), np.int64)
    for b in range(B):
        centers = rs.randint(0, C, 220)
        ids[b] = b * C + centers[rs.randint(0, 220, per)]
    fid = jnp.asarray(ids.reshape(-1), jnp.int32)
    vals = jnp.asarray(rs.randn(M, W).astype(np.float32))
    op = jnp.zeros((R, W), jnp.float32)

    # Sorted / deduped index streams (prep cost measured separately).
    @jax.jit
    def prep_sorted(fid):
        return jnp.sort(fid)

    @jax.jit
    def prep_unique(fid):
        s = jnp.sort(fid)
        first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
        # Distinct out-of-bounds sentinels keep unique_indices=True honest
        # for the dropped rows.
        return jnp.where(first, s, R + jnp.arange(M, dtype=jnp.int32))

    fid_sorted = prep_sorted(fid)
    fid_unique = prep_unique(fid)
    n_real = int(jnp.sum(fid_unique < R))
    log(f"M={M} rows, {n_real} unique real rows after dedup")

    def timed(label, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [fn(*args) for _ in range(REPS)]
        jax.block_until_ready(outs[-1])
        dt = (time.time() - t0) / REPS
        log(f"{label:18s}: {dt*1e3:8.3f} ms ({dt/M*1e9:7.1f} ns/row)")
        return dt

    results = {}

    @jax.jit
    def xla_set(op, fid, vals):
        return op.at[fid].set(vals, mode="drop")

    @jax.jit
    def xla_set_unique(op, fid, vals):
        return op.at[fid].set(vals, mode="drop", unique_indices=True)

    @jax.jit
    def xla_gather(op, fid):
        return op[jnp.where(fid < R, fid, 0)]

    results["xla_set"] = timed("xla_set", xla_set, op, fid, vals)
    results["xla_set_sorted"] = timed(
        "xla_set_sorted", xla_set, op, fid_sorted, vals)
    results["xla_set_unique"] = timed(
        "xla_set_unique", xla_set_unique, op, fid_unique, vals)
    results["prep_unique"] = timed("prep_unique", prep_unique, fid)
    results["xla_gather"] = timed("xla_gather", xla_gather, op, fid)

    if on_tpu:
        # FINDING (both attempts committed in git history): Mosaic REJECTS
        # any slice narrower than the 128-lane tile — "Slice shape along
        # dimension 1 must be aligned to tiling (128), but is 2" — in VMEM
        # *and* HBM memory spaces.  Per-row DMA of the map's real field
        # rows (2-6 f32) is therefore impossible in this toolchain; the
        # aliased row-DMA kernel could only ever operate on a repacked
        # [rows, 128] state layout (512 B/cell — 6x the real state bytes,
        # and scatter-ADD semantics for add_points still need in-kernel
        # read-modify-write serialization).  Measure that one permitted
        # shape so the verdict carries the full cost model:
        C1 = C  # single-map-sized operand keeps the packed array at 184 MB
        op128 = jnp.zeros((C1 + 1, 128), jnp.float32)
        vals128 = jnp.asarray(rs.randn(M, 128).astype(np.float32))
        fid1 = jnp.asarray(ids.reshape(-1) % C1, jnp.int32)
        pallas1 = make_pallas_scatter(1, 128, n_rows=C1)
        results["pallas_rowdma_w128"] = timed(
            "pallas_rowdma_w128", lambda i, v, o: pallas1(i, (v,), (o,)),
            fid1, vals128, op128)
        got = np.asarray(pallas1(fid1, (vals128,), (op128,))[0])
        want = np.asarray(
            jnp.zeros((C1 + 1, 128), jnp.float32).at[fid1].set(vals128)
        )
        ok = np.array_equal(got, want)
        log(f"pallas w128 scatter correctness vs xla: {ok}")
        results["pallas_w128_correct"] = bool(ok)

        @jax.jit
        def xla_set128(op, fid, vals):
            return op.at[fid].set(vals, mode="drop")

        results["xla_set_w128"] = timed(
            "xla_set_w128", xla_set128, op128, fid1, vals128)
        results["pallas_narrow_rows"] = (
            "REJECTED by Mosaic: slice dim 1 must be 128-aligned (real "
            "field rows are 2-6 f32; VMEM and HBM both)"
        )

    # --- in-scan-carry context (the deployment shape) ---------------------
    def scan_ctx(scatter):
        @jax.jit
        def run(op, fid, vals):
            def step(o, _):
                return scatter(o, fid, vals), 0
            o, _ = jax.lax.scan(step, op, None, length=SCAN_T)
            return o
        return run

    for label, fn, f in (("scan_xla_set", xla_set, fid),
                         ("scan_xla_unique", xla_set_unique, fid_unique)):
        run = scan_ctx(fn)
        out = run(op, f, vals)
        jax.block_until_ready(out)
        t0 = time.time()
        out = run(op, f, vals)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / SCAN_T
        log(f"{label:18s}: {dt*1e3:8.3f} ms/step in scan carry")
        results[label] = dt

    def fmt(v):
        return round(v * 1e3, 4) if isinstance(v, float) else v

    out_path = os.path.join(ROOT, "benchlogs", "scatter_unique_ab.json")
    with open(out_path, "w") as fh:
        json.dump({k: fmt(v) for k, v in results.items()}, fh, indent=1)
    print(json.dumps({"done": True,
                      "ms": {k: fmt(v) for k, v in results.items()}}))


if __name__ == "__main__":
    main()


# --- CODA: the dense-window build reformulation, costed with this file's
# measurements and NOT built (round 5).  The idea: dynamic-slice a P=128
# cell window around each robot's pose, run the build DENSELY on all
# window cells (bit-identical: for untouched cells old_slot == cur by the
# build-after-ingest invariant, so no ring read is needed for them), and
# write the window back — replacing the 22 cell-field gather/scatter
# passes with ~0.2 ms of dense traffic.  It dies on the ring: touched
# cells still need their real old-slot values, so the ring keeps its 6
# row passes AND gains 6 staging passes (scatter old_* into the window,
# gather new slot values back out) — net 31 -> 23 row passes at
# ~0.68 ms/pass ≈ 17-18 ms/step projected vs 21.8 today (~460 scans/s at
# 8 robots), under the >=560 bar that would justify the complexity and
# the window-edge parity risk.  Recorded so the next round doesn't
# re-derive it.
