"""Isolations behind parallel/fleet.py's two scatter-lowering findings.

Run on the TPU: `python experiments/fleet_scatter_ab.py` (repo root on
PYTHONPATH).  Times one lax.scan step over a carried map-sized array under
the update formulations the fleet paths chose between.  Measured on the
v5e (B=2, C=360k, S=100; timings force a real readback per run — through
the axon relay `block_until_ready` alone can return before execution):

  solo [C,S] row scatter          0.60 ms/step   (the known-good solo path)
  flat [B*C,S] + reshape          0.73 ms/step   (reshape does NOT break
  flat [B*C,S] native             0.71 ms/step    in-place carry aliasing)
  batched vmap scatter            1.77 ms/step   (the round-3 copy wall)
  2D (row, slot) scatter, B=2     21.9 ms/step   <-- the second wall
  gather+set same array           0.88 ms/step
  drop-mode sentinel ids          0.85 ms/step

Negative result (round 4): a probe of this family measured each
gather+scatter PASS at ~1.05 ms nearly independent of row width (13
narrow arrays 13.5 ms vs one [B*C, 24] array 2.3 ms), predicting a big
win from packing the 13 per-cell field arrays into wide cells/cur/ring
arrays.  Implemented and measured on the real fleet step, packing LOST:
8-robot sparse 374 -> 253 scans/s, 2-robot dense 580 -> 450 (bitwise
parity held).  The isolated pass cost is evidently not a fixed per-op
overhead at the real step's shapes (wider operands pay more where the
probe said they would not); the unpacked flat layout ships.

Findings feeding the fleet design:
1. An UNBATCHED scatter with flat ids (b*C + id) on a scan carry updates
   in place — folding the robot axis into the cell axis removes the
   batched-scatter copy entirely (run_offline_fleet).
2. A scatter/gather whose SECOND index is per-row (2D indices into
   [rows, S, k]) falls off the fast lowering once the operand passes
   ~0.5M rows: 22 ms/step at [720k, 100] vs 0.78 ms for 1D row form —
   while the identical update at [360k, 100] (B=1) matches the solo
   1.24 ms/step.  fleet_build_touched therefore moves whole ring rows
   (1D ids) and edits the open slot by one-hot inside the row.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, C, S, N, T = 2, 360_000, 100, 768, 50


def timeit(fn, *a):
    out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps / T


def main():
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (T, B, N), 0, C)
    val = jax.random.normal(key, (T, B, N))
    off = jnp.arange(B, dtype=ids.dtype)[:, None] * C

    x1 = jnp.zeros((C, S))

    @jax.jit
    def solo(x, ids, val):
        def step(c, xs):
            i, v = xs
            return c.at[i[0]].add(v[0][:, None]), 0.0

        return jax.lax.scan(step, x, (ids, val))[0]

    xb = jnp.zeros((B, C, S))

    @jax.jit
    def flat_reshape(x, ids, val):
        def step(c, xs):
            i, v = xs
            f = c.reshape(B * C, S)
            f = f.at[(i + off).reshape(-1)].add(v.reshape(-1)[:, None])
            return f.reshape(B, C, S), 0.0

        return jax.lax.scan(step, x, (ids, val))[0]

    @jax.jit
    def batched(x, ids, val):
        def step(c, xs):
            i, v = xs
            return (
                jax.vmap(lambda cc, ii, vv: cc.at[ii].add(vv[:, None]))(c, i, v),
                0.0,
            )

        return jax.lax.scan(step, x, (ids, val))[0]

    @jax.jit
    def scatter_2d(x, ids, val):
        def step(c, xs):
            i, v = xs
            f = c.reshape(B * C, S)
            fi = (i + off).reshape(-1)
            sl = jnp.zeros((B * N,), jnp.int32)
            f = f.at[fi, sl].set(1.0)
            return f.reshape(B, C, S), 0.0

        return jax.lax.scan(step, x, (ids, val))[0]

    for name, fn, x in (
        ("solo [C,S] row scatter", solo, x1),
        ("flat [B*C,S] + reshape", flat_reshape, xb),
        ("batched vmap scatter", batched, xb),
        ("2D (row, slot) scatter", scatter_2d, xb),
    ):
        print(f"{name}: {timeit(fn, x, ids, val)*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
