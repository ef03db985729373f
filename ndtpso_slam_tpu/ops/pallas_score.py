"""Fused Pallas TPU kernel for the frozen-correspondence PSO scoring step.

The fast cost (`models/cost.py:bound_cost`) is three ops in XLA:
``z = phi @ w.T`` (MXU), ``s = exp(-max(z,0)/2)`` (VPU), ``cost = -s @ mask``
(MXU) — and XLA materializes the ``[B, P, N]`` score matrix in HBM between
them.  At the benchmark operating point (B=64 solves x 4096 particles x 384
points x 50 iterations) that is ~400 MB of HBM round-trip per PSO iteration
— the measured bottleneck (~1.0 ms of the 1.32 ms/iter step time).

This kernel fuses all three into one pass with the score matrix held in VMEM
in the MXU-natural orientation ``z[N, P_tile]``:

    z    = w [N, 16] @ phiT [16, P_tile]          (contraction over features)
    s    = exp(-max(z, 0) / 2)                    (VPU, in VMEM)
    cost = -(mask [1, N] @ s)  ->  [1, P_tile]    (contraction over points)

Both matmuls contract over the canonical lhs-columns/rhs-rows dims, the
point-reduction wastes only the 8-row sublane pad (vs 128x for a
lane-oriented matvec), and HBM sees only the tiny ``phiT``/``w`` inputs and
the ``[P]`` cost row.  Grid = (batch, particle tiles).

Precision: f32 in, f32 accumulate (``preferred_element_type``), matching the
XLA path up to reduction order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Particle tile per grid step: z tile [N, TILE_P] f32; at N=384 that is 3 MB.
TILE_P = 2048
# phi/w feature dim padded from 15 to the sublane-friendly 16.
FDIM = 16


def _score_kernel(w_ref, phit_ref, mask_ref, out_ref):
    # w: [1, N, FDIM]; phiT: [1, FDIM, TILE_P]; mask: [1, 1, N];
    # out: [1, 1, TILE_P]
    z = jnp.dot(
        w_ref[0], phit_ref[0], preferred_element_type=jnp.float32
    )  # [N, TILE_P]
    s = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
    out_ref[0] = -jnp.dot(
        mask_ref[0], s, preferred_element_type=jnp.float32
    )  # [1, TILE_P]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bound_scores(
    phit: jnp.ndarray,  # [B, 15 or 16, P] f32 (features transposed)
    w: jnp.ndarray,  # [B, N, 15 or 16] f32
    mask: jnp.ndarray,  # [B, N] f32
    interpret: bool = False,
) -> jnp.ndarray:  # [B, P] costs
    b, f, p = phit.shape
    n = w.shape[1]
    if f < FDIM:
        phit = jnp.pad(phit, [(0, 0), (0, FDIM - f), (0, 0)])
        w = jnp.pad(w, [(0, 0), (0, 0), (0, FDIM - f)])
    tile = min(TILE_P, p)
    assert p % tile == 0, f"population {p} not divisible by particle tile {tile}"
    out = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b, p // tile),
            in_specs=[
                pl.BlockSpec(
                    (1, n, FDIM), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, FDIM, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * n * FDIM + 2 * b * p * n,
            bytes_accessed=4 * b * (p * FDIM + n * FDIM + n + p),
            transcendentals=b * p * n,
        ),
    )(w, phit, mask[:, None, :])
    return out[:, 0, :]
