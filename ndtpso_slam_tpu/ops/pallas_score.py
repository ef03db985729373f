"""Fused Pallas TPU kernel for the frozen-correspondence PSO scoring step.

The fast cost (`models/cost.py:bound_cost`) is three ops in XLA:
``z = phi @ w.T`` (MXU), ``s = exp(-max(z,0)/2)`` (VPU), ``cost = -s @ mask``
(MXU) — and XLA materializes the ``[P, N]`` score matrix ``z`` in HBM
between them.  At the benchmark operating point (B=32 solves x 4096
particles x 384 points x 50 iterations) that is ~20 GB of HBM traffic per
batch, the measured bottleneck.

This kernel fuses all three into one pass: a particle tile's ``z`` lives
only in VMEM, HBM sees just the tiny ``phi`` / ``w`` inputs and the ``[P]``
cost output.  Grid = (batch, particle tiles); the whole per-point
coefficient table ``w`` (N x 16 padded) plus the mask sit in VMEM per grid
step.

Precision: f32 in, f32 accumulate (``preferred_element_type``), matching
the XLA path up to reduction order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Particle tile per grid step. 512x512 f32 z-tile = 1 MB VMEM.
TILE_P = 512
# phi/w feature dim padded from 15 to the sublane-friendly 16.
FDIM = 16


def _score_kernel(phi_ref, w_ref, mask_ref, out_ref):
    # phi: [1, TILE_P, FDIM]; w: [1, N, FDIM]; mask: [1, 1, N];
    # out: [1, 1, TILE_P]
    z = jax.lax.dot_general(
        phi_ref[0],
        w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TILE_P, N]
    s = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
    cost = -jax.lax.dot_general(
        s,
        mask_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TILE_P, 1]
    out_ref[0] = cost.T


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bound_scores(
    phi: jnp.ndarray,  # [B, P, 15 or 16] f32
    w: jnp.ndarray,  # [B, N, 15 or 16] f32
    mask: jnp.ndarray,  # [B, N] f32
    interpret: bool = False,
) -> jnp.ndarray:  # [B, P] costs
    b, p, f = phi.shape
    n = w.shape[1]
    if f < FDIM:
        pad = [(0, 0), (0, 0), (0, FDIM - f)]
        phi = jnp.pad(phi, pad)
        w = jnp.pad(w, pad)
    tile = min(TILE_P, p)
    assert p % tile == 0, f"population {p} not divisible by particle tile {tile}"
    out = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b, p // tile),
            in_specs=[
                pl.BlockSpec(
                    (1, tile, FDIM), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, n, FDIM), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
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
    )(phi, w, mask[:, None, :])
    return out[:, 0, :]
