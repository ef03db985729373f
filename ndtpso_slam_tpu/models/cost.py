"""NDT registration cost: exact gather form and MXU frozen-correspondence form.

The reference cost (`cost_function`, `core.cpp:26-48`) transforms every scan
point by a candidate pose, floor-bins it into the reference map, and subtracts
the cell's unnormalized Gaussian score.  Two TPU formulations live here:

* :func:`ndt_cost` — *exact* semantics: per-pose transform + bin + gather +
  score.  Vectorized over arbitrary leading pose batch dims.  This is the
  parity path against the C++ reference and the truth oracle for the fast
  path.

* :func:`bind_points` / :func:`bound_cost` — the *fast* path.  Once per PSO
  iteration the scan is bound to map cells at a single binding pose (the
  current global best); the per-particle cost then becomes a quadratic form
  in ``u = [cos(dθ)-1, sin(dθ), dt_x, dt_y, 1]`` relative to the binding
  pose:

      d = R(dθ)·g + (R(dθ)-I)·(t₀-μ) + dt   with  g = R₀p + t₀ - μ
      d' Λ d = u' (Bᵀ Λ B) u = ⟨φ(u), w⟩,   φ(u) = 15 monomials of u

  so scoring P particles against N points is one ``[P,15] @ [15,N]`` matmul
  (MXU) followed by ``exp`` and a masked row-sum — no per-particle gathers at
  all.  The ``cos(dθ)-1`` parameterization keeps every B-column O(sensor
  range · dθ) instead of O(range), so float32 loses nothing to cancellation.

  Freezing correspondences for one iteration is the classic NDT/ICP move (the
  cost landscape is re-linearized around the incumbent); near convergence the
  binding is self-consistent and the optimum agrees with the exact cost — the
  parity suite checks this statistically, and `pso` re-scores the final pose
  with the exact cost.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ndtpso_slam_tpu.config import MapConfig
from ndtpso_slam_tpu.models.ndt_map import MapSnapshot
from ndtpso_slam_tpu.ops import gaussian
from ndtpso_slam_tpu.ops.geometry import cell_index, transform_points


def ndt_cost(
    pose: jnp.ndarray,
    snap: MapSnapshot,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: MapConfig,
) -> jnp.ndarray:
    """Exact reference cost (`core.cpp:26-48`).

    pose: [..., 3]; points: [N, 2]; valid: [N].  Returns [...].
    """
    q = transform_points(points, pose)  # [..., N, 2]
    idx, inb = cell_index(
        q, size_m=cfg.size_m, cell_side_m=cfg.cell_side_m,
        cells_per_side=cfg.cells_per_side,
    )
    mean = snap.mean[idx]  # [..., N, 2]
    icov = snap.inv_cov[idx]
    built = snap.built[idx]
    score = gaussian.ndt_score(q - mean, icov, built & inb & valid)
    return -jnp.sum(score, axis=-1)


class BoundScan(struct.PyTreeNode):
    """Scan bound to map cells at a binding pose: per-point quadratic-form
    coefficients ``w`` s.t. d'Λd = φ(u)·w, plus the score mask."""

    bind_pose: jnp.ndarray  # [3]
    w: jnp.ndarray  # [N, 15]
    mask: jnp.ndarray  # [N] float (valid & in-bounds & built at binding)


# Index pairs (a<=b) of the 15 monomials u_a u_b for u in R^5.
_IJ = [(a, b) for a in range(5) for b in range(a, 5)]


def bind_points(
    bind_pose: jnp.ndarray,
    snap: MapSnapshot,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: MapConfig,
) -> BoundScan:
    """Bind each scan point to its map cell at ``bind_pose`` and precompute
    quadratic-form coefficients.  O(N) gathers, once per iteration."""
    dtype = points.dtype
    q0 = transform_points(points, bind_pose)  # [N, 2] = R₀p + t₀
    idx, inb = cell_index(
        q0, size_m=cfg.size_m, cell_side_m=cfg.cell_side_m,
        cells_per_side=cfg.cells_per_side,
    )
    mean = snap.mean[idx]
    icov = snap.inv_cov[idx]  # [N, 3] packed Λ
    mask = (snap.built[idx] & inb & valid).astype(dtype)

    c0 = jnp.cos(bind_pose[2])
    s0 = jnp.sin(bind_pose[2])
    rx = points[:, 0] * c0 - points[:, 1] * s0  # R₀p
    ry = points[:, 0] * s0 + points[:, 1] * c0
    gx = rx + bind_pose[0] - mean[:, 0]  # g = R₀p + t₀ - μ  (residual, small)
    gy = ry + bind_pose[1] - mean[:, 1]

    # d = B u with u = [cosδ-1, sinδ, δtx, δty, 1]:
    #   d_x = (cosδ-1)·rx − sinδ·ry + δtx + gx
    #   d_y = (cosδ-1)·ry + sinδ·rx + δty + gy
    zeros = jnp.zeros_like(gx)
    ones = jnp.ones_like(gx)
    bx = jnp.stack([rx, -ry, ones, zeros, gx], axis=-1)  # [N, 5]
    by = jnp.stack([ry, rx, zeros, ones, gy], axis=-1)

    # M = BᵀΛB with Λ = [[la, lb], [lb, lc]] packed; w_ab = M_ab·(2-δ_ab).
    la, lb, lc = icov[:, 0], icov[:, 1], icov[:, 2]
    lbx = la[:, None] * bx + lb[:, None] * by  # Λ @ B rows, [N, 5]
    lby = lb[:, None] * bx + lc[:, None] * by
    w_cols = []
    for a, b in _IJ:
        m_ab = bx[:, a] * lbx[:, b] + by[:, a] * lby[:, b]
        w_cols.append(m_ab if a == b else 2.0 * m_ab)
    w = jnp.stack(w_cols, axis=-1)  # [N, 15]
    # Mask folded into w: a masked point contributes exp(-0)·0 via the mask
    # vector in bound_cost, but zeroing w too keeps exp() arguments finite
    # even where Λ was inf/nan from degenerate cells.
    w = jnp.where(mask[:, None] > 0, w, 0.0)
    return BoundScan(bind_pose=bind_pose, w=w, mask=mask)


def _phi(u: jnp.ndarray) -> jnp.ndarray:
    """Monomial features u_a·u_b (a<=b): [..., 5] -> [..., 15]."""
    return jnp.stack([u[..., a] * u[..., b] for a, b in _IJ], axis=-1)


def bound_cost(poses: jnp.ndarray, bound: BoundScan) -> jnp.ndarray:
    """Score pose batch against a bound scan: one MXU matmul + exp + matvec.

    poses: [P, 3] absolute poses.  Returns [P] costs.
    """
    dtheta = poses[:, 2] - bound.bind_pose[2]
    u = jnp.stack(
        [
            jnp.cos(dtheta) - 1.0,
            jnp.sin(dtheta),
            poses[:, 0] - bound.bind_pose[0],
            poses[:, 1] - bound.bind_pose[1],
            jnp.ones_like(dtheta),
        ],
        axis=-1,
    )  # [P, 5]
    z = jnp.dot(_phi(u), bound.w.T, preferred_element_type=poses.dtype)  # [P, N]
    # (kept in sync with the fused Pallas path in bound_cost_fused)
    # Clamp at 0: regularized inverses of near-degenerate cells can carry a
    # numerically negative eigenvalue; harmless in the exact cost (the point
    # is inside its cell, |z| tiny) but explosive when a far-flung particle
    # extrapolates the frozen quadratic.  Scores stay in (0, 1].
    score = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
    return -jnp.dot(score, bound.mask, preferred_element_type=poses.dtype)


def pose_features(poses: jnp.ndarray, bind_pose: jnp.ndarray) -> jnp.ndarray:
    """phi(u) monomials for poses relative to a binding pose.

    poses: [..., P, 3]; bind_pose: [..., 3] -> [..., P, 15].
    """
    dtheta = poses[..., 2] - bind_pose[..., None, 2]
    u = jnp.stack(
        [
            jnp.cos(dtheta) - 1.0,
            jnp.sin(dtheta),
            poses[..., 0] - bind_pose[..., None, 0],
            poses[..., 1] - bind_pose[..., None, 1],
            jnp.ones_like(dtheta),
        ],
        axis=-1,
    )
    return _phi(u)


def bound_cost_fused(
    poses: jnp.ndarray,  # [B, P, 3]
    bound: BoundScan,  # batched: bind_pose [B,3], w [B,N,15], mask [B,N]
    interpret: bool = False,
) -> jnp.ndarray:  # [B, P]
    """Batched fast cost through the fused Pallas scoring kernel
    (ops/pallas_score.py): z never touches HBM."""
    from ndtpso_slam_tpu.ops.pallas_score import fused_bound_scores

    phi = pose_features(poses, bound.bind_pose)  # [B, P, 15]
    return fused_bound_scores(phi, bound.w, bound.mask, interpret=interpret)
