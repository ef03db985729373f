"""The scan-synchronous SLAM pipeline: align -> update -> build (-> raster).

Functional counterpart of the per-scan callback `NDTPSONode::scan_matcher_`
(`ndtpso_slam_node.cpp:177-244`) plus `NDTFrame::align`
(`ndtframe.cpp:251-266`):

* the adaptive particle deviation — twice the last inter-scan motion after the
  two cold-start scans (`ndtframe.cpp:253`);
* the first-scan special case — no align, pose := previous pose
  (`ndtpso_slam_node.cpp:188-195`);
* map update with the aligned pose every scan (`ndtpso_slam_node.cpp:198`);
* the reference's *lazy* map build (triggered inside the next solve's cost
  call, `core.cpp:27-28`, racy under OpenMP) becomes an *explicit* build phase
  right after the update — the state seen by the next align is identical, the
  order is deterministic.

`slam_step` is one jittable function; a whole recorded scan log runs as a
`lax.scan` over it (`run_offline`), which is the `scan.launch` workload as a
single XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ndtpso_slam_tpu.config import SlamConfig
from ndtpso_slam_tpu.models import cost as cost_mod
from ndtpso_slam_tpu.models import ndt_map, occupancy
from ndtpso_slam_tpu.models.pso import PsoResult, pso_solve
from ndtpso_slam_tpu.models.scan import Scan
from ndtpso_slam_tpu.ops import rng


class AlignState(struct.PyTreeNode):
    """Per-map alignment bookkeeping (`NDTFrame` members s_iter, s_pose_diff,
    s_prev_pose)."""

    prev_pose: jnp.ndarray  # [3]
    pose_diff: jnp.ndarray  # [3]
    iter: jnp.ndarray  # [] int32


class SlamState(struct.PyTreeNode):
    map: ndt_map.NdtMapState
    align: AlignState
    og: Optional[occupancy.OccupancyGrid]
    pose: jnp.ndarray  # [3] current estimate
    step: jnp.ndarray  # [] int32


def init_slam(cfg: SlamConfig, initial_pose=(0.0, 0.0, 0.0)) -> SlamState:
    dtype = cfg.dtype
    pose = jnp.asarray(initial_pose, dtype)
    return SlamState(
        map=ndt_map.init_map(cfg.map, dtype),
        align=AlignState(
            prev_pose=pose, pose_diff=jnp.zeros(3, dtype), iter=jnp.asarray(0, jnp.int32)
        ),
        og=occupancy.init_og(cfg.map, cfg.og) if cfg.og.enabled else None,
        pose=pose,
        step=jnp.asarray(0, jnp.int32),
    )


SLAM_COST_MODES = (
    "exact", "fast", "fast_local", "local_exact",
    "rollout", "rollout_bf16", "rollout_turbo", "rollout_turbo_bf16",
)


def make_cost_fn(
    snap: ndt_map.MapSnapshot, scan: Scan, cfg: SlamConfig, guess=None
):
    """Batched cost closure for the solver, per the configured cost mode."""
    if cfg.cost_mode == "exact":
        return lambda poses, bind: cost_mod.ndt_cost(
            poses, snap, scan.points, scan.valid, cfg.map
        )
    if cfg.cost_mode == "fast":
        return lambda poses, bind: cost_mod.bound_cost(
            poses, cost_mod.bind_points(bind, snap, scan.points, scan.valid, cfg.map)
        )
    if cfg.cost_mode == "fast_local":
        # Gather-free hot loop: pre-gather each point's cell stencil once at
        # the initial guess, rebind per iteration by offset arithmetic
        # (models/cost.py:bind_points_local).  Valid while the swarm stays
        # within ±radius cells of the guess — the scan-to-scan regime.
        nbr = cost_mod.bind_neighborhood(
            guess, snap, scan.points, scan.valid, cfg.map,
            radius=cost_mod.DEFAULT_STENCIL_RADIUS,
        )
        return lambda poses, bind: cost_mod.bound_cost(
            poses, cost_mod.bind_points_local(bind, nbr, scan.points, cfg.map)
        )
    if cfg.cost_mode == "local_exact":
        # Per-particle stencil rebind: exact correspondences, zero gathers in
        # the loop — the accurate choice at the reference's 0.5 m cell side,
        # where frozen-at-incumbent bindings lose tracking (cost.py:
        # stencil_exact_cost).
        nbr = cost_mod.bind_neighborhood(
            guess, snap, scan.points, scan.valid, cfg.map,
            radius=cost_mod.DEFAULT_STENCIL_RADIUS,
        )
        return lambda poses, bind: cost_mod.stencil_exact_cost(
            poses, nbr, scan.points, cfg.map
        )
    raise ValueError(
        f"unknown cost_mode: {cfg.cost_mode}; expected one of {SLAM_COST_MODES}"
    )


def _align_rollout(key, guess, deviation, snap, scan, cfg: SlamConfig) -> PsoResult:
    """One B=1 solve through the whole-rollout Pallas kernel
    (ops/pallas_rollout.py) — the headline single-solve path, now usable by
    the sequential SLAM loop (the workload the reference actually runs,
    `scan.launch` at 10 Hz)."""
    from ndtpso_slam_tpu.ops.pallas_rollout import pack_rollout_inputs, pso_rollout

    p = cfg.pso.population
    n = scan.points.shape[0]
    if p % 128 != 0 or n % 128 != 0:
        raise ValueError(
            f"rollout cost modes need lane-aligned shapes: population {p} and "
            f"padded beams {n} must be multiples of 128 "
            "(use fast_local for the reference's 50-particle budget)"
        )
    nbr = cost_mod.bind_neighborhood(
        guess, snap, scan.points, scan.valid, cfg.map,
        radius=cost_mod.DEFAULT_STENCIL_RADIUS,
    )
    sten, pts = pack_rollout_inputs(nbr, scan.points)
    keys = jnp.stack(
        [jnp.asarray(key[0], jnp.uint32), jnp.asarray(key[1], jnp.uint32)]
    )[None]
    pose, c = pso_rollout(
        keys, guess[None].astype(jnp.float32),
        jnp.asarray(deviation, jnp.float32)[None],
        sten[None], pts[None], cfg.pso, cfg.map,
        radius=cost_mod.DEFAULT_STENCIL_RADIUS,
        interpret=jax.default_backend() != "tpu",
        score_dtype="bf16" if "bf16" in cfg.cost_mode else "f32",
        rng_mode="native" if "turbo" in cfg.cost_mode else "threefry",
    )
    return PsoResult(pose=pose[0].astype(guess.dtype), cost=c[0])


def align(
    key,
    astate: AlignState,
    snap: ndt_map.MapSnapshot,
    scan: Scan,
    guess: jnp.ndarray,
    cfg: SlamConfig,
) -> Tuple[AlignState, PsoResult]:
    """`NDTFrame::align` (`ndtframe.cpp:251-266`): adaptive deviation + PSO."""
    dtype = guess.dtype
    first_dev = jnp.asarray(cfg.first_deviation, dtype)
    adaptive = jnp.abs(astate.pose_diff * jnp.asarray(cfg.deviation_scale, dtype))
    deviation = jnp.where(astate.iter < 2, first_dev, adaptive)
    if cfg.cost_mode.startswith("rollout"):
        result = _align_rollout(key, guess, deviation, snap, scan, cfg)
    else:
        result = pso_solve(
            key, guess, deviation, make_cost_fn(snap, scan, cfg, guess), cfg.pso
        )
    if cfg.cost_mode != "exact":
        # Fast modes report the cost under the final frozen binding; re-score
        # the winning pose with the exact gather cost (one pose, one gather —
        # negligible) so the per-scan cost is always the true NDT objective.
        exact = cost_mod.ndt_cost(
            result.pose[None, :], snap, scan.points, scan.valid, cfg.map
        )[0]
        result = PsoResult(pose=result.pose, cost=exact)
    new_astate = AlignState(
        prev_pose=result.pose,
        pose_diff=result.pose - astate.prev_pose,
        iter=astate.iter + 1,
    )
    return new_astate, result


@partial(jax.jit, static_argnames=("cfg",))
def slam_step(
    state: SlamState, scan: Scan, key, cfg: SlamConfig
) -> Tuple[SlamState, jnp.ndarray, jnp.ndarray]:
    """One scan-synchronous SLAM step.  Returns (state', pose, cost)."""
    first = state.step == 0
    snap = ndt_map.snapshot(state.map, cfg.map)
    new_astate, result = align(key, state.align, snap, scan, state.pose, cfg)
    # First scan: keep the prior pose and do not advance align bookkeeping
    # (`ndtpso_slam_node.cpp:188-195`; align is still computed for shape
    # uniformity, its result is discarded).
    pose = jnp.where(first, state.pose, result.pose)
    astate = jax.tree_util.tree_map(
        lambda old, new: jnp.where(first, old, new), state.align, new_astate
    )
    from ndtpso_slam_tpu.ops.geometry import cell_index, transform_points

    wpts = transform_points(scan.points, pose)
    new_map = ndt_map.add_points(state.map, cfg.map, wpts, scan.valid)
    new_map = ndt_map.build(new_map, cfg.map)
    og = state.og
    if og is not None:
        # Incremental raster: only parent cells touched by this scan can
        # have changed Gaussians, so refreshing their sub-blocks reproduces
        # the dense og_update exactly (see occupancy.og_update_incremental).
        idx, inb = cell_index(
            wpts, size_m=cfg.map.size_m, cell_side_m=cfg.map.cell_side_m,
            cells_per_side=cfg.map.cells_per_side,
        )
        ids = jnp.where(scan.valid & inb, idx, cfg.map.num_cells)
        og = occupancy.og_update_incremental(og, new_map, cfg.map, cfg.og, ids)
    new_state = SlamState(
        map=new_map, align=astate, og=og, pose=pose, step=state.step + 1
    )
    return new_state, pose, result.cost


@partial(jax.jit, static_argnames=("cfg",))
def run_offline(
    state: SlamState, scans: Scan, base_key, cfg: SlamConfig
) -> Tuple[SlamState, jnp.ndarray, jnp.ndarray]:
    """SLAM over a recorded scan log as one `lax.scan`.

    scans: Scan with leading time axis [T, ...].  base_key: (k0, k1) uint32.
    Returns (final_state, poses [T, 3], costs [T]).
    """

    def step(carry, scan_t):
        state, i = carry
        key = rng.threefry2x32(base_key, jnp.asarray(i, jnp.uint32), jnp.asarray(0, jnp.uint32))
        state, pose, c = slam_step(state, scan_t, key, cfg)
        return (state, i + 1), (pose, c)

    (state, _), (poses, costs) = jax.lax.scan(step, (state, 0), scans)
    return state, poses, costs
