"""Why is the 64 m test-scale SLAM loop (165 scans/s) SLOWER than the
300 m/360k-cell full scale (317.5 scans/s)?  Time slam_step's components at
both scales on the chip.  Readback-forced timings (the axon relay's
block_until_ready can return pre-execution).

    python experiments/profile_slam_scales.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, reps=20):
    import jax

    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ndtpso_slam_tpu import config as cfgm
    from ndtpso_slam_tpu.io import synthetic
    from ndtpso_slam_tpu.models import cost as cost_mod, ndt_map, scan as scan_mod, slam
    from ndtpso_slam_tpu.models.pso import pso_solve
    from ndtpso_slam_tpu.ops import rng

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    configs = {
        "test(64m,w8)": cfgm.MapConfig(size_m=64.0, cell_side_m=0.5, window_slots=8),
        "full(300m,w100)": cfgm.MapConfig(size_m=300.0, cell_side_m=0.5,
                                          window_slots=100),
    }
    for name, map_cfg in configs.items():
        cfg = cfgm.SlamConfig(
            pso=cfgm.PSOConfig(iterations=30, population=50),
            map=map_cfg,
            scan=cfgm.ScanConfig(max_beams=384),
            cost_mode="local_exact",
        )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            lg = synthetic.make_log(seed=2, n_scans=31, n_beams=360,
                                    world_size=50.0)
            loaded = [
                scan_mod.load_laser(r, lg.angle_min, lg.angle_increment,
                                    lg.range_max, cfg.scan, cfg.map)
                for r in lg.ranges
            ]
            st = slam.init_slam(cfg, initial_pose=tuple(lg.poses[0]))
            for s, pose in zip(loaded[:30], lg.poses[:30]):
                key = rng.threefry2x32((np.uint32(3), np.uint32(9)),
                                       np.uint32(0), np.uint32(0))
                # build map via public steps on CPU is slow; ingest directly
                from ndtpso_slam_tpu.ops.geometry import transform_points
                w = transform_points(s.points, jnp.asarray(pose, jnp.float32))
                st = st.replace(map=ndt_map.add_points(st.map, map_cfg, w, s.valid))
                st = st.replace(map=ndt_map.build(st.map, map_cfg))
            st = st.replace(
                pose=jnp.asarray(lg.poses[29], jnp.float32),
                align=slam.AlignState(
                    prev_pose=jnp.asarray(lg.poses[29], jnp.float32),
                    pose_diff=jnp.asarray(lg.poses[29] - lg.poses[28], jnp.float32),
                    iter=jnp.asarray(30, jnp.int32),
                ),
                step=jnp.asarray(30, jnp.int32),
            )
            sc = loaded[30]
        st, sc = jax.device_put((st, sc), dev)
        key = (np.uint32(11), np.uint32(13))

        snap_f = jax.jit(partial(ndt_map.snapshot, cfg=map_cfg),
                         static_argnames=("cfg",))
        t_snap = timeit(lambda: snap_f(st.map))
        snap = snap_f(st.map)

        bind_f = jax.jit(lambda g, s_, p, v: cost_mod.bind_neighborhood(
            g, s_, p, v, map_cfg, radius=cost_mod.DEFAULT_STENCIL_RADIUS))
        t_bind = timeit(lambda: bind_f(st.pose, snap, sc.points, sc.valid))
        nbr = bind_f(st.pose, snap, sc.points, sc.valid)

        def solve():
            fn = lambda poses, bind: cost_mod.stencil_exact_cost(
                poses, nbr, sc.points, map_cfg
            )
            return pso_solve(key, st.pose, jnp.float32([0.1, 0.1, 0.05]),
                             fn, cfg.pso).pose
        t_solve = timeit(jax.jit(solve))

        upd_f = jax.jit(lambda m, p, v: ndt_map.add_points(m, map_cfg, p, v))
        t_add = timeit(lambda: upd_f(st.map, sc.points, sc.valid))
        m2 = upd_f(st.map, sc.points, sc.valid)

        ids = jnp.arange(768, dtype=jnp.int32)  # representative touched set
        bt_f = jax.jit(lambda m, i: ndt_map.build_touched(m, map_cfg, i))
        t_bt = timeit(lambda: bt_f(m2, ids))

        t_step = timeit(lambda: slam.slam_step(st, sc, key, cfg))

        print(f"{name}: snapshot {t_snap*1e3:.2f} | bind {t_bind*1e3:.2f} | "
              f"solve {t_solve*1e3:.2f} | add {t_add*1e3:.2f} | "
              f"build_touched {t_bt*1e3:.2f} | full step {t_step*1e3:.2f} ms")


if __name__ == "__main__":
    main()
