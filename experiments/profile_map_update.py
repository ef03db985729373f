"""Profile the map-update path at reference scale (SURVEY §7 "scatter-add
throughput", VERDICT r1 item 7).

Question: inside `slam_step` at the reference's default deployment scale
(300 m frame, 0.5 m cells => 360k cells, 100-slot window,
`/root/reference/launch/scan.launch:10,14-15`, `config.h:8`) with 1024-beam
scans, does the per-scan scatter-add ingestion (`ndt_map.add_points`,
replacing `NDTCell::addPoint`, reference `ndtcell.cpp:21-34`) dominate the
step — and would a sort/segment-sum or Pallas scatter kernel pay off?

Measures, each as its own donated jit at full scale on the real device:
  * add_points alone       (the scatter-add under test)
  * build alone            (dense O(C) window pass + slot ring take/put)
  * snapshot+align alone   (the solve, local_exact at the 30x50 budget)
  * og incremental raster  (occupancy.og_update_incremental)
  * full slam_step         (everything fused in one program)

Run:  python experiments/profile_map_update.py [--beams 1024] [--reps 20]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beams", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--size", type=float, default=300.0)
    ap.add_argument("--cells", type=float, default=0.5)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--og", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ndtpso_slam_tpu import config as cfgm
    from ndtpso_slam_tpu.io import synthetic
    from ndtpso_slam_tpu.models import ndt_map, occupancy, scan as scan_mod, slam
    from ndtpso_slam_tpu.ops.geometry import cell_index, transform_points

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    pad = ((args.beams + 127) // 128) * 128
    map_cfg = cfgm.MapConfig(
        size_m=args.size, cell_side_m=args.cells, window_slots=args.window
    )
    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=30, population=50),
        map=map_cfg,
        scan=cfgm.ScanConfig(max_beams=pad),
        og=cfgm.OccupancyGridConfig(enabled=args.og),
        cost_mode="local_exact",
    )
    c = map_cfg.num_cells
    state_bytes = sum(
        np.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(ndt_map.init_map(map_cfg))
    )
    log(f"C={c} cells, window={args.window} slots, map state "
        f"{state_bytes / 2**20:.0f} MiB, beams={args.beams} (pad {pad})")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        lg = synthetic.make_log(seed=5, n_scans=8, n_beams=args.beams,
                                world_size=min(args.size, 50.0))
        loaded = [
            scan_mod.load_laser(r, lg.angle_min, lg.angle_increment,
                                lg.range_max, cfg.scan, cfg.map)
            for r in lg.ranges
        ]
        st = slam.init_slam(cfg, initial_pose=tuple(lg.poses[0]))
        # Warm the map with a few scans so align/build run on realistic state.
        for s, p in zip(loaded[:4], lg.poses[:4]):
            wp = transform_points(s.points, jnp.asarray(p, jnp.float32))
            st = st.replace(map=ndt_map.add_points(st.map, map_cfg, wp, s.valid))
            st = st.replace(map=ndt_map.build(st.map, map_cfg))
        scan = loaded[4]
        pose = jnp.asarray(lg.poses[4], jnp.float32)
    st, scan, pose = jax.device_put((st, scan, pose), dev)
    key = (np.uint32(1), np.uint32(2))

    def timeit(name, fn, *a, donate=()):
        f = jax.jit(fn, donate_argnums=donate)
        if donate:
            # Donation consumes a[0]; hand the timer its own copy so later
            # timers can still use the original state.
            a = (jax.tree_util.tree_map(jnp.copy, a[0]),) + a[1:]
        out = f(*a)
        jax.block_until_ready(out)  # compile (donates a[0] if donate set)
        if donate:
            # Donation invalidates the input buffer; chain the state through
            # (out must have the same pytree type as a[0], which holds for
            # every donated case here: map->map, og->og, state->state).
            cur = (out,) + a[1:]
            t0 = time.time()
            for _ in range(args.reps):
                res = f(*cur)
                cur = (res,) + a[1:]
            jax.block_until_ready(cur[0])
        else:
            t0 = time.time()
            outs = [f(*a) for _ in range(args.reps)]
            jax.block_until_ready(outs[-1])
        dt = (time.time() - t0) / args.reps * 1e3
        log(f"{name:28s} {dt:8.3f} ms/call")
        return dt

    wpts = transform_points(scan.points, pose)
    idx, inb = cell_index(wpts, size_m=map_cfg.size_m,
                          cell_side_m=map_cfg.cell_side_m,
                          cells_per_side=map_cfg.cells_per_side)
    ids = jnp.where(scan.valid & inb, idx, map_cfg.num_cells)

    t_add = timeit(
        "add_points (scatter-add)",
        lambda m: ndt_map.add_points(m, map_cfg, wpts, scan.valid),
        st.map, donate=(0,),
    )
    t_build = timeit(
        "build (window pass)",
        lambda m: ndt_map.build(m, map_cfg),
        st.map, donate=(0,),
    )
    t_align = timeit(
        "snapshot+align (solve)",
        lambda m: slam.align(
            key, st.align, ndt_map.snapshot(m, map_cfg), scan, pose, cfg
        )[1].pose,
        st.map,
    )
    if args.og:
        og0 = occupancy.init_og(map_cfg, cfg.og)
        snap = ndt_map.snapshot(st.map, map_cfg)
        t_og = timeit(
            "og incremental raster",
            lambda og: occupancy.og_update_incremental(
                og, st.map, map_cfg, cfg.og, ids
            ),
            og0, donate=(0,),
        )
    t_step = timeit(
        "slam_step (fused)",
        lambda s: slam.slam_step(s, scan, key, cfg)[0],
        st, donate=(0,),
    )
    log(f"share of fused step attributable to map update "
        f"(add+build, upper bound): {(t_add + t_build) / t_step * 100:.1f}%")


if __name__ == "__main__":
    main()
