"""Fleet at deployment scale through the donated-state session pool.

run_offline_batch (vmap-of-scan) pays a full ring-buffer copy per step at
full scale (BENCH.md fleet section: 2 robots / window 100 = 19.9 scans/s
aggregate vs 317.5 solo).  The SlamSessionPool dispatches one batched step
per poll with the states DONATED, which lets XLA reuse the ring buffers in
place across calls — this script measures whether that restores fleet
throughput.

MEASURED RESULT (2026-08-21, v5e): it does NOT — 11.8 scans/s aggregate
(and a 521 s compile).  Donation removes the jit-boundary copy, so the
remaining per-step ring copy must live inside the batched-scatter lowering
itself.  Kept as the negative-result record; the open fix is a
non-copying batched ring update (e.g. a Pallas scatter over the robot
axis).

    python experiments/pool_fleet_fullscale.py [robots]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from ndtpso_slam_tpu import config as cfgm
    from ndtpso_slam_tpu.io import synthetic
    from ndtpso_slam_tpu.models import scan as scan_mod
    from ndtpso_slam_tpu.parallel.sessions import SlamSessionPool

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; robots={b}",
          file=sys.stderr)
    map_cfg = cfgm.MapConfig(size_m=300.0, cell_side_m=0.5, window_slots=100)
    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=30, population=50),
        map=map_cfg,
        scan=cfgm.ScanConfig(max_beams=384),
        cost_mode="local_exact",
    )
    n_scans = 50
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        logs = [
            synthetic.make_log(seed=2 + r, n_scans=n_scans, n_beams=360,
                               world_size=50.0)
            for r in range(b)
        ]
        per_robot = [
            [
                scan_mod.load_laser(rr, lg.angle_min, lg.angle_increment,
                                    lg.range_max, cfg.scan, cfg.map)
                for rr in lg.ranges
            ]
            for lg in logs
        ]
    keys = np.stack(
        [np.full(b, 3, np.uint32), np.arange(9, 9 + b, dtype=np.uint32)], -1
    )
    pool = SlamSessionPool(
        cfg, np.stack([lg.poses[0] for lg in logs]).astype(np.float32), keys
    )

    # Warm up / compile with the first scan of each robot.
    t0 = time.time()
    for r in range(b):
        pool.submit(r, per_robot[r][0])
    pool.poll()
    print(f"compile+first poll {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for i in range(1, n_scans):
        for r in range(b):
            pool.submit(r, per_robot[r][i])
        pool.poll()
    total = time.time() - t0
    done = b * (n_scans - 1)
    rate = done / total
    print(f"{done} scans in {total:.2f}s -> {rate:.1f} scans/s aggregate "
          f"({rate / b:.1f}/robot) over {b} robots at full scale "
          f"(window 100, donated pool steps)")
    # Accuracy sanity on robot 0.
    st0 = pool.session_state(0)
    err = np.hypot(*(np.asarray(st0.pose)[:2] - logs[0].poses[-1][:2]))
    print(f"robot 0 final pose err {err:.3f} m", file=sys.stderr)
    assert err < 0.7


if __name__ == "__main__":
    main()
