"""Is the vmapped fleet bitwise-identical to solo runs ON TPU? (ADVICE r2)

tests/test_slam.py asserts run_offline_batch == per-robot run_offline
exactly, but the suite runs on CPU; XLA does not promise that vmapped and
unbatched programs round floats identically on another backend.  This
script runs the same comparison on the real chip and prints the verdict —
BENCH.md's fleet-mode wording cites the result.

    python experiments/tpu_bitwise_fleet.py
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
    from ndtpso_slam_tpu.models import scan as scan_mod, slam

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=30, population=50),
        map=cfgm.MapConfig(size_m=64.0, cell_side_m=0.5, window_slots=8),
        scan=cfgm.ScanConfig(max_beams=384),
        cost_mode="local_exact",
    )
    b, n_scans = 2, 20
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        logs = [
            synthetic.make_log(seed=2 + r, n_scans=n_scans, n_beams=360,
                               world_size=50.0)
            for r in range(b)
        ]

        def load(lg):
            loaded = [
                scan_mod.load_laser(r, lg.angle_min, lg.angle_increment,
                                    lg.range_max, cfg.scan, cfg.map)
                for r in lg.ranges
            ]
            return scan_mod.Scan(
                points=jnp.stack([s.points for s in loaded]),
                valid=jnp.stack([s.valid for s in loaded]),
            )

        per_robot = [load(lg) for lg in logs]
        batch_scans = scan_mod.Scan(
            points=jnp.stack([s.points for s in per_robot]),
            valid=jnp.stack([s.valid for s in per_robot]),
        )
        states = slam.init_slam_batch(
            cfg, np.stack([lg.poses[0] for lg in logs]).astype(np.float32)
        )
    keys = np.stack([[3, 9], [3, 10]]).astype(np.uint32)
    batch_scans, states = jax.device_put((batch_scans, states), dev)
    t0 = time.time()
    _, bposes, bcosts = slam.run_offline_batch(states, batch_scans, keys, cfg)
    bposes = np.asarray(bposes)
    bcosts = np.asarray(bcosts)
    print(f"batch run {time.time()-t0:.1f}s", file=sys.stderr)

    exact = True
    for r in range(b):
        with jax.default_device(cpu):
            st = slam.init_slam(cfg, initial_pose=tuple(logs[r].poses[0]))
        st, sc = jax.device_put((st, per_robot[r]), dev)
        _, sposes, scosts = slam.run_offline(
            st, sc, (np.uint32(keys[r, 0]), np.uint32(keys[r, 1])), cfg
        )
        sposes = np.asarray(sposes)
        dp = np.abs(sposes - bposes[r]).max()
        dc = np.abs(np.asarray(scosts) - bcosts[r]).max()
        same = (sposes == bposes[r]).all()
        exact &= bool(same)
        print(f"robot {r}: bitwise={'YES' if same else 'no'} "
              f"max|dpose|={dp:.3e} max|dcost|={dc:.3e}")
    print(f"TPU fleet-vs-solo bitwise identical: {exact}")


if __name__ == "__main__":
    main()
