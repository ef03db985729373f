"""Is the 8-robot fleet rollout gate failure a fleet bug or a bad draw?

`slam_fullscale_8robots_r8192_flat_rollout_local_turbo` fails the
per-robot accuracy gate on EXACTLY robot 4 (mean 0.608 m; the other seven
are 0.015-0.17), deterministically across attempts.  The fleet path is
bitwise-equal to solo runs by construction and test
(tests/test_parallel.py::test_fleet_rollout_local_matches_solo_bitwise),
so the discriminator is: run robot 4's log SOLO (run_offline, B=1 kernel
call) with the identical key/mode/scale.  If solo reproduces ~0.6 m, the
failure is that robot's turbo draw on that log — the per-run chaos
sensitivity measured by experiments/soak_chaos.py — not a fleet defect.

Run on the TPU: python experiments/fleet_rollout_robot4.py
Writes benchlogs/fleet_rollout_robot4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    from ndtpso_slam_tpu import config as cfgm
    from ndtpso_slam_tpu.io import synthetic
    from ndtpso_slam_tpu.models import scan as scan_mod, slam

    r = 4  # the failing robot of the 8-robot bench fleet
    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=30, population=50),
        map=cfgm.MapConfig(size_m=300.0, cell_side_m=0.5, window_slots=100,
                           ring_rows=8192),
        scan=cfgm.ScanConfig(max_beams=384),
        og=cfgm.OccupancyGridConfig(enabled=False),
        cost_mode="rollout_local_turbo",
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        lg = synthetic.make_log(seed=2 + r, n_scans=50, n_beams=360,
                                world_size=50.0)  # bench_slam's exact log
        loaded = [
            scan_mod.load_laser(rr, lg.angle_min, lg.angle_increment,
                                lg.range_max, cfg.scan, cfg.map)
            for rr in lg.ranges
        ]
        scans = scan_mod.Scan(
            points=jnp.stack([s.points for s in loaded]),
            valid=jnp.stack([s.valid for s in loaded]),
        )
        state0 = slam.init_slam(cfg, initial_pose=tuple(lg.poses[0]))
    dev = jax.devices()[0]
    scans, state0 = jax.device_put((scans, state0), dev)
    key = (np.uint32(3), np.uint32(9 + r))  # bench_slam's exact key
    t0 = time.time()
    _, poses, _ = slam.run_offline(state0, scans, key, cfg)
    p = np.asarray(poses)
    err = np.hypot(p[:, 0] - lg.poses[:, 0], p[:, 1] - lg.poses[:, 1])
    res = {
        "experiment": "fleet_rollout_robot4",
        "robot": r,
        "mode": cfg.cost_mode,
        "solo_mean_err_m": round(float(err.mean()), 4),
        "solo_max_err_m": round(float(err.max()), 4),
        "fleet_row_mean_err_m": 0.6084,  # the failing 8-robot row's value
        "verdict": (
            "bad turbo draw (matches fleet => chaos, fleet exonerated)"
            if err.mean() > 0.4 else
            "solo differs from fleet — investigate the fleet path"
        ),
        "runtime_s": round(time.time() - t0, 1),
    }
    print(json.dumps(res))
    with open(os.path.join(ROOT, "benchlogs",
                           "fleet_rollout_robot4.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
