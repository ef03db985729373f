"""Soak-drift root cause: numerics (Mosaic transcendentals) or chaos?

Round 4's honest negative result: the `rollout_local` Pallas kernel fails
the 2,400-scan dock-dwell soak drift gate (0.90-1.09 m mean vs the XLA
`local_exact` path's 0.0073 m), with a STATED but UNPROVEN root cause —
ulp-level Mosaic-vs-XLA cos/sin/exp differences tipping the dwell transient
(~1.35 m even on the XLA path) into unrecovered drift.

This experiment builds the discriminating control the claim was missing:

* `xla_base`     — the known-good reference run (key (3,9), expect ~7 mm).
* `xla_key*`     — the SAME XLA path under different PRNG keys: a different
                   draw stream is a macroscopic perturbation of the search,
                   far larger than any ulp.  If these drift ~1 m, the dwell
                   workload is chaotic and the kernel is exonerated; if they
                   all land ~mm, the XLA path is robust to stream choice.
* `xla_ulp_pos/neg` — the XLA path with every beam coordinate perturbed by
                   exactly ONE ulp (points * (1 ± 2^-23)).  The sharpest
                   version of the question: if a 1-ulp input change already
                   diverges, the kernel's 1-ulp transcendental differences
                   cannot be blamed as a defect; if it stays ~mm, the
                   kernel's numerics are indicted.
* `kern_base`    — reproduce the kernel failure (expect ~0.9 m).
* `kern_key*`    — the kernel under other keys: scatter tells chaos too.

Each invocation runs ONE variant (axon-tunnel wedge isolation; drive with
experiments/soak_chaos.sh) and appends benchlogs/soak_chaos/<variant>.json.
Accuracy only — concurrent host load does not gate this experiment.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

VARIANTS = {
    # name: (cost_mode, key, point_scale[, recovery])
    # The *_rec variants re-run the two CATASTROPHIC chaos draws with the
    # engine's own tracking-loss recovery enabled (pure defaults): does
    # the failure-detection layer convert a diverging draw into a
    # recovered run, or is chaotic dwell drift self-consistent (map
    # drifts with the robot, fitness stays healthy, loss invisible)?
    "xla_key3_rec": ("local_exact", (101, 77), 1.0, True),
    "xla_ulp_neg_rec": ("local_exact", (3, 9), 1.0 - 2.0 ** -24, True),
    "xla_base": ("local_exact", (3, 9), 1.0),
    "xla_key1": ("local_exact", (5, 13), 1.0),
    "xla_key2": ("local_exact", (7, 21), 1.0),
    "xla_key3": ("local_exact", (101, 77), 1.0),
    "xla_ulp_pos": ("local_exact", (3, 9), 1.0 + 2.0 ** -23),
    "xla_ulp_neg": ("local_exact", (3, 9), 1.0 - 2.0 ** -24),
    "kern_base": ("rollout_local", (3, 9), 1.0),
    "kern_key1": ("rollout_local", (5, 13), 1.0),
    "kern_key2": ("rollout_local", (7, 21), 1.0),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True, choices=sorted(VARIANTS))
    ap.add_argument("--scans", type=int, default=2400)
    args = ap.parse_args()
    variant = VARIANTS[args.variant]
    mode, key, scale = variant[:3]
    recovery_on = bool(variant[3]) if len(variant) > 3 else False

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(ROOT, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:
        log(f"compile cache unavailable: {e}")

    from ndtpso_slam_tpu import config as cfgm
    from ndtpso_slam_tpu.io import synthetic
    from ndtpso_slam_tpu.models import scan as scan_mod, slam

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}; variant {args.variant}: "
        f"mode={mode} key={key} point_scale={scale!r}")

    # Exactly the bench --soak workload (bench.py:bench_slam): full
    # deployment scale, reference PSO budget.
    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=30, population=50),
        map=cfgm.MapConfig(size_m=300.0, cell_side_m=0.5, window_slots=100),
        scan=cfgm.ScanConfig(max_beams=384),
        og=cfgm.OccupancyGridConfig(enabled=False),
        recovery=cfgm.RecoveryConfig(enabled=recovery_on),
        cost_mode=mode,
    )
    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        lg = synthetic.make_soak_log(seed=2, n_scans=args.scans, n_beams=360)
        loaded = [
            scan_mod.load_laser(r, lg.angle_min, lg.angle_increment,
                                lg.range_max, cfg.scan, cfg.map)
            for r in lg.ranges
        ]
        points = jnp.stack([s.points for s in loaded])
        if scale != 1.0:
            # The 1-ulp input perturbation: every f32 beam coordinate moves
            # by exactly one unit in the last place (multiplication by
            # 1 ± 2^-23/2^-24 flips the final mantissa bit for normals).
            points = (points.astype(jnp.float32)
                      * jnp.float32(scale)).astype(jnp.float32)
        scans = scan_mod.Scan(
            points=points,
            valid=jnp.stack([s.valid for s in loaded]),
        )
        state0 = slam.init_slam(cfg, initial_pose=tuple(lg.poses[0]))
    scans, state0 = jax.device_put((scans, state0), dev)
    log(f"setup {time.time()-t0:.1f}s; T={args.scans}")

    t0 = time.time()
    final_state, poses, _ = slam.run_offline(
        state0, scans, (np.uint32(key[0]), np.uint32(key[1])), cfg
    )
    p = np.asarray(poses)
    dt = time.time() - t0
    err = np.hypot(p[:, 0] - lg.poses[:, 0], p[:, 1] - lg.poses[:, 1])
    res = {
        "variant": args.variant,
        "cost_mode": mode,
        "key": list(key),
        "point_scale": scale,
        "scans": args.scans,
        "mean_err_m": round(float(err.mean()), 4),
        "max_err_m": round(float(err.max()), 4),
        "final_err_m": round(float(err[-1]), 4),
        # where the transient peaks / whether it re-anchors:
        "err_at_600": round(float(err[min(600, len(err) - 1)]), 4),
        "err_last_100_mean": round(float(err[-100:].mean()), 4),
        "scans_per_s": round(args.scans / dt, 1),
        "recovery_enabled": recovery_on,
        "recoveries": int(np.asarray(final_state.recoveries)),
    }
    log(json.dumps(res))
    out_dir = os.path.join(ROOT, "benchlogs", "soak_chaos")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{args.variant}.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
