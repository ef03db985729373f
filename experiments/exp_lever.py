"""Measure the exp-side lever of the rollout kernel (VERDICT r2 item 7).

The rollout kernel's per-iteration work is one K=16 MXU matmul producing
z[N, P] and then `exp(-z/2)` + row-sum on the VPU.  The roofline
(BENCH.md) says the transcendental is the binding resource at the f32
operating point: I*P*N exps/solve = 78.6M, ~247 G exp/s at 3143 solves/s.
This experiment measures one concrete exp-side variant on the same inputs:

  exp  : s = exp(-0.5 * max(z, 0))              (baseline, ships)
  exp2 : s = 2^(max(z, 0) * (-0.5/ln 2))        (skips exp's ln2 range
                                                 reduction; 1 extra mul)

and reports throughput + max |cost| deviation.  Run on the TPU:
    python experiments/exp_lever.py
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
    from ndtpso_slam_tpu.models import cost as cost_mod, ndt_map, scan as scan_mod
    from ndtpso_slam_tpu.ops.pallas_rollout import (
        pack_rollout_inputs, pso_rollout,
    )

    dev = jax.devices()[0]
    interp = jax.default_backend() != "tpu"
    print(f"device: {dev.platform} {dev.device_kind} interpret={interp}",
          file=sys.stderr)
    b, beams, pad = 64, 360, 384
    map_cfg = cfgm.MapConfig(size_m=64.0, cell_side_m=1.0, window_slots=4)
    pso_cfg = cfgm.PSOConfig(iterations=50, population=4096)
    scan_cfg = cfgm.ScanConfig(max_beams=pad)
    rs = np.random.RandomState(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        segs = synthetic.make_world(seed=1, size=50.0, n_boxes=8)
        r = synthetic.raycast(segs, np.zeros(3), beams, -np.pi,
                              2 * np.pi / beams, 30.0)
        ref = scan_mod.load_laser(r.astype(np.float32), -np.pi,
                                  2 * np.pi / beams, 30.0, scan_cfg, map_cfg)
        st = ndt_map.init_map(map_cfg)
        for _ in range(3):
            jp = np.asarray(ref.points) + rs.normal(0, 0.03, (pad, 2))
            st = ndt_map.add_points(st, map_cfg, jp.astype(np.float32),
                                    np.asarray(ref.valid))
            st = ndt_map.build(st, map_cfg)
        snap = ndt_map.snapshot(st, map_cfg)
        guesses = rs.uniform(-0.1, 0.1, (b, 3)).astype(np.float32)
        nbrs = jax.vmap(
            lambda g: cost_mod.bind_neighborhood(
                g, snap, ref.points, ref.valid, map_cfg,
                radius=cost_mod.DEFAULT_STENCIL_RADIUS,
            )
        )(jnp.asarray(guesses))
        sten, pts = jax.vmap(lambda n: pack_rollout_inputs(n, ref.points))(nbrs)
    keys = rs.randint(0, 2**31, (b, 2)).astype(np.uint32)
    devs = np.tile(np.float32([0.3, 0.3, 0.08]), (b, 1))
    args = jax.device_put(
        (jnp.asarray(keys), jnp.asarray(guesses), jnp.asarray(devs), sten, pts),
        dev,
    )

    results = {}
    for mode in ("exp", "exp2", "approx"):
        run = lambda: pso_rollout(
            *args, pso_cfg, map_cfg,
            radius=cost_mod.DEFAULT_STENCIL_RADIUS, interpret=interp,
            rng_mode="threefry", exp_mode=mode,
        )
        t0 = time.time()
        out = run()
        jax.block_until_ready(out)
        print(f"{mode}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        np.asarray(out[0])  # drain the axon readback queue
        jax.block_until_ready(run())
        reps = 2 if interp else 10
        t0 = time.time()
        outs = [run() for _ in range(reps)]
        jax.block_until_ready(outs[-1])
        dt = (time.time() - t0) / reps
        results[mode] = (b / dt, np.asarray(out[0]), np.asarray(out[1]))
        print(f"{mode}: {b / dt:.1f} solves/s", file=sys.stderr)

    base = results["exp"]
    for mode in ("exp2", "approx"):
        sp, pose, cost = results[mode]
        dpose = np.abs(pose - base[1]).max()
        dcost = np.abs((cost - base[2]) / base[2]).max()
        print(
            f"{mode}: {sp:.1f} solves/s ({sp / base[0] * 100 - 100:+.1f}% vs "
            f"exp {base[0]:.1f}); max |dpose| {dpose:.2e}, "
            f"max rel |dcost| {dcost:.2e}"
        )


if __name__ == "__main__":
    main()
