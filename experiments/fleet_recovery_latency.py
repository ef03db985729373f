"""Fleet recovery event latency at deployment scale (round-5 VERDICT item 3).

A kidnapped robot in an 8-robot full-scale flat fleet escalates through
`relocalize_fleet_robot` (host-side solo 3-stage sweep on one robot's
state slice + one-robot-masked re-ingestion).  This measures, on the TPU:

* the healthy 8-robot `fleet_pool_step` poll (recovery compiled, nothing
  lost),
* the poll in which the kidnapped robot is flagged (quarantine taken),
* the `relocalize_fleet_robot` escalation call itself — the per-event cost
  the operator pays on top of the poll, against the 10 Hz budget,

plus the accuracy gate (recovered pose within 0.3 m of the kidnapped
truth, healthy robots' map rows untouched bitwise).

Run on the TPU: python experiments/fleet_recovery_latency.py
Writes benchlogs/fleet_recovery_latency.json.
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

B = 8
T_WARM = 20
KID = 3  # which robot gets kidnapped
N_BEAMS = 360


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    from ndtpso_slam_tpu.ops import rng
    from ndtpso_slam_tpu.parallel.fleet import (
        fleet_pool_step, relocalize_fleet_robot,
    )

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    cfg = cfgm.SlamConfig(
        pso=cfgm.PSOConfig(iterations=30, population=50),
        map=cfgm.MapConfig(size_m=300.0, cell_side_m=0.5, window_slots=100,
                           ring_rows=8192),
        scan=cfgm.ScanConfig(max_beams=384),
        og=cfgm.OccupancyGridConfig(enabled=False),
        recovery=cfgm.RecoveryConfig(enabled=True),  # pure shipped defaults
        cost_mode="local_exact",
    )

    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        worlds = [synthetic.make_world(seed=40 + r, size=44.0, n_boxes=6)
                  for r in range(B)]

        def scan_at(segs, pose):
            r = synthetic.raycast(segs, np.asarray(pose, np.float64),
                                  N_BEAMS, -np.pi, 2 * np.pi / N_BEAMS, 30.0)
            return scan_mod.load_laser(
                r.astype(np.float32), -np.pi, 2 * np.pi / N_BEAMS, 30.0,
                cfg.scan, cfg.map)

        paths = [[(0.06 * t, 0.03 * t, 0.01 * t) for t in range(T_WARM + 3)]
                 for _ in range(B)]
        warm_scans = [
            [scan_at(worlds[r], paths[r][t]) for r in range(B)]
            for t in range(T_WARM)
        ]
        # Same kidnap geometry as the validated solo/fleet recovery tests
        # (tests/test_recovery.py, tests/test_fleet_recovery.py): a ±π
        # rotation component can land in a rotationally-ambiguous false
        # basin on box worlds — a known multi-hypothesis limit, not what
        # this experiment measures (it measures the EVENT LATENCY).
        kidnap_true = np.asarray(paths[KID][T_WARM]) + np.float64(
            [2.3, -1.8, 0.5])
        kid_scan = scan_at(worlds[KID], kidnap_true)
        healthy_next = [scan_at(worlds[r], paths[r][T_WARM]) for r in range(B)]
        states = slam.init_slam_batch(
            cfg, np.float32([p[0] for p in paths]))
        states = jax.tree_util.tree_map(jnp.copy, states)
    base_keys = np.stack(
        [np.full(B, 51, np.uint32), np.arange(60, 60 + B, dtype=np.uint32)],
        -1)
    all_active = jnp.ones((B,), bool)
    states = jax.device_put(states, dev)
    log(f"setup {time.time()-t0:.1f}s; warming {T_WARM} polls x {B} robots")

    def pool_poll(states, scans_list):
        scans = scan_mod.Scan(
            points=jnp.stack([s.points for s in scans_list]),
            valid=jnp.stack([s.valid for s in scans_list]),
        )
        return fleet_pool_step(states, scans, base_keys, all_active, cfg)

    t0 = time.time()
    for t in range(T_WARM):
        states, poses, costs, lost = pool_poll(states, warm_scans[t])
    np.asarray(poses)
    log(f"warm {T_WARM} polls in {time.time()-t0:.1f}s "
        f"(incl. compile); any lost during warm: {bool(np.asarray(lost).any())}")

    # Healthy poll timing (recovery compiled, branchless masking in-step).
    t0 = time.time()
    states, poses, costs, lost = pool_poll(states, healthy_next)
    np.asarray(poses)
    t_healthy = time.time() - t0
    assert not np.asarray(lost).any(), "healthy poll flagged a lost robot"
    log(f"healthy 8-robot poll: {t_healthy*1e3:.1f} ms")

    # Kidnap poll: robot KID teleported; others advance normally.
    with jax.default_device(cpu):
        kid_scans = [scan_at(worlds[r], paths[r][T_WARM + 1])
                     for r in range(B)]
        kid_scans[KID] = kid_scan
    t0 = time.time()
    states, poses, costs, lost = pool_poll(states, kid_scans)
    lost_h = np.asarray(lost)
    t_kidpoll = time.time() - t0
    log(f"kidnap poll: {t_kidpoll*1e3:.1f} ms; lost={lost_h}")
    assert lost_h[KID] and lost_h.sum() == 1, f"expected only robot {KID} lost"

    ref_row = np.asarray(states.map.mean_c)[0].copy()  # healthy robot row

    # Escalation: first call compiles; time the second on a state copy.
    key = jnp.stack(rng.threefry2x32(
        (np.uint32(base_keys[KID, 0]), np.uint32(base_keys[KID, 1])),
        jnp.asarray(int(np.asarray(states.step)[KID]) - 1, jnp.uint32),
        jnp.asarray(0, jnp.uint32)))
    sc_kid = scan_mod.Scan(points=kid_scan.points, valid=kid_scan.valid)
    states_copy = jax.tree_util.tree_map(jnp.copy, states)
    t0 = time.time()
    states2, pose_r, cost_r, acc = relocalize_fleet_robot(
        states_copy, jnp.asarray(KID, jnp.int32), sc_kid, key, cfg)
    np.asarray(pose_r)
    t_compile = time.time() - t0
    t0 = time.time()
    states, pose_r, cost_r, acc = relocalize_fleet_robot(
        states, jnp.asarray(KID, jnp.int32), sc_kid, key, cfg)
    np.asarray(pose_r)
    t_event = time.time() - t0
    del states2
    log(f"escalation event: {t_event*1e3:.1f} ms "
        f"(compile+first {t_compile:.1f}s), accepted={bool(acc)}")

    # The event is ONE blocking dispatch, so it carries the axon relay's
    # per-dispatch floor in full (the solo recovery bench amortizes it
    # over pipelined reps).  Measure the floor here so the artifact is
    # self-contained: a jitted no-op + readback.
    noop_in = jax.device_put(np.arange(8, dtype=np.float32), dev)
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(noop_in))
    floors = []
    for _ in range(30):
        t0 = time.time()
        np.asarray(noop(noop_in))
        floors.append(time.time() - t0)
    t_floor = float(np.median(floors))
    log(f"no-op dispatch floor: {t_floor*1e3:.1f} ms; "
        f"event net of floor ~{(t_event - t_floor)*1e3:.1f} ms")

    err = np.abs(np.asarray(pose_r) - kidnap_true)
    err[2] = abs((err[2] + np.pi) % (2 * np.pi) - np.pi)
    log(f"relocalized err vs kidnapped truth: {err.round(4)}")
    assert bool(acc), "relocalization not accepted"
    assert err[0] < 0.3 and err[1] < 0.3 and err[2] < 0.1, (
        f"relocalization missed: {err.round(4)}")
    same = np.array_equal(np.asarray(states.map.mean_c)[0], ref_row)
    assert same, "healthy robot's map rows changed during escalation"
    rec = np.asarray(states.recoveries)
    assert rec[KID] == 1 and rec.sum() == 1

    res = {
        "experiment": "fleet_recovery_latency",
        "robots": B,
        "scale": "full (300 m / 0.5 m cells, ring 8192)",
        "healthy_poll_ms": round(t_healthy * 1e3, 1),
        "kidnap_poll_ms": round(t_kidpoll * 1e3, 1),
        "escalation_event_ms": round(t_event * 1e3, 1),
        "noop_dispatch_floor_ms": round(t_floor * 1e3, 1),
        "event_net_of_relay_ms": round((t_event - t_floor) * 1e3, 1),
        "fits_10hz_budget_net_of_relay": bool(t_event - t_floor < 0.1),
        "reloc_err_m": [round(float(e), 4) for e in err],
        "recovery_defaults": "pure (auto grid_beam_stride)",
    }
    with open(os.path.join(ROOT, "benchlogs",
                           "fleet_recovery_latency.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
