"""Multi-process distributed throughput artifact (BASELINE config 5).

The 2-process gloo runtime was correctness-tested only
(tests/test_distributed_runtime.py); this experiment adds the missing PERF
artifact: aggregate dp solves/s through `runtime.make_hier_solver` across
2 real OS processes (hierarchical (hosts, chips) mesh, real gloo
collectives at the process boundary), against the right control — the SAME
total virtual device count in ONE process — so the ratio isolates what the
process/DCN boundary costs, not host oversubscription (this host has 2
physical cores; absolute numbers are CPU-emulation shape, not TPU
performance, exactly like the --cpu-mesh bench rows).

Run: python experiments/dist_bench.py          (driver; spawns everything)
Writes benchlogs/dist2proc.json, cited by BENCH.md's config-5 row.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

B = 64  # global batch of independent solves
REPS = 5
DEVS_PER_PROC = 2  # 2 procs x 2 virtual devices = 4; control = 1 proc x 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def worker(n_procs: int, devs_per_proc: int):
    """Measure REPS dispatches of a dp-sharded solve batch; rank 0 prints
    one JSON line {"solves_per_s": ...}."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ndtpso_slam_tpu.parallel import runtime

    if n_procs > 1:
        assert runtime.initialize_distributed(), "env-driven init must engage"
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ndtpso_slam_tpu import config as cfgm
    from ndtpso_slam_tpu.models import ndt_map
    from ndtpso_slam_tpu.parallel import mesh as mesh_mod  # noqa: F401

    pid = jax.process_index()
    map_cfg = cfgm.MapConfig(size_m=32.0, cell_side_m=1.0, window_slots=4)
    pso_cfg = cfgm.PSOConfig(iterations=20, population=256)

    rs = np.random.RandomState(0)
    t = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    pts = (
        np.stack([9 * np.cos(t), 6 * np.sin(t)], -1)
        + rs.normal(0, 0.05, (200, 2))
    ).astype(np.float32)
    state = ndt_map.init_map(map_cfg)
    for _ in range(2):
        state = ndt_map.add_points(
            state, map_cfg,
            pts + rs.normal(0, 0.02, pts.shape).astype(np.float32),
            np.ones(200, bool),
        )
        state = ndt_map.build(state, map_cfg)
    snap = ndt_map.snapshot(state, map_cfg)

    rs2 = np.random.RandomState(1)
    keys = rs2.randint(0, 2**31, (B, 2)).astype(np.uint32)
    guesses = np.zeros((B, 3), np.float32)
    devs = np.tile(np.float32([0.2, 0.2, 0.05]), (B, 1))
    points = np.tile(pts[None], (B, 1, 1))
    valid = np.ones((B, 200), bool)
    snaps = jax.tree_util.tree_map(
        lambda x: np.tile(np.asarray(x)[None], (B,) + (1,) * x.ndim), snap
    )

    mesh = runtime.make_hier_mesh(
        n_hosts=n_procs if n_procs > 1 else 1,
        chips_per_host=devs_per_proc,
    )
    per = B // n_procs
    lo, hi = pid * per, (pid + 1) * per
    g_args = runtime.shard_global(
        mesh, P(runtime.SOLVE_AXES),
        (keys[lo:hi], guesses[lo:hi], devs[lo:hi],
         jax.tree_util.tree_map(lambda x: x[lo:hi], snaps),
         points[lo:hi], valid[lo:hi]),
    )
    solver = runtime.make_hier_solver(mesh, map_cfg, pso_cfg, cost_mode="fast")
    res = solver(*g_args)
    jax.block_until_ready(res)  # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        res = solver(*g_args)
        jax.block_until_ready(res)
    dt = time.time() - t0
    solves_per_s = B * REPS / dt
    if pid == 0:
        print(json.dumps({"solves_per_s": round(solves_per_s, 2),
                          "n_procs": n_procs,
                          "devices": n_procs * devs_per_proc}), flush=True)


def driver():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    # --- 2 real processes, 2x2 mesh, gloo at the boundary
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            NDTPSO_COORDINATOR=f"localhost:{port}",
            NDTPSO_NUM_PROCESSES="2",
            NDTPSO_PROCESS_ID=str(pid),
            PYTHONPATH=root + os.pathsep + env.get("PYTHONPATH", ""),
        )
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--role", "worker2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
    two = json.loads([l for l in outs[0].splitlines()
                      if l.startswith("{")][-1])

    # --- control: same 4 total devices in ONE process
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    for k in ("NDTPSO_COORDINATOR", "NDTPSO_NUM_PROCESSES",
              "NDTPSO_PROCESS_ID"):
        env.pop(k, None)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--role", "worker1"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert p.returncode == 0, f"1-proc control failed:\n{p.stdout[-2000:]}"
    one = json.loads([l for l in p.stdout.splitlines()
                      if l.startswith("{")][-1])

    eff = two["solves_per_s"] / one["solves_per_s"]
    result = {
        "experiment": "dist2proc",
        "workload": f"B={B} dp solves, fast mode, 20 it x 256 particles",
        "two_proc_2x2_solves_per_s": two["solves_per_s"],
        "one_proc_1x4_solves_per_s": one["solves_per_s"],
        "efficiency_vs_one_proc_same_devices": round(eff, 4),
        "note": (
            "CPU gloo emulation on a 2-core host (virtual devices share "
            "cores); the ratio isolates the process/DCN boundary cost at "
            "constant total devices, absolute numbers are not TPU perf"
        ),
    }
    out_path = os.path.join(root, "benchlogs", "dist2proc.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    role = sys.argv[sys.argv.index("--role") + 1] if "--role" in sys.argv \
        else "driver"
    if role == "worker2":
        worker(2, DEVS_PER_PROC)
    elif role == "worker1":
        worker(1, 2 * DEVS_PER_PROC)
    else:
        driver()
