"""Per-phase bisect of the flat-fleet step at deployment scale.

Usage (on the TPU): `python experiments/fleet_step_bisect.py [B]` with
optional RING_ROWS=R env (0 = dense).  Times the full fleet step and three
ablations (map update only / add_points only / solves only) over a
50-step scan.

Measured on the v5e:
  B=2 dense, before the whole-row ring fix:  full 136.6 ms/step — all of
    it in fleet_build_touched's 2D (row, slot) ring scatters (the slow
    lowering isolated in experiments/fleet_scatter_ab.py).
  B=2 dense, after:   full ~3.5 ms/step (576 scans/s aggregate).
  B=8 sparse R=8k, after: full 21.8 | update 17.6 | add_points 5.3 |
    solves 4.0 ms/step — the remaining bound is row-serial scatter
    throughput over the 13 per-cell state fields (~12k rows x 16
    gather/scatter passes per step), honest work rather than copies; the
    next lever would pack the per-cell fields into fewer, wider arrays.
"""
import time, dataclasses, functools
import jax, jax.numpy as jnp, numpy as np
from ndtpso_slam_tpu import config as cfgm
from ndtpso_slam_tpu.io import synthetic
from ndtpso_slam_tpu.models import scan as scan_mod, slam as slam_mod, ndt_map
from ndtpso_slam_tpu.parallel import fleet
from ndtpso_slam_tpu.ops.geometry import cell_index, transform_points

B, T = int(__import__('sys').argv[1]) if len(__import__('sys').argv) > 1 else 2, 50
cfg = cfgm.SlamConfig(
    pso=cfgm.PSOConfig(iterations=30, population=50),
    map=cfgm.MapConfig(size_m=300.0, cell_side_m=0.5, window_slots=100,
                       ring_rows=int(__import__('os').environ.get("RING_ROWS", "0"))),
    scan=cfgm.ScanConfig(max_beams=384),
    og=cfgm.OccupancyGridConfig(enabled=False), cost_mode="local_exact")
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    logs = [synthetic.make_log(seed=2+r, n_scans=T, n_beams=360, world_size=50.0) for r in range(B)]
    def load(lg):
        loaded=[scan_mod.load_laser(r, lg.angle_min, lg.angle_increment, lg.range_max, cfg.scan, cfg.map) for r in lg.ranges]
        return scan_mod.Scan(points=jnp.stack([s.points for s in loaded]), valid=jnp.stack([s.valid for s in loaded]))
    scans = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[load(lg) for lg in logs])
    st0 = slam_mod.init_slam_batch(cfg, np.stack([lg.poses[0] for lg in logs]).astype(np.float32))
dev = jax.devices()[0]
scans, st0 = jax.device_put((scans, st0), dev)
keys = np.stack([np.full(B,3,np.uint32), np.arange(9,9+B,dtype=np.uint32)], -1)

def timed(label, fn):
    out = fn(); jax.block_until_ready(out); np.asarray(out[1]).ravel()[0]
    t0=time.time()
    out = fn(); np.asarray(out[1]).ravel()[0]
    dt = time.time()-t0
    print(f"{label}: {dt/T*1e3:.2f} ms/step ({B*T/dt:.1f} scans/s)")

# variant A: full fleet
timed("full fleet", lambda: fleet.run_offline_fleet(st0, scans, keys, cfg))

# variant B: map update only (poses = ground truth-ish fixed, no align)
@functools.partial(jax.jit, static_argnames=("cfg",))
def update_only(states, scans, cfg):
    def step(carry, scan_t):
        states = carry
        pose = states.pose
        wpts = jax.vmap(transform_points)(scan_t.points, pose)
        idx, inb = cell_index(wpts, size_m=cfg.map.size_m, cell_side_m=cfg.map.cell_side_m, cells_per_side=cfg.map.cells_per_side)
        ids = jnp.where(scan_t.valid & inb, idx, cfg.map.num_cells)
        m = fleet.fleet_add_points(states.map, cfg.map, wpts, scan_t.valid)
        m = fleet.fleet_build_touched(m, cfg.map, jnp.concatenate([ids, states.prev_ids], axis=1))
        return states.replace(map=m, prev_ids=ids), pose
    xs = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x,0,1), scans)
    states, poses = jax.lax.scan(step, states, xs)
    return states, poses
timed("update only", lambda: update_only(st0, scans, cfg))

# variant C: add_points only
@functools.partial(jax.jit, static_argnames=("cfg",))
def add_only(states, scans, cfg):
    def step(carry, scan_t):
        states = carry
        wpts = jax.vmap(transform_points)(scan_t.points, states.pose)
        m = fleet.fleet_add_points(states.map, cfg.map, wpts, scan_t.valid)
        return states.replace(map=m), states.pose
    xs = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x,0,1), scans)
    states, poses = jax.lax.scan(step, states, xs)
    return states, poses
timed("add_points only", lambda: add_only(st0, scans, cfg))

# variant D: solves only (no map write; carry map unchanged)
@functools.partial(jax.jit, static_argnames=("cfg",))
def solve_only(states, scans, cfg):
    def step(carry, scan_t):
        states, i = carry
        keys_t = jax.vmap(lambda bk: jnp.stack(fleet.rng.threefry2x32((bk[0],bk[1]), jnp.asarray(i,jnp.uint32), jnp.asarray(0,jnp.uint32))))(jnp.asarray(keys))
        snaps = jax.vmap(lambda m: ndt_map.snapshot(m, cfg.map))(states.map)
        new_astates, results = jax.vmap(lambda k,a,sn,sc,g: slam_mod.align((k[0],k[1]),a,sn,sc,g,cfg))(keys_t, states.align, snaps, scan_t, states.pose)
        return (states.replace(align=new_astates, pose=results.pose), i+1), results.pose
    xs = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x,0,1), scans)
    (states,_), poses = jax.lax.scan(step, (states,0), xs)
    return states, poses
timed("solves only", lambda: solve_only(st0, scans, cfg))
