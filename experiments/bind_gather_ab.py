"""A/B: stencil pre-gather strategies at deployment scale (C = 360k).

bind_neighborhood rolls the whole packed [C, 6] cell table by all 25
stencil offsets (O(C) HBM: ~216 MB of rolled table per solve) and then
gathers N wide rows.  That roll amortizes beautifully over big solve
BATCHES on small maps — but the sequential deployment is B=1 at C=360k,
where the roll is pure O(C) overhead per scan.  The alternative: gather
the [N, K2] neighbor rows directly (9,600 rows at N=384, K2=25 — row
count independent of C).

Usage: python experiments/bind_gather_ab.py   (on the TPU)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ndtpso_slam_tpu.config import MapConfig
from ndtpso_slam_tpu.models import cost as cost_mod, ndt_map
from ndtpso_slam_tpu.ops.geometry import cell_coords, transform_points


def bind_neighborhood_gather(anchor_pose, tbl, points, valid, cfg, radius=2):
    """Direct [N, K2]-row gather variant of bind_neighborhood."""
    w = cfg.cells_per_side
    q0 = transform_points(points, anchor_pose)
    ix, iy, _ = cell_coords(q0, size_m=cfg.size_m, cell_side_m=cfg.cell_side_m)
    side = 2 * radius + 1
    offs = np.arange(-radius, radius + 1, dtype=np.int32)
    di = jnp.asarray(np.tile(offs, side))
    dj = jnp.asarray(np.repeat(offs, side))
    nix = ix[:, None] + di[None, :]
    niy = iy[:, None] + dj[None, :]
    in_grid = (nix >= 0) & (nix < w) & (niy >= 0) & (niy < w)
    flat = jnp.clip(niy, 0, w - 1) * w + jnp.clip(nix, 0, w - 1)
    g = tbl[flat]  # [N, K2, 6]
    return cost_mod.NeighborhoodBind(
        anchor_ix=ix, anchor_iy=iy, mean=g[..., 0:2], icov=g[..., 2:5],
        built=(g[..., 5] > 0.5) & in_grid, valid=valid, radius=radius,
    )


def main():
    import sys
    size = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    cfg = MapConfig(size_m=size, cell_side_m=0.5, window_slots=100)
    print(f"map {size} m -> C = {cfg.num_cells}")
    n = 384
    rs = np.random.RandomState(0)
    state = ndt_map.init_map(cfg)
    pts = rs.uniform(-min(30.0, size/2-2), min(30.0, size/2-2), (4000, 2)).astype(np.float32)
    idx, inb = __import__("ndtpso_slam_tpu.ops.geometry", fromlist=["cell_index"]).cell_index(
        jnp.asarray(pts), size_m=cfg.size_m, cell_side_m=cfg.cell_side_m,
        cells_per_side=cfg.cells_per_side)
    ids = jnp.where(inb, idx, cfg.num_cells)
    state = ndt_map.add_points(state, cfg, jnp.asarray(pts), jnp.ones(4000, bool))
    state = ndt_map.build_touched(state, cfg, ids)
    snap = ndt_map.snapshot(state, cfg)
    scan = jnp.asarray(pts[:n])
    valid = jnp.ones(n, bool)
    anchor = jnp.asarray([0.03, -0.02, 0.01], jnp.float32)

    roll = jax.jit(lambda a: cost_mod.bind_neighborhood(a, snap, scan, valid, cfg))
    tbl = cost_mod.snapshot_table(snap)
    gather = jax.jit(lambda a: bind_neighborhood_gather(a, tbl, scan, valid, cfg))

    for name, fn in (("roll", roll), ("gather", gather)):
        out = fn(anchor)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            out = fn(anchor)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.3f} ms/bind")

    a = roll(anchor)
    b = gather(anchor)
    bm = np.asarray(a.built)
    np.testing.assert_array_equal(bm, np.asarray(b.built))
    np.testing.assert_array_equal(np.asarray(a.mean)[bm], np.asarray(b.mean)[bm])
    np.testing.assert_array_equal(np.asarray(a.icov)[bm], np.asarray(b.icov)[bm])
    print("parity (where built): exact")


if __name__ == "__main__":
    main()
