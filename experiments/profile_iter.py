"""Microbenchmark the PSO iteration's components on the TPU.

Breaks the per-iteration work of the fast path into pieces and times each as
a 50x fori_loop over the bench shapes (B=64, P=4096, N=384), to see where
the 66 ms/batch actually goes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ndtpso_slam_tpu import config as cfgm
from ndtpso_slam_tpu.models import cost as cost_mod, ndt_map
from ndtpso_slam_tpu.models.ndt_map import MapSnapshot
from ndtpso_slam_tpu.ops import rng

B, P, N, I = 64, 4096, 384, 50
map_cfg = cfgm.MapConfig(size_m=64.0, cell_side_m=1.0, window_slots=4)

rs = np.random.RandomState(0)
dev = jax.devices()[0]
print("device:", dev.device_kind, file=sys.stderr)

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    pts1 = rs.uniform(-20, 20, (N, 2)).astype(np.float32)
    state = ndt_map.init_map(map_cfg)
    for _ in range(3):
        state = ndt_map.add_points(
            state, map_cfg,
            (pts1 + rs.normal(0, 0.03, (N, 2))).astype(np.float32),
            np.ones(N, bool),
        )
        state = ndt_map.build(state, map_cfg)
    snap1 = ndt_map.snapshot(state, map_cfg)

snaps = MapSnapshot(
    mean=jnp.tile(snap1.mean[None], (B, 1, 1)),
    inv_cov=jnp.tile(snap1.inv_cov[None], (B, 1, 1)),
    built=jnp.tile(snap1.built[None], (B, 1)),
)
points = jnp.asarray(np.tile(pts1[None], (B, 1, 1)))
valid = jnp.ones((B, N), bool)
keys = jnp.asarray(rs.randint(0, 2**31, (B, 2)).astype(np.uint32))
poses0 = jnp.asarray(rs.uniform(-0.3, 0.3, (B, P, 3)).astype(np.float32))
binds0 = jnp.asarray(rs.uniform(-0.1, 0.1, (B, 3)).astype(np.float32))
snaps, points, valid, keys, poses0, binds0 = jax.device_put(
    (snaps, points, valid, keys, poses0, binds0), dev
)


def timeit(name, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    jax.block_until_ready(f(*args))
    t0 = time.time()
    outs = [f(*args) for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:36s} {dt:8.2f} ms/batch  ({dt/I*1000:7.1f} us/iter)",
          file=sys.stderr)
    return dt


def loop(body):
    def run(poses, binds):
        def f(i, c):
            p, b = c
            p, b = body(i, p, b)
            return (p, b)
        return jax.lax.fori_loop(0, I, f, (poses, binds))
    return run


# 1. RNG only: draw r1, r2 and fold into poses.
def body_rng(i, poses, binds):
    r1, r2 = jax.vmap(
        lambda k: rng.uniform_pairs((k[0], k[1]), rng.pso_iter_pairs(i, P), jnp.float32)
    )(keys)
    return poses + 0.001 * r1 - 0.001 * r2, binds

timeit("rng draws [B,P,3]x2", loop(body_rng), poses0, binds0)


# 2. bind_points only (per-iteration gathers + w build).
def body_bind(i, poses, binds):
    bound = jax.vmap(
        lambda bnd, s, p, v: cost_mod.bind_points(bnd, s, p, v, map_cfg),
        in_axes=(0, 0, 0, 0),
    )(binds, snaps, points, valid)
    return poses, binds + 1e-6 * bound.w.sum(axis=(1, 2))[:, None]

timeit("bind_points (gather + w build)", loop(body_bind), poses0, binds0)


# 3. scoring via XLA bound_cost (w fixed, poses vary).
bound_fixed = jax.vmap(
    lambda bnd, s, p, v: cost_mod.bind_points(bnd, s, p, v, map_cfg),
    in_axes=(0, 0, 0, 0),
)(binds0, snaps, points, valid)
bound_fixed = jax.device_put(bound_fixed, dev)

def body_score_xla(i, poses, binds):
    c = jax.vmap(cost_mod.bound_cost)(poses, bound_fixed)
    return poses + 1e-9 * c[..., None], binds

timeit("score XLA (matmul+exp+matmul)", loop(body_score_xla), poses0, binds0)


# 4. scoring via fused Pallas kernel.
def body_score_fused(i, poses, binds):
    c = cost_mod.bound_cost_fused(poses, bound_fixed)
    return poses + 1e-9 * c[..., None], binds

timeit("score fused Pallas", loop(body_score_fused), poses0, binds0)


# 5. phi features only.
def body_phi(i, poses, binds):
    phit = cost_mod.pose_features_t(poses, binds)
    return poses + 1e-9 * phit.sum(-2)[..., None] * 0 + poses * 0 + poses, binds

timeit("pose_features_t only", loop(body_phi), poses0, binds0)


# 6. pbest/gbest bookkeeping shapes.
def body_book(i, poses, binds):
    cost = poses.sum(-1)  # [B, P] stand-in
    bi = jnp.argmin(cost, axis=1)
    bp = jnp.take_along_axis(poses, bi[:, None, None], axis=1)[:, 0]
    return poses + 1e-9, binds + 1e-9 * bp

timeit("argmin/gather bookkeeping", loop(body_book), poses0, binds0)
