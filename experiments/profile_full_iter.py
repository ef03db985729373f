"""Profile the COMPOSED PSO iteration body (as the real solver runs it) on
TPU, for both gather ('fast') and stencil ('fast_local') binding, plus
leave-one-out variants, at the bench shapes B=64, P=4096, N=384, I=50."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ndtpso_slam_tpu import config as cfgm
from ndtpso_slam_tpu.models import cost as cost_mod, ndt_map
from ndtpso_slam_tpu.models.ndt_map import MapSnapshot
from ndtpso_slam_tpu.models.pso import _select_min
from ndtpso_slam_tpu.ops import rng

B, P, N, I = 64, 4096, 384, 50
map_cfg = cfgm.MapConfig(size_m=64.0, cell_side_m=1.0, window_slots=4)
cfg = cfgm.PSOConfig(iterations=I, population=P)

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
guesses = jnp.asarray(rs.uniform(-0.1, 0.1, (B, 3)).astype(np.float32))
devs = jnp.tile(jnp.float32([0.5, 0.5, 0.1])[None], (B, 1))
snaps, points, valid, keys, guesses, devs = jax.device_put(
    (snaps, points, valid, keys, guesses, devs), dev
)

nbrs = jax.jit(jax.vmap(
    lambda g, s, p, v: cost_mod.bind_neighborhood(g, s, p, v, map_cfg, radius=2)
))(guesses, snaps, points, valid)
jax.block_until_ready(nbrs)


def run_variant(name, use_local, skip=()):
    c1 = jnp.float32(cfg.c1)
    c2 = jnp.float32(cfg.c2)

    def solve(keys, guesses, devs):
        def one(key, guess, deviation, snap, nbr, pts, vld):
            def cost_fn(poses, bind):
                if "bind" in skip:
                    bound = cost_mod.BoundScan(
                        bind_pose=bind,
                        w=jnp.ones((N, 15), jnp.float32) * 1e-3,
                        mask=vld.astype(jnp.float32),
                    )
                elif use_local:
                    bound = cost_mod.bind_points_local(bind, nbr, pts, map_cfg)
                else:
                    bound = cost_mod.bind_points(bind, snap, pts, vld, map_cfg)
                if "score" in skip:
                    return -bound.w.sum(-1)[..., :1].sum(-1) * jnp.ones(
                        poses.shape[:-1], jnp.float32
                    ) - poses.sum(-1)
                return cost_mod.bound_cost(poses, bound)

            g_ctr, p_ctr = rng.pso_init_pairs(P)
            u_p, _ = rng.uniform_pairs((key[0], key[1]), p_ctr, jnp.float32)
            pos = guess + (2.0 * u_p - 1.0) * deviation
            cost = cost_fn(pos, guess)
            bc, bp = _select_min(cost, pos)

            def body(i, carry):
                pos, vel, pbest, pbest_cost, gbest, gbest_cost, w = carry
                if "rng" in skip:
                    r1 = r2 = jnp.full((P, 3), 0.5, jnp.float32)
                else:
                    r1, r2 = rng.uniform_pairs(
                        (key[0], key[1]), rng.pso_iter_pairs(i, P), jnp.float32
                    )
                vel = w * vel + c1 * r1 * (pbest - pos) + c2 * r2 * (gbest - pos)
                pos = pos + vel
                cost = cost_fn(pos, gbest)
                better = cost < pbest_cost
                pbest = jnp.where(better[:, None], pos, pbest)
                pbest_cost = jnp.where(better, cost, pbest_cost)
                if "book" in skip:
                    gbest = pbest[0]
                    gbest_cost = pbest_cost[0]
                else:
                    bc, bp = _select_min(pbest_cost, pbest)
                    gimp = bc < gbest_cost
                    gbest = jnp.where(gimp, bp, gbest)
                    gbest_cost = jnp.where(gimp, bc, gbest_cost)
                return pos, vel, pbest, pbest_cost, gbest, gbest_cost, w

            init = (pos, jnp.zeros_like(pos), pos, cost, bp, bc, jnp.float32(cfg.w))
            out = jax.lax.fori_loop(0, I, body, init)
            return out[4], out[5]

        return jax.vmap(one)(keys, guesses, devs, snaps, nbrs, points, valid)

    f = jax.jit(solve)
    out = f(keys, guesses, devs)
    jax.block_until_ready(out)
    jax.block_until_ready(f(keys, guesses, devs))
    t0 = time.time()
    outs = [f(keys, guesses, devs) for _ in range(5)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / 5 * 1000
    print(f"{name:40s} {dt:8.2f} ms/batch ({B*1000/dt:7.0f} solves/s)",
          file=sys.stderr)


run_variant("full, gather bind (fast)", False)
run_variant("full, stencil bind (fast_local)", True)
run_variant("local minus rng", True, skip=("rng",))
run_variant("local minus score", True, skip=("score",))
run_variant("local minus bind+score", True, skip=("bind", "score"))
run_variant("local minus bookkeeping", True, skip=("book",))
