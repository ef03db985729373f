import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Measure fused-kernel variants inside the full PSO loop (drain protocol).

Run on the TPU:  python experiments/pallas_variants.py
"""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ndtpso_slam_tpu import config as cfgm
from ndtpso_slam_tpu.models import ndt_map, cost as cost_mod
from ndtpso_slam_tpu.models.pso import pso_solve_batch
from ndtpso_slam_tpu.parallel import mesh as mesh_mod

B, P, N, F = 32, 4096, 384, 16
map_cfg = cfgm.MapConfig(size_m=64.0, cell_side_m=1.0, window_slots=4)
pso_cfg = cfgm.PSOConfig(iterations=50, population=P)
rs = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    t = np.linspace(0, 2*np.pi, N, endpoint=False)
    pts = (np.stack([10*np.cos(t), 8*np.sin(t)], -1) + rs.normal(0, 0.05, (N, 2))).astype(np.float32)
    st = ndt_map.init_map(map_cfg)
    for _ in range(3):
        st = ndt_map.add_points(st, map_cfg, pts + rs.normal(0, 0.03, pts.shape).astype(np.float32), np.ones(N, bool))
        st = ndt_map.build(st, map_cfg)
    snap1 = ndt_map.snapshot(st, map_cfg)
    snaps = jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (B,) + (1,)*x.ndim), snap1)
    points = jnp.tile(jnp.asarray(pts)[None], (B, 1, 1)); valid = jnp.ones((B, N), bool)
dev = jax.devices()[0]
snaps, points, valid = jax.device_put((snaps, points, valid), dev)
keys = jax.device_put(rs.randint(0, 2**31, (B, 2)).astype(np.uint32), dev)
guesses = jax.device_put(np.zeros((B, 3), np.float32), dev)
devs = jax.device_put(np.tile(np.float32([0.3, 0.3, 0.05]), (B, 1)), dev)


def make_scores(variant, tile):
    if variant == "dot_dot":
        def kern(phi_ref, w_ref, mask_ref, out_ref):
            z = jax.lax.dot_general(phi_ref[0], w_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
            c = -jax.lax.dot_general(s, mask_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            out_ref[0] = c.T
    elif variant == "dot_vpusum":
        def kern(phi_ref, w_ref, mask_ref, out_ref):
            z = jax.lax.dot_general(phi_ref[0], w_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
            out_ref[0] = -jnp.sum(s * mask_ref[0], axis=1, keepdims=True).T
    elif variant == "vpu_outer":
        def kern(phi_ref, w_ref, mask_ref, out_ref):
            phi = phi_ref[0]  # [tile, F]
            w = w_ref[0]      # [N, F]
            z = jnp.zeros((phi.shape[0], w.shape[0]), jnp.float32)
            for f in range(F):
                z = z + phi[:, f:f+1] * w[None, :, f]
            s = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
            out_ref[0] = -jnp.sum(s * mask_ref[0], axis=1, keepdims=True).T
    else:
        raise ValueError(variant)

    @jax.jit
    def scores(phi, w, mask):
        b, p, f = phi.shape
        n = w.shape[1]
        if f < F:
            phi = jnp.pad(phi, [(0, 0), (0, 0), (0, F - f)])
            w = jnp.pad(w, [(0, 0), (0, 0), (0, F - f)])
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(b, p // tile),
                in_specs=[
                    pl.BlockSpec((1, tile, F), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n, F), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(phi, w, mask[:, None, :])
        return out[:, 0, :]

    return scores


def solver_with(scores_fn):
    def batched_cost(poses, binds):
        bound = jax.vmap(lambda b_, s, p, v: cost_mod.bind_points(b_, s, p, v, map_cfg))(binds, snaps, points, valid)
        phi = cost_mod.pose_features(poses, bound.bind_pose)
        return scores_fn(phi, bound.w, bound.mask)
    return jax.jit(lambda k, g, d: pso_solve_batch(k, g, d, batched_cost, pso_cfg))


variants = {"xla_baseline": jax.jit(lambda k, g, d: pso_solve_batch(k, g, d, (lambda poses, binds: (lambda bound: (
    -jnp.einsum("bpn,bn->bp", jnp.exp(-0.5*jnp.maximum(jnp.einsum("bpf,bnf->bpn", cost_mod.pose_features(poses, bound.bind_pose), bound.w), 0.)), bound.mask)
))(jax.vmap(lambda b_, s, p, v: cost_mod.bind_points(b_, s, p, v, map_cfg))(binds, snaps, points, valid))), pso_cfg))}
for variant in ("dot_dot", "dot_vpusum", "vpu_outer"):
    for tile in (256, 512, 1024):
        variants[f"{variant}_t{tile}"] = solver_with(make_scores(variant, tile))

warm = {}
for k, f in variants.items():
    try:
        warm[k] = f(keys, guesses, devs)
    except Exception as e:
        print(f"{k}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
jax.block_until_ready(list(warm.values()))
_ = float(jnp.sum(warm["xla_baseline"].cost))
print("drained", flush=True)

for k, f in variants.items():
    if k not in warm:
        continue
    jax.block_until_ready(f(keys, guesses, devs))
    t0 = time.time()
    outs = [f(keys, guesses, devs) for _ in range(6)]
    jax.block_until_ready(outs[-1])
    tot = time.time() - t0
    err = float(jnp.max(jnp.abs(outs[-1].cost - warm["xla_baseline"].cost)))
    print(f"{k}: {tot/6*1e3:.1f} ms/batch -> {B*6/tot:.0f} solves/s (cost maxdiff {err:.1e})", flush=True)
