"""Minimal I/O-structure probes for the rollout crash."""
import sys
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, P, N, K2 = 2, 256, 256, 25

rs = np.random.RandomState(0)
keys = jnp.asarray(rs.randint(0, 2**31, (B, 2)).astype(np.uint32))
sten4 = jnp.asarray(rs.uniform(0, 1, (B, K2, 8, N)).astype(np.float32))
sten3 = sten4.reshape(B, K2 * 8, N)
pts = jnp.asarray(rs.uniform(-8, 8, (B, 8, N)).astype(np.float32))


def try_run(name, fn):
    try:
        jax.block_until_ready(fn())
        print(f"{name}: OK", file=sys.stderr)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}", file=sys.stderr)


def k_min(pts_ref, out_ref):
    out_ref[0] = jnp.broadcast_to(
        jnp.sum(pts_ref[0], axis=1, keepdims=True), (8, 128))


def f_min():
    return pl.pallas_call(
        k_min,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[pl.BlockSpec((1, 8, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(pts)


def k_sten4(sten_ref, out_ref):
    acc = jnp.zeros((8, N), jnp.float32)
    for k in range(K2):
        acc = acc + sten_ref[0, k]
    out_ref[0] = jnp.broadcast_to(jnp.sum(acc, axis=1, keepdims=True), (8, 128))


def f_sten4():
    return pl.pallas_call(
        k_sten4,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[pl.BlockSpec((1, K2, 8, N), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(sten4)


def k_sten3(sten_ref, out_ref):
    acc = jnp.zeros((8, N), jnp.float32)
    for k in range(K2):
        acc = acc + sten_ref[0, 8 * k:8 * k + 8, :]
    out_ref[0] = jnp.broadcast_to(jnp.sum(acc, axis=1, keepdims=True), (8, 128))


def f_sten3():
    return pl.pallas_call(
        k_sten3,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[pl.BlockSpec((1, K2 * 8, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(sten3)


def k_smem(keys_ref, pts_ref, out_ref):
    bi = pl.program_id(0)
    k0 = keys_ref[bi, 0]
    v = (k0 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
    out_ref[0] = jnp.broadcast_to(
        jnp.sum(pts_ref[0], axis=1, keepdims=True) + v, (8, 128))


def f_smem():
    return pl.pallas_call(
        k_smem,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(keys, pts)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("min", "all"):
    try_run("min 3D pts", f_min)
if which in ("smem", "all"):
    try_run("smem + grid", f_smem)
if which in ("sten3", "all"):
    try_run("sten 3D", f_sten3)
if which in ("sten4", "all"):
    try_run("sten 4D", f_sten4)
