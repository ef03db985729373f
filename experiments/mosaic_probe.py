"""Bisect which small-shape op crashes Mosaic in the rollout kernel."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 512
N = 256


def run(name, kernel, *args, out_shape=None):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK", file=sys.stderr)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)


x = jnp.ones((8, P), jnp.float32)
xi = jnp.ones((8, P), jnp.uint32)
o8p = jax.ShapeDtypeStruct((8, P), jnp.float32)


def k_col3(x_ref, o_ref):
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    c = jnp.where(r == 0, 1.0, jnp.where(r == 1, 2.0, 3.0)).astype(jnp.float32)
    o_ref[:] = x_ref[:] + c


def k_bool11(x_ref, o_ref):
    m = jnp.min(x_ref[:], axis=1, keepdims=True)  # (8,1)
    bc = m[0:1, 0:1]  # (1,1)
    imp = bc < 0.5  # (1,1) bool
    v = jnp.where(imp, bc, bc + 1.0)  # (1,1)
    o_ref[:] = x_ref[:] + v


def k_slice11(x_ref, o_ref):
    s = x_ref[0:1, 0:1]  # (1,1)
    o_ref[:] = x_ref[:] * (jnp.cos(s) + 1.0)


def k_fori_small(x_ref, o_ref):
    def body(i, carry):
        a, b, w = carry  # (8,1), (1,1), scalar
        return a + 1.0, b * 1.01, w * 0.99

    a0 = jnp.sum(x_ref[:], axis=1, keepdims=True)
    b0 = a0[0:1, 0:1]
    a, b, w = jax.lax.fori_loop(0, 5, body, (a0, b0, jnp.float32(1.0)))
    o_ref[:] = x_ref[:] + a + b + w


def k_threefry(xi_ref, o_ref):
    c = xi_ref[:]
    k0 = jnp.uint32(123)
    k1 = jnp.uint32(456)
    k2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (k0, k1, k2)
    x0 = c + k0
    x1 = jnp.zeros_like(c) + k1
    for block in range(5):
        rots = (13, 15, 26, 6) if block % 2 == 0 else (17, 29, 16, 24)
        for r in rots:
            x0 = x0 + x1
            x1 = ((x1 << jnp.uint32(r)) | (x1 >> jnp.uint32(32 - r))) ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + jnp.uint32(block + 1)
    u = (x0 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = u


def k_dotgen(x_ref, o_ref):
    w = x_ref[:, 0:N][0:8, :]  # (8, N) pretend [16,N] small
    phi = x_ref[:]  # (8, P)
    z = jax.lax.dot_general(
        w, phi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, P)
    o_ref[:] = jnp.sum(z, axis=0, keepdims=True) + jnp.zeros((8, P), jnp.float32)


def k_bcast_out(x_ref, o_ref):
    m = jnp.sum(x_ref[:], axis=1, keepdims=True)  # (8,1)
    o_ref[:] = jnp.broadcast_to(m, (8, P))


run("col3 iota-where (8,1) bool", k_col3, x, out_shape=o8p)
run("(1,1) bool where", k_bool11, x, out_shape=o8p)
run("(1,1) f32 slice + cos", k_slice11, x, out_shape=o8p)
run("fori small carries", k_fori_small, x, out_shape=o8p)
run("threefry u32", k_threefry, xi, out_shape=o8p)
run("dot_general lhs-contract0", k_dotgen, x, out_shape=o8p)
run("broadcast (8,1)->(8,P)", k_bcast_out, x, out_shape=o8p)
