"""Microbench variants of the fused scoring kernel at bench shapes.

Times a 50x fori_loop over just the kernel (inputs fixed), isolating:
  v0: current f32 matmul + MXU matvec reduction
  v1: bf16 z matmul (f32 accumulate) + MXU matvec
  v2: f32 matmul + VPU masked-sum reduction
  v3: bf16 matmul + VPU masked-sum
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, P, N, I = 64, 4096, 384, 50
FDIM = 16
TILE_P = 2048


def make_kernel(zdtype, vpu_reduce):
    def kernel(w_ref, phit_ref, mask_ref, out_ref):
        wv = w_ref[0]
        pv = phit_ref[0]
        if zdtype == jnp.bfloat16:
            wv = wv.astype(jnp.bfloat16)
            pv = pv.astype(jnp.bfloat16)
        z = jnp.dot(wv, pv, preferred_element_type=jnp.float32)
        s = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
        if vpu_reduce:
            out_ref[0] = -jnp.sum(s * mask_ref[0].reshape(-1, 1), axis=0,
                                  keepdims=True)
        else:
            out_ref[0] = -jnp.dot(mask_ref[0], s,
                                  preferred_element_type=jnp.float32)
    return kernel


def build(zdtype, vpu_reduce, tile=TILE_P):
    kern = make_kernel(zdtype, vpu_reduce)

    @jax.jit
    def scores(phit, w, mask):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(B, P // tile),
                in_specs=[
                    pl.BlockSpec((1, N, FDIM), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, FDIM, tile), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, N), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                                       memory_space=pltpu.VMEM),
            ),
        )(w, phit, mask[:, None, :])

    return scores


def main():
    rs = np.random.RandomState(0)
    dev = jax.devices()[0]
    print("device:", dev.device_kind, file=sys.stderr)
    phit = jnp.asarray(rs.uniform(-1, 1, (B, FDIM, P)).astype(np.float32))
    w = jnp.asarray(rs.uniform(0, 1, (B, N, FDIM)).astype(np.float32))
    mask = jnp.asarray((rs.uniform(0, 1, (B, N)) > 0.2).astype(np.float32))
    phit, w, mask = jax.device_put((phit, w, mask), dev)

    def loop(fn):
        @jax.jit
        def run(phit, w, mask):
            def body(i, acc):
                out = fn(phit + acc * 0, w, mask)
                return out[:, 0, :1].mean()
            return jax.lax.fori_loop(0, I, body, jnp.float32(0.0))
        return run

    ref = None
    for name, zd, vr, tile in [
        ("v0 f32 + matvec", jnp.float32, False, TILE_P),
        ("v1 bf16 + matvec", jnp.bfloat16, False, TILE_P),
        ("v2 f32 + vpu-sum", jnp.float32, True, TILE_P),
        ("v3 bf16 + vpu-sum", jnp.bfloat16, True, TILE_P),
        ("v3t bf16 + vpu-sum tile4096", jnp.bfloat16, True, 4096),
        ("v0t f32 + matvec tile4096", jnp.float32, False, 4096),
    ]:
        fn = build(zd, vr, tile)
        out = fn(phit, w, mask)
        jax.block_until_ready(out)
        if ref is None:
            ref = np.asarray(out)
        else:
            d = np.abs(np.asarray(out) - ref)
            print(f"  {name}: max abs diff vs v0 {d.max():.5f} "
                  f"(rel {d.max()/np.abs(ref).max():.2e})", file=sys.stderr)
        lp = loop(fn)
        jax.block_until_ready(lp(phit, w, mask))
        t0 = time.time()
        r = [lp(phit, w, mask) for _ in range(3)]
        jax.block_until_ready(r[-1])
        dt = (time.time() - t0) / 3
        print(f"{name}: {dt*1e3:.2f} ms / {I} iters = "
              f"{dt/I*1e6:.1f} us/iter", file=sys.stderr)


if __name__ == "__main__":
    main()
