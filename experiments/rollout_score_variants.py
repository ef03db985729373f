"""Microbench the rollout kernel's per-iteration score block variants.

Isolates the (matmul -> exp -> reduce) chain at bench shapes (N=384, P=4096)
inside one kernel with a 50x fori_loop, approximating the rollout's serial
per-iteration dependency (no cross-iteration overlap)."""

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
LOG2E_HALF = 0.7213475204444817  # 0.5 * log2(e)


def make_kernel(variant):
    def kernel(w_ref, phit_ref, out_ref):
        def body(i, carry):
            wv = w_ref[0]  # [N, 16]
            pv = phit_ref[0] * (1.0 + carry * 0.0)  # [16, P]
            if variant in ("bf16mm", "bf16all"):
                z = jax.lax.dot_general(
                    wv.astype(jnp.bfloat16), pv.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [N, P]
            else:
                z = jax.lax.dot_general(
                    wv, pv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if variant == "exp2":
                s = jnp.exp2(-LOG2E_HALF * jnp.maximum(z, 0.0))
            elif variant == "noclamp":
                s = jnp.exp(-0.5 * z)
            elif variant == "bf16all":
                zb = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
                s = jnp.exp2(jnp.bfloat16(-LOG2E_HALF) * zb).astype(jnp.float32)
            else:
                s = jnp.exp(-0.5 * jnp.maximum(z, 0.0))
            c = -jnp.sum(s, axis=0, keepdims=True)  # [1, P]
            return carry + jnp.min(c) * 0.0

        out_ref[...] = jnp.broadcast_to(
            jax.lax.fori_loop(0, I, body, jnp.float32(0.0)), (1, 8, 128)
        )

    return kernel


def build(variant):
    kern = make_kernel(variant)

    @jax.jit
    def run(phit, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, N, FDIM), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, FDIM, P), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(w, phit)

    return run


def main():
    rs = np.random.RandomState(0)
    dev = jax.devices()[0]
    print("device:", dev.device_kind, file=sys.stderr)
    phit = jnp.asarray(rs.uniform(-1, 1, (B, FDIM, P)).astype(np.float32))
    w = jnp.asarray(rs.uniform(0, 1, (B, N, FDIM)).astype(np.float32))
    phit, w = jax.device_put((phit, w), dev)

    for name in ["base", "exp2", "noclamp", "bf16mm", "bf16all"]:
        fn = build(name)
        out = fn(phit, w)
        jax.block_until_ready(out)  # compile + drain
        t0 = time.time()
        r = [fn(phit, w) for _ in range(3)]
        jax.block_until_ready(r[-1])
        dt = (time.time() - t0) / 3
        print(f"{name}: {dt*1e3:.2f} ms / {I} iters = "
              f"{dt/I*1e6:.1f} us/iter  (sum0={float(np.asarray(out)[0,0,0]):.3f})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
