"""Is the fleet ring-copy a batched-scatter lowering problem?  A/B:

  A: lax.scan of a VMAPPED scatter update on [B, C, S, 3]
     (what vmap(run_offline) lowers the fleet's ring writes to)
  B: lax.scan of a FLAT scatter on [B*C, S, 3] with robot-offset ids
     (no batch dims on the scatter — the solo-proven form)

Same writes, same volume.  If B is ~solo-fast while A pays ~ring-size
per step, the fleet fix is to flatten the robot axis into the cell index
for the map update ops.

    python experiments/batched_scatter_ab.py
"""

import sys
from functools import partial
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    b_sz, c, s, n, t = 2, 360_000, 100, 768, 50
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, c, (t, b_sz, n)).astype(np.int32))
    slots = jnp.asarray(rs.randint(0, s, (t, b_sz, n)).astype(np.int32))
    vals = jnp.asarray(rs.rand(t, b_sz, n, 3).astype(np.float32))

    ring_b = jnp.zeros((b_sz, c, s, 3), jnp.float32)

    @jax.jit
    def run_vmapped(ring, ids, slots, vals):
        def step(ring, x):
            i, sl, v = x

            def one(r, i1, s1, v1):
                return r.at[i1, s1].set(v1, mode="drop")

            return jax.vmap(one)(ring, i, sl, v), 0.0

        ring, _ = jax.lax.scan(step, ring, (ids, slots, vals))
        return ring

    @jax.jit
    def run_flat(ring, ids, slots, vals):
        # [B*C, S, 3]; robot axis folded into the cell index.
        ring = ring.reshape(b_sz * c, s, 3)
        off = jnp.arange(b_sz, dtype=jnp.int32)[:, None] * c

        def step(ring, x):
            i, sl, v = x
            fi = (i + off).reshape(-1)
            return ring.at[fi, sl.reshape(-1)].set(
                v.reshape(-1, 3), mode="drop"
            ), 0.0

        ring, _ = jax.lax.scan(step, ring, (ids, slots, vals))
        return ring.reshape(b_sz, c, s, 3)

    # C: solo-sized control — one robot's ring, the form the solo SLAM loop
    # runs (in-loop step there is 3.15 ms TOTAL incl. 3 ring scatters).
    ring_1 = jnp.zeros((c, s, 3), jnp.float32)

    @jax.jit
    def run_solo(ring, ids, slots, vals):
        def step(ring, x):
            i, sl, v = x
            return ring.at[i[0], sl[0]].set(v[0], mode="drop"), 0.0

        ring, _ = jax.lax.scan(step, ring, (ids, slots, vals))
        return ring

    # D: flat scatter, no scan, donated operand — one dispatch per step
    # from Python; isolates whether the loop carry is what breaks in-place.
    @partial(jax.jit, donate_argnums=(0,))
    def one_flat(ring, i, sl, v):
        off = jnp.arange(b_sz, dtype=jnp.int32)[:, None] * c
        fi = (i + off).reshape(-1)
        return ring.at[fi, sl.reshape(-1)].set(v.reshape(-1, 3), mode="drop")

    def run_donated(ring, ids, slots, vals):
        ring = ring.reshape(b_sz * c, s, 3)
        for k in range(t):
            ring = one_flat(ring, ids[k], slots[k], vals[k])
        return ring.reshape(b_sz, c, s, 3)

    cases = (
        ("A vmapped scan", lambda: run_vmapped(ring_b, ids, slots, vals)),
        ("B flat scan", lambda: run_flat(ring_b, ids, slots, vals)),
        ("C solo-size scan", lambda: run_solo(ring_1, ids, slots, vals)),
        ("D flat donated dispatch", lambda: run_donated(
            jnp.zeros((b_sz, c, s, 3), jnp.float32), ids, slots, vals)),
    )
    for name, fn in cases:
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        np.asarray(out.reshape(-1)[0])
        compile_s = time.time() - t0
        t0 = time.time()
        out = fn()
        np.asarray(out.reshape(-1)[0])
        dt = (time.time() - t0) / t
        print(f"{name}: {dt*1e3:.2f} ms/step over {t} steps "
              f"(compile {compile_s:.1f}s)")
    a = run_vmapped(ring_b, ids, slots, vals)
    bf = run_flat(ring_b, ids, slots, vals)
    same = bool((np.asarray(a) == np.asarray(bf)).all())
    print(f"identical results: {same}")


if __name__ == "__main__":
    main()
