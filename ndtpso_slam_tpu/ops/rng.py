"""Counter-based RNG with a frozen draw protocol.

The reference seeds particle swarms from Eigen's global ``Array::Random()``
stream (`core.cpp:14,84`) — an unseedable, thread-racy rand() underneath, which
makes bit-level parity testing impossible against it.  This engine instead
fixes its own RNG protocol: Threefry-2x32 (Salmon et al., "Parallel Random
Numbers: As Easy as 1, 2, 3", SC'11) in pure counter mode, implemented twice —
here in vectorized jnp, and in C++ in ``native/golden`` — so the JAX engine and
the CPU golden reference consume *bit-identical* uniform streams and pose
parity can be asserted tightly rather than only statistically (SURVEY.md §7
"RNG parity").

Draw protocol for a PSO solve with P particles, I iterations (each entry is
one threefry counter -> one pair of uniforms):

  pair index                        use
  ------------------------------   -------------------------------------------
  k               (k=0..2)         gbest-init dim k: u = lo word (hi unused)
  3 + j*3 + k                      particle j init, dim k: u = lo word
  3 + P*3 + i*P*3 + j*3 + k        iter i, particle j, dim k: (r1, r2) = pair

Uniforms are u32 -> [0, 1) via ``(bits >> 8) * 2^-24`` — exactly representable
in float32, so float32 and float64 runs see the same real numbers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)
U01_SCALE = float(np.float32(1.0 / (1 << 24)))


def _rotl(x, r):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def threefry2x32(key, c0, c1):
    """Threefry-2x32, 20 rounds. key: (k0, k1) uint32 scalars; c0/c1 uint32
    arrays (broadcastable). Returns (x0, x1) uint32 arrays."""
    k0 = jnp.asarray(key[0], _U32)
    k1 = jnp.asarray(key[1], _U32)
    k2 = k0 ^ k1 ^ _U32(_PARITY)
    ks = (k0, k1, k2)
    x0 = jnp.asarray(c0, _U32) + k0
    x1 = jnp.asarray(c1, _U32) + k1
    for block in range(5):
        rots = _ROT_A if block % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + _U32(block + 1)
    return x0, x1


def uniform_pairs(key, pair_indices, dtype=jnp.float32):
    """Generate uniform [0,1) pairs for an array of pair counters.

    pair_indices: int array [...] of counter values (each yields 2 uniforms).
    Returns (u_lo, u_hi): two dtype arrays shaped like pair_indices.
    """
    ctr = jnp.asarray(pair_indices, _U32)
    x0, x1 = threefry2x32(key, ctr, jnp.zeros_like(ctr))
    scale = jnp.asarray(U01_SCALE, dtype)
    u0 = (x0 >> _U32(8)).astype(dtype) * scale
    u1 = (x1 >> _U32(8)).astype(dtype) * scale
    return u0, u1


def pso_init_pairs(population: int):
    """Pair counters for gbest init ([3]) and population init ([P, 3])."""
    gbest = np.arange(3, dtype=np.uint32)
    pop = 3 + np.arange(population * 3, dtype=np.uint32).reshape(population, 3)
    return gbest, pop


def pso_iter_pair_base(population: int) -> int:
    """First pair counter of iteration 0."""
    return 3 + population * 3


def pso_iter_pairs(i, population: int):
    """Pair counters for iteration i: [P, 3] (each yields (r1, r2))."""
    base = pso_iter_pair_base(population) + i * population * 3
    offs = jnp.arange(population * 3, dtype=jnp.uint32).reshape(population, 3)
    return jnp.asarray(base, jnp.uint32) + offs
