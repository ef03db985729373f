"""Whole-rollout Pallas TPU kernel: one PSO scan-match solve per grid step.

The fused scoring kernel (ops/pallas_score.py) removed the score matrix's HBM
round-trip, but the PSO *loop* still ran in XLA: every iteration dispatched
separate kernels for the Threefry draws, the velocity/position update, the
stencil rebind, the monomial features, and the best-reductions — measured at
~45% of the 0.64 ms/iteration step time at the benchmark operating point
(B=64 solves x 4096 particles x 384 points).

This kernel runs the ENTIRE solve on-chip (reference semantics:
`pso_optimization`, `core.cpp:50-116`, synchronous-gbest variant as in
models/pso.py): grid = (solves,); per grid step the swarm state
(pos/vel/pbest, 8x P f32 rows), the pre-gathered cell stencil, and the score
matrix all live in VMEM for all iterations.  Per-iteration HBM traffic is
ZERO — HBM sees only the per-solve inputs once and the final pose row.

In-kernel pieces, bit-matching their XLA counterparts (for the default
'exp' scoring of the Threefry modes; turbo modes default to exp2 scoring,
which matches only to tolerance — see pso_rollout's exp_mode):

* Threefry-2x32 (20 rounds) on uint32 vectors — the exact frozen draw
  protocol of ops/rng.py (counter = 3 + 3P + i*3P + 3j + k), so the rollout
  consumes the same uniform stream as the jnp solver and the C++ golden.
* Gather-free stencil rebind (models/cost.py:bind_points_local): the
  (2r+1)^2-cell neighborhood of each point, pre-gathered once per solve at
  the anchor pose, is re-selected each iteration by one-hot offset
  arithmetic — 25 fused multiply-adds over an [8, N] table.
* Quadratic-form coefficient build (models/cost.py:_quadform_bound) as
  [1, N]-row arithmetic; the validity mask is folded into the constant
  monomial's coefficient (w14 += (1-mask)*1e9) so masked points score
  exp(-5e8) = 0 exactly and the reduction needs no mask operand.
* Scoring: z[N, P] = w[16, N]^T @ phi[16, P] on the MXU, exp on the VPU,
  and a VPU masked row-sum (measured 12% faster than the matvec reduction
  at these shapes).
* Global-best merge as the first-argmin one-hot select of models/pso.py
  (`_select_min`) — the race-free equivalent of the reference's
  `omp critical` section (`core.cpp:97-104`).

Layout: particle state is [8, P] f32 (rows 0..2 = x, y, theta; rows 3..7 are
sublane padding that is computed but never read); per-point rows are [1, N]
lanes.  N must be a multiple of 128 (the bench shape 384 is); any population
works — sub-128 swarms (e.g. the reference's 50-particle launch budget,
`scan.launch:11-13`) run as masked padding lanes whose cost is pinned to BIG
so they never win a reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ndtpso_slam_tpu.config import MapConfig, PSOConfig, ZERO_DEVIATION

_U32 = jnp.uint32
_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA
_U01 = float(np.float32(1.0 / (1 << 24)))
# Index pairs (a<=b) of the 15 monomials u_a u_b, as in models/cost.py.
_IJ = [(a, b) for a in range(5) for b in range(a, 5)]
_BIG = 1e9  # masked-point coefficient: exp(-BIG/2) == 0 in f32


def _rotl(x, r):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32, 20 rounds, on uint32 arrays (ops/rng.py protocol)."""
    k2 = k0 ^ k1 ^ _U32(_PARITY)
    ks = (k0, k1, k2)
    x0 = c0 + k0
    x1 = c1 + k1
    for block in range(5):
        rots = _ROT_A if block % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + _U32(block + 1)
    return x0, x1


def _uniform_pairs(k0, k1, ctr):
    """(u_lo, u_hi) in [0,1) f32 for a uint32 counter array."""
    x0, x1 = _threefry2x32(k0, k1, ctr, jnp.zeros_like(ctr))
    # Mosaic has no u32->f32 cast; after >>8 the value fits in 24 bits, so
    # the int32 detour is bit-identical to ops/rng.py's direct cast.
    u0 = (x0 >> _U32(8)).astype(jnp.int32).astype(jnp.float32) * jnp.float32(_U01)
    u1 = (x1 >> _U32(8)).astype(jnp.int32).astype(jnp.float32) * jnp.float32(_U01)
    return u0, u1


def _select_min(cost, pos8):
    """First-argmin one-hot select (models/pso.py:_select_min).

    cost: [1, P]; pos8: [8, P].  Returns ([1, 1] min cost, [8, 1] row)."""
    p = cost.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 1)
    m = jnp.min(cost, axis=1, keepdims=True)
    first = jnp.min(jnp.where(cost == m, iota, p), axis=1, keepdims=True)
    onehot = (iota == first).astype(pos8.dtype)  # [1, P]
    return m, jnp.sum(pos8 * onehot, axis=1, keepdims=True)


def _rollout_kernel(
    keys_ref,  # SMEM [B, 2] uint32 (whole array; indexed by program_id)
    guess_ref,  # SMEM [B, 3] f32
    dev_ref,  # SMEM [B, 3] f32
    pts_ref,  # VMEM [1, 8, N] f32: rows px, py, anchor_ix, anchor_iy, valid
    sten_ref,  # VMEM [1, K2, 8, N] f32: rows mx, my, la, lb, lc, built, 0, 0
    out_ref,  # VMEM [1, 8, 128] f32: rows x, y, theta, cost broadcast
    *,
    cfg: PSOConfig,
    half: float,
    inv_cell: float,
    radius: int,
    n_pts: int,
    p_pad: int,
    score_dtype=jnp.float32,
    native_rng: bool = False,
    exp_mode: str = "exp",
    early_exit: int = 0,
):
    # Lane layout: p_pad = population rounded up to the 128-lane register
    # width.  Lanes >= cfg.population are INERT padding — their cost is
    # overwritten with BIG after every score, so they can never win a
    # pbest/gbest reduction; their Threefry counters are junk-but-harmless
    # duplicates (the real lanes' counters match ops/rng.py exactly because
    # iter_base/iter_stride use the REAL population).  This is what lets the
    # kernel run the reference's own 50-particle launch budget
    # (`launch/scan.launch:11-13`) instead of demanding multiples of 128.
    p_real = cfg.population
    p = p_pad
    side = 2 * radius + 1
    k2 = side * side
    f32 = jnp.float32

    bi = pl.program_id(0)
    k0 = keys_ref[bi, 0]
    k1 = keys_ref[bi, 1]

    if native_rng:
        # Turbo path: the TPU's hardware PRNG replaces the parity-frozen
        # Threefry stream (the solve is still deterministic per key — the
        # hardware generator is a seeded counter).  Threefry is ~20 uint32
        # rounds per draw on the VPU and measured as a large slice of the
        # per-iteration time; the native generator is effectively free.
        pltpu.prng_seed(k0, k1)

        def _native_uniform_pair(shape):
            def draw():
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape), _U32)
                return (
                    (bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
                    * jnp.float32(_U01)
                )

            return draw(), draw()

    px = pts_ref[0, 0:1, :]  # [1, N]
    py = pts_ref[0, 1:2, :]
    ax = pts_ref[0, 2:3, :].astype(jnp.int32)
    ay = pts_ref[0, 3:4, :].astype(jnp.int32)
    vmask = pts_ref[0, 4:5, :]

    row8p = jax.lax.broadcasted_iota(jnp.int32, (8, p), 0)
    col8p = jax.lax.broadcasted_iota(jnp.int32, (8, p), 1)
    ctr_base = (3 * col8p + row8p).astype(_U32)  # 3j + k (rows >= 3 unused)
    if p_real == p:
        mask_cost = lambda c: c
    else:
        lane_ok = col8p[0:1, :] < p_real  # [1, P]
        mask_cost = lambda c: jnp.where(lane_ok, c, f32(_BIG))

    def col3(ref):
        """[8, 1] f32 column from a 3-scalar SMEM row (rows 3..7 zero)."""
        r = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        return jnp.where(
            r == 0, ref[bi, 0], jnp.where(r == 1, ref[bi, 1],
                                          jnp.where(r == 2, ref[bi, 2],
                                                    f32(0)))
        ).astype(f32)

    guess8 = col3(guess_ref)  # [8, 1]
    dev8 = col3(dev_ref)
    zd = ZERO_DEVIATION
    zrow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    zdev8 = jnp.where(
        zrow == 0, f32(zd[0]), jnp.where(zrow == 1, f32(zd[1]),
                                         jnp.where(zrow == 2, f32(zd[2]), f32(0)))
    )

    def score(pos8, bind8):
        """Cost [1, P] of [8, P] particle poses, stencil-rebound at bind8
        ([8, 1] pose).  Mirrors bind_points_local + bound_cost."""
        bx = bind8[0:1, 0:1]  # [1, 1]
        by = bind8[1:2, 0:1]
        bth = bind8[2:3, 0:1]
        c0 = jnp.cos(bth)
        s0 = jnp.sin(bth)
        # Transform + bin at the binding pose (ops/geometry.py:cell_coords).
        rx = px * c0 - py * s0  # [1, N]
        ry = px * s0 + py * c0
        qx = rx + bx
        qy = ry + by
        inb = (qx > -half) & (qx < half) & (qy > -half) & (qy < half)
        ix = jnp.floor((qx + half) * inv_cell).astype(jnp.int32)
        iy = jnp.floor((qy + half) * inv_cell).astype(jnp.int32)
        di = ix - ax
        dj = iy - ay
        in_st = (jnp.abs(di) <= radius) & (jnp.abs(dj) <= radius)
        kk = (dj + radius) * side + (di + radius)
        # One-hot stencil select: 25 FMAs over the [8, N] per-offset table.
        acc = jnp.zeros((8, n_pts), f32)
        for k in range(k2):
            sel = ((kk == k) & in_st).astype(f32)  # [1, N]
            acc = acc + sel * sten_ref[0, k]
        mx, my = acc[0:1], acc[1:2]
        la, lb, lc = acc[2:3], acc[3:4], acc[4:5]
        built = acc[5:6]
        mask = built * inb.astype(f32) * vmask  # [1, N] in {0, 1}
        # Quadratic-form coefficients (models/cost.py:_quadform_bound).
        gx = rx + bx - mx
        gy = ry + by - my
        one = jnp.ones_like(gx)
        zero = jnp.zeros_like(gx)
        brx = (rx, -ry, one, zero, gx)  # B-matrix x rows, each [1, N]
        bry = (ry, rx, zero, one, gy)
        lbx = tuple(la * brx[a] + lb * bry[a] for a in range(5))
        lby = tuple(lb * brx[a] + lc * bry[a] for a in range(5))
        w_rows = []
        for a, b in _IJ:
            m_ab = brx[a] * lbx[b] + bry[a] * lby[b]
            w_rows.append(m_ab if a == b else 2.0 * m_ab)
        # Fold the mask into the constant monomial (u4*u4 == 1, row 14):
        # masked points get z = BIG -> score exp(-BIG/2) == 0 exactly.
        w_rows = [w * mask for w in w_rows]
        w_rows[14] = w_rows[14] + (1.0 - mask) * f32(_BIG)
        w_rows.append(jnp.zeros_like(gx))  # pad feature 15
        wmat = jnp.concatenate(w_rows, axis=0)  # [16, N]
        # Monomial features of poses relative to the binding pose.
        dth = pos8[2:3, :] - bth  # [1, P]
        u = (
            jnp.cos(dth) - 1.0,
            jnp.sin(dth),
            pos8[0:1, :] - bx,
            pos8[1:2, :] - by,
            jnp.ones_like(dth),
        )
        phi_rows = [u[a] * u[b] for a, b in _IJ]
        phi_rows.append(jnp.zeros_like(dth))
        phimat = jnp.concatenate(phi_rows, axis=0)  # [16, P]
        # bf16 operands quadruple MXU throughput at K=16 depth; accumulation
        # stays f32.  The masked-point BIG coefficient is exact in bf16
        # (w rows are zero when masked, so no rounding mixes with it).
        z = jax.lax.dot_general(
            wmat.astype(score_dtype), phimat.astype(score_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [N, P]
        zc = jnp.maximum(z, 0.0)
        if exp_mode == "exp2":
            # exp(-z/2) == 2^(-z/(2 ln 2)): one extra multiply, but lets the
            # hardware skip the ln2-range-reduction step of exp — the
            # experiment knob of experiments/exp_lever.py (the [N, P]
            # transcendental is the measured VPU bottleneck of this kernel).
            s = jax.lax.exp2(zc * f32(-0.5 / np.log(2.0)))
        elif exp_mode == "approx":
            # Schraudolph 2^x: write x into the float32 exponent field with
            # integer arithmetic — multiply/add/convert/bitcast only, no
            # transcendental at all.  ~2% worst-case relative score error
            # (bias constant tuned for min RMS); the score sum and the PSO
            # ranking tolerate it (measured: see experiments/exp_lever.py).
            x = jnp.maximum(zc * f32(-0.5 / np.log(2.0)), f32(-126.0))
            i = (x * f32(1 << 23)).astype(jnp.int32) + jnp.int32(
                127 * (1 << 23) - 366393
            )
            s = jax.lax.bitcast_convert_type(i, jnp.float32)
        else:
            s = jnp.exp(-0.5 * zc)
        return -jnp.sum(s, axis=0, keepdims=True)  # [1, P]

    # --- init (core.cpp:53-69 semantics, ops/rng.py counters) ---
    if native_rng:
        # Only lane 0 of g_pos is ever read (mixed into gmix below), so the
        # draw need not be lane-replicated.
        u_g, u_p = _native_uniform_pair((8, p))
    else:
        # gbest seed: counters k = row (same for every lane -> broadcast).
        u_g, _ = _uniform_pairs(k0, k1, row8p.astype(_U32))
        u_p, _ = _uniform_pairs(k0, k1, _U32(3) + ctr_base)
    g_pos = guess8 + (2.0 * u_g - 1.0) * zdev8  # [8, P]
    pos = guess8 + (2.0 * u_p - 1.0) * dev8  # [8, P]
    # This Mosaic toolchain crashes ("limits <= dim") when relayouting values
    # reduced/extracted from lane-REPLICATED vectors, which the seed pose is
    # (its draw counters vary only by row).  Workaround: mix the seed into
    # lane 0 of the non-uniform population array, score that, and extract
    # lane 0 by one-hot reduction — the layout the compiler handles.
    gmix = jnp.where(col8p == 0, g_pos, pos)
    cost = mask_cost(score(pos, guess8))  # [1, P]
    cmix = score(gmix, guess8)  # only lane 0 (always real) is read
    oh0 = (jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) == 0).astype(f32)
    g_cost = jnp.sum(cmix * oh0, axis=1, keepdims=True)  # [1, 1]
    g_pos1 = jnp.sum(gmix * oh0, axis=1, keepdims=True)  # [8, 1]
    bc, bp = _select_min(cost, pos)
    imp = bc < g_cost
    gbest = jnp.where(imp, bp, g_pos1)  # [8, 1]
    gcost = jnp.where(imp, bc, g_cost)  # [1, 1]

    c1 = f32(cfg.c1)
    c2 = f32(cfg.c2)
    iter_base = _U32(3 + 3 * p_real)
    iter_stride = _U32(3 * p_real)

    def body(i, carry):
        pos, vel, pbest, pbest_cost, gbest, gcost, w = carry
        if native_rng:
            r1, r2 = _native_uniform_pair((8, p))
        else:
            ctr = iter_base + i.astype(_U32) * iter_stride + ctr_base
            r1, r2 = _uniform_pairs(k0, k1, ctr)
        vel = w * vel + c1 * r1 * (pbest - pos) + c2 * r2 * (gbest - pos)
        pos = pos + vel
        cost = mask_cost(score(pos, gbest))
        better = cost < pbest_cost  # [1, P]
        pbest = jnp.where(better, pos, pbest)
        pbest_cost = jnp.where(better, cost, pbest_cost)
        bc, bp = _select_min(pbest_cost, pbest)
        gimp = bc < gcost
        gbest = jnp.where(gimp, bp, gbest)
        gcost = jnp.where(gimp, bc, gcost)
        return pos, vel, pbest, pbest_cost, gbest, gcost, w * f32(cfg.w_damping)

    init = (pos, jnp.zeros_like(pos), pos, cost, gbest, gcost, f32(cfg.w))
    if early_exit > 0:
        # Converged-swarm early exit: the reference's fixed iteration count
        # (`core.cpp:78`) becomes a CAP — the loop stops once the global
        # best has not improved for `early_exit` consecutive iterations.
        # The roofline bottleneck is the [N, P] exp per iteration, so every
        # skipped iteration is pure throughput; skipped iterations also
        # skip their Threefry counters deterministically (the draw stream
        # is counter-indexed by i), so a given solve is still exactly
        # reproducible per key.  NOT a parity mode: solves that would have
        # improved after a stall return the stalled best.
        def ee_cond(carry):
            i, stale, *_ = carry
            # Mosaic scalarizes int32 [1,1] extractions only (not bool),
            # so the stale counter stays an int32 [1, 1] vector.
            return jnp.logical_and(i < cfg.iterations,
                                   stale[0, 0] < early_exit)

        def ee_body(carry):
            i, stale, inner = carry
            gcost_before = inner[5]
            inner = body(i, inner)
            imp = (inner[5] < gcost_before).astype(jnp.int32)  # [1, 1]
            stale = jnp.where(imp > 0, 0, stale + 1)
            return i + 1, stale, inner

        _, _, (_, _, _, _, gbest, gcost, _) = jax.lax.while_loop(
            ee_cond, ee_body,
            (jnp.int32(0), jnp.zeros((1, 1), jnp.int32), init),
        )
    else:
        *_, gbest, gcost, _ = jax.lax.fori_loop(0, cfg.iterations, body, init)

    res_row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    res8 = jnp.where(res_row < 3, gbest, gcost)  # rows 3..7 = cost
    out_ref[0] = jnp.broadcast_to(res8, (8, 128))


def pack_rollout_inputs(nbr, points):
    """Repack a NeighborhoodBind + points into the kernel's row layouts.

    nbr fields are [N, K2, ...] (models/cost.py:bind_neighborhood); the kernel
    wants lanes-on-N: stencil [K2, 8, N] and points [8, N].  Pure transposes,
    run once per solve in XLA.
    """
    f32 = jnp.float32
    n = points.shape[0]
    mean = jnp.moveaxis(nbr.mean.astype(f32), 0, -1)  # [K2, 2, N]
    icov = jnp.moveaxis(nbr.icov.astype(f32), 0, -1)  # [K2, 3, N]
    built = jnp.moveaxis(nbr.built.astype(f32), 0, -1)[:, None, :]  # [K2, 1, N]
    k2 = mean.shape[0]
    sten = jnp.concatenate(
        [mean, icov, built, jnp.zeros((k2, 2, n), f32)], axis=1
    )  # [K2, 8, N]
    pts = jnp.stack(
        [
            points[:, 0].astype(f32),
            points[:, 1].astype(f32),
            nbr.anchor_ix.astype(f32),
            nbr.anchor_iy.astype(f32),
            nbr.valid.astype(f32),
            jnp.zeros((n,), f32),
            jnp.zeros((n,), f32),
            jnp.zeros((n,), f32),
        ],
        axis=0,
    )  # [8, N]
    return sten, pts


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "map_cfg", "radius", "interpret", "score_dtype", "rng_mode",
        "grid_block", "exp_mode", "early_exit",
    ),
)
def pso_rollout(
    keys: jnp.ndarray,  # [B, 2] uint32
    guesses: jnp.ndarray,  # [B, 3] f32
    deviations: jnp.ndarray,  # [B, 3] f32
    sten: jnp.ndarray,  # [B, K2, 8, N] f32 (pack_rollout_inputs)
    pts: jnp.ndarray,  # [B, 8, N] f32
    cfg: PSOConfig,
    map_cfg: MapConfig,
    radius: int = 2,
    interpret: bool = False,
    score_dtype: str = "f32",
    rng_mode: str = "threefry",
    grid_block: int | None = None,
    exp_mode: str | None = None,
    early_exit: int = 0,
):
    """B independent whole-solve PSO rollouts.  Returns (pose [B,3], cost [B]).

    ``early_exit=K`` (0 = off) stops a solve once its global best has not
    improved for K consecutive iterations — `cfg.iterations` becomes a cap
    (the reference's fixed budget, `core.cpp:78`, is the K=0 behavior).
    Deterministic per key; not a parity mode.

    ``score_dtype='bf16'`` runs the [16,N]x[16,P] scoring matmul with bf16
    operands (f32 accumulate) — ~4x MXU rate, cost perturbation O(0.4%)
    relative; the f32 path is the bit-parity one.

    ``rng_mode='native'`` (turbo) replaces the parity-frozen Threefry-2x32
    draws with the TPU's hardware PRNG (seeded per solve from the key):
    same PSO distribution, not the same stream as the C++ golden.
    Determinism caveat: the turbo stream is reproducible per key only for a
    given TPU generation + Mosaic toolchain — the hardware generator's bit
    stream is not a stable cross-version contract the way Threefry is.  Use
    turbo for serving throughput; use 'rollout' (Threefry) for parity gates
    and anything that must reproduce across upgrades.

    ``grid_block=G`` splits the B-step pallas grid into ceil(B/G) sequential
    kernel launches of at most G steps each (`lax.map` over blocks; per-solve
    results are identical — solves are independent grid steps either way).
    This exists because the current TPU toolchain reproducibly WEDGES at
    readback when a bf16-scoring rollout grid has >= 128 steps (B=64 fine,
    B=128 hangs, f32 fine at any B — see
    experiments/bisect_bf16/README.md); blocks of 64 keep the bf16 MXU win
    at arbitrary batch sizes.  Per-solve work is unchanged, so overhead is
    one kernel launch per block (~10 us) against ~25 ms/block of compute.

    ``exp_mode`` (None = per-rng default): 'exp' scores with jnp.exp's
    exact twin (bit-matching the XLA cost paths) and is the default for
    the Threefry parity modes; 'exp2' folds the 1/ln2 into the argument
    and uses the hardware 2^x (+2.6% measured, scores equal only to ~1 ulp
    of the extra multiply — PSO outcomes measured bit-identical at the
    bench operating point) and is the default for the turbo modes, which
    already trade the cross-version-stable stream away; 'approx' is the
    Schraudolph bitcast 2^x (knob, experiments/exp_lever.py)."""
    if exp_mode is None:
        exp_mode = "exp2" if rng_mode == "native" else "exp"
    b, k2, _, n = sten.shape
    if grid_block is not None and b > grid_block:
        nb = -(-b // grid_block)
        pad = nb * grid_block - b
        rsh = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
        ).reshape((nb, grid_block) + x.shape[1:]) if pad else x.reshape(
            (nb, grid_block) + x.shape[1:]
        )
        block = functools.partial(
            pso_rollout, cfg=cfg, map_cfg=map_cfg, radius=radius,
            interpret=interpret, score_dtype=score_dtype, rng_mode=rng_mode,
            grid_block=None, exp_mode=exp_mode, early_exit=early_exit,
        )
        poses, costs = jax.lax.map(
            lambda a: block(a[0], a[1], a[2], a[3], a[4]),
            (rsh(keys), rsh(guesses), rsh(deviations), rsh(sten), rsh(pts)),
        )
        return (
            poses.reshape(nb * grid_block, 3)[:b],
            costs.reshape(nb * grid_block)[:b],
        )
    # Populations below the 128-lane width run as masked padding lanes inside
    # the kernel (see _rollout_kernel) — the reference's 50-particle launch
    # budget is a first-class citizen here, not an error.
    p_pad = -(-cfg.population // 128) * 128
    assert n % 128 == 0, f"padded beam count {n} must be lane-aligned (128)"
    assert k2 == (2 * radius + 1) ** 2
    kern = functools.partial(
        _rollout_kernel,
        cfg=cfg,
        half=map_cfg.size_m / 2.0,
        inv_cell=1.0 / map_cfg.cell_side_m,
        radius=radius,
        n_pts=n,
        p_pad=p_pad,
        score_dtype=jnp.bfloat16 if score_dtype == "bf16" else jnp.float32,
        native_rng=rng_mode == "native",
        exp_mode=exp_mode,
        early_exit=early_exit,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, 8, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, k2, 8, n), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (cfg.iterations + 2) * p_pad * n * 16,
            bytes_accessed=4 * b * (k2 * 8 * n + 8 * n + 8 * 128),
            transcendentals=b * (cfg.iterations + 2) * p_pad * n,
        ),
    )(
        keys.astype(jnp.uint32),
        guesses.astype(jnp.float32),
        deviations.astype(jnp.float32),
        pts,
        sten,
    )
    return out[:, 0:3, 0], out[:, 3, 0]


def _rollout_local_kernel(
    keys_ref,  # SMEM [B, 2] uint32 (whole array; indexed by program_id)
    guess_ref,  # SMEM [B, 3] f32
    dev_ref,  # SMEM [B, 3] f32
    ptsc_ref,  # VMEM [1, N, 8] f32 columns: px, py, anchor_ix, anchor_iy, valid
    stenc_ref,  # VMEM [1, K2, N, 8] f32 cols: mx, my, la, lb, lc, pen, 0, 0
    out_ref,  # VMEM [1, 8, 128] f32: rows x, y, theta, cost broadcast
    *,
    cfg: PSOConfig,
    half: float,
    inv_cell: float,
    radius: int,
    n_pts: int,
    p_pad: int,
    native_rng: bool = False,
    exp_mode: str = "exp",
    early_exit: int = 0,
):
    """Whole-solve PSO with PER-PARTICLE exact stencil re-binning.

    The flagship `_rollout_kernel` freezes correspondences at the incumbent
    gbest each iteration — measured to lose sequential-SLAM tracking at the
    reference's 0.5 m deployment cell side (1.24-1.46 m vs the 0.35 m gate:
    stale quadratics extrapolated past thin cells).  This kernel instead
    re-bins every point *per particle* per evaluation — the in-kernel twin of
    `models/cost.py:stencil_exact_cost` (the shipped XLA `local_exact` path),
    so its cost equals `ndt_cost` whenever points stay within ±radius cells
    of their anchors, and the whole solve still runs in VMEM with zero
    per-iteration HBM traffic.

    Layout is transposed relative to the frozen kernel: arrays are [N, P]
    (points on sublanes, particles on lanes), because every quantity is now
    per-(point, particle).  The stencil table arrives offset-major
    ([K2, N, 8], `pack_rollout_local_inputs`) and the select iterates the
    25 offsets with a carry of just TWO [N, P] arrays (the quadratic-form
    accumulator and the penalty accumulator): per offset, the [N, 1] stat
    columns broadcast across particle lanes into ~14 VPU FMAs.  The loop
    ships FULLY UNROLLED (`fori_loop(..., unroll=25)`; Mosaic supports
    only unroll=1 or full) under a 64 MB scoped-vmem cap — measured +7%
    over the rolled form (665 vs 621 full-scale scans/s).  Two rejected
    alternatives, both measured: a 6-accumulator stat-select carry (568 —
    the wide carry costs more than the saved FMAs), and an unrolled
    stat-select draft whose ~50 live [N, P] temporaries blew the scoped-
    vmem stack at ANY cap (23 MB demanded at the 16 MB default, 47 at
    32 — the demand scales with the cap).  No matmul anywhere: the math
    is elementwise per (point, particle); the MXU has no role here.

    Exactness: z accumulates sel·quadform_k (adds exact zeros for
    unselected offsets — stats are zeroed at pack time so no NaN/inf can
    leak); the penalty accumulates separately (pen_k − BIG is exact in f32
    for pen_k ∈ {0, BIG}) and is added once at the end, so built-cell
    scores never round through BIG.  Unbuilt/out-of-stencil selections
    end at z+BIG -> exp == 0 exactly, `stencil_exact_cost`'s convention.

    PSO scaffolding (Threefry counters, init, synchronous gbest loop,
    masked padding lanes) is the frozen kernel's, verbatim.
    """
    p_real = cfg.population
    p = p_pad
    side = 2 * radius + 1
    k2 = side * side
    f32 = jnp.float32

    bi = pl.program_id(0)
    k0 = keys_ref[bi, 0]
    k1 = keys_ref[bi, 1]

    if native_rng:
        pltpu.prng_seed(k0, k1)

        def _native_uniform_pair(shape):
            def draw():
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape), _U32)
                return (
                    (bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
                    * jnp.float32(_U01)
                )

            return draw(), draw()

    pxc = ptsc_ref[0, :, 0:1]  # [N, 1]
    pyc = ptsc_ref[0, :, 1:2]
    axc = ptsc_ref[0, :, 2:3].astype(jnp.int32)
    ayc = ptsc_ref[0, :, 3:4].astype(jnp.int32)
    vmc = ptsc_ref[0, :, 4:5]

    row8p = jax.lax.broadcasted_iota(jnp.int32, (8, p), 0)
    col8p = jax.lax.broadcasted_iota(jnp.int32, (8, p), 1)
    ctr_base = (3 * col8p + row8p).astype(_U32)
    if p_real == p:
        mask_cost = lambda c: c
    else:
        lane_ok = col8p[0:1, :] < p_real  # [1, P]
        mask_cost = lambda c: jnp.where(lane_ok, c, f32(_BIG))

    def col3(ref):
        r = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        return jnp.where(
            r == 0, ref[bi, 0], jnp.where(r == 1, ref[bi, 1],
                                          jnp.where(r == 2, ref[bi, 2],
                                                    f32(0)))
        ).astype(f32)

    guess8 = col3(guess_ref)  # [8, 1]
    dev8 = col3(dev_ref)
    zd = ZERO_DEVIATION
    zrow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    zdev8 = jnp.where(
        zrow == 0, f32(zd[0]), jnp.where(zrow == 1, f32(zd[1]),
                                         jnp.where(zrow == 2, f32(zd[2]), f32(0)))
    )

    def score(pos8, _bind8):
        """Cost [1, P] of [8, P] poses — per-particle rebind, bind unused."""
        tx = pos8[0:1, :]  # [1, P]
        ty = pos8[1:2, :]
        th = pos8[2:3, :]
        c0 = jnp.cos(th)
        s0 = jnp.sin(th)
        qx = pxc * c0 - pyc * s0 + tx  # [N, P]
        qy = pxc * s0 + pyc * c0 + ty
        inb = (qx > -half) & (qx < half) & (qy > -half) & (qy < half)
        ix = jnp.floor((qx + half) * inv_cell).astype(jnp.int32)
        iy = jnp.floor((qy + half) * inv_cell).astype(jnp.int32)
        di = ix - axc
        dj = iy - ayc
        in_st = (jnp.abs(di) <= radius) & (jnp.abs(dj) <= radius)
        # Out-of-stencil points get kk = -1: no offset ever matches, so the
        # penalty keeps its BIG initializer -> score 0 (stencil_exact_cost's
        # out-of-stencil convention) and in_st need not stay live.
        kk = jnp.where(in_st, (dj + radius) * side + (di + radius), -1)

        def sel_body(k, carry):
            # 2-carry per-offset quadform form: measured FASTER than the
            # 6-accumulator stat-select (621 vs 568 scans/s full-scale) —
            # the wide loop carry costs more than the extra FMAs.
            z, pen = carry
            blk = stenc_ref[0, k]  # [N, 8] stat columns of offset k
            sel = (kk == k).astype(f32)  # [N, P]
            dx = qx - blk[:, 0:1]
            dy = qy - blk[:, 1:2]
            # gaussian.quadform, same operation order; NO clamp (the exact
            # path never extrapolates a frozen quadratic — ndt_score).
            quad = (
                blk[:, 2:3] * dx * dx
                + 2.0 * blk[:, 3:4] * dx * dy
                + blk[:, 4:5] * dy * dy
            )
            # sel is one-hot across k: adds are exact zeros elsewhere; the
            # penalty accumulates separately so built-cell scores never
            # round through BIG.
            z = z + sel * quad
            pen = pen + sel * (blk[:, 5:6] - f32(_BIG))
            return z, pen

        z, pen = jax.lax.fori_loop(
            0, k2, sel_body,
            (jnp.zeros((n_pts, p), f32), jnp.full((n_pts, p), f32(_BIG))),
            unroll=25,
        )
        z = z + pen
        if exp_mode == "exp2":
            s = jax.lax.exp2(z * f32(-0.5 / np.log(2.0)))
        else:
            s = jnp.exp(-0.5 * z)
        m = inb.astype(f32) * vmc  # [N, P] · [N, 1] valid broadcast
        return -jnp.sum(s * m, axis=0, keepdims=True)  # [1, P]

    # --- init (identical scaffolding to _rollout_kernel) ---
    if native_rng:
        u_g, u_p = _native_uniform_pair((8, p))
    else:
        u_g, _ = _uniform_pairs(k0, k1, row8p.astype(_U32))
        u_p, _ = _uniform_pairs(k0, k1, _U32(3) + ctr_base)
    g_pos = guess8 + (2.0 * u_g - 1.0) * zdev8  # [8, P]
    pos = guess8 + (2.0 * u_p - 1.0) * dev8  # [8, P]
    gmix = jnp.where(col8p == 0, g_pos, pos)
    cost = mask_cost(score(pos, guess8))  # [1, P]
    cmix = score(gmix, guess8)
    oh0 = (jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) == 0).astype(f32)
    g_cost = jnp.sum(cmix * oh0, axis=1, keepdims=True)  # [1, 1]
    g_pos1 = jnp.sum(gmix * oh0, axis=1, keepdims=True)  # [8, 1]
    bc, bp = _select_min(cost, pos)
    imp = bc < g_cost
    gbest = jnp.where(imp, bp, g_pos1)
    gcost = jnp.where(imp, bc, g_cost)

    c1 = f32(cfg.c1)
    c2 = f32(cfg.c2)
    iter_base = _U32(3 + 3 * p_real)
    iter_stride = _U32(3 * p_real)

    def body(i, carry):
        pos, vel, pbest, pbest_cost, gbest, gcost, w = carry
        if native_rng:
            r1, r2 = _native_uniform_pair((8, p))
        else:
            ctr = iter_base + i.astype(_U32) * iter_stride + ctr_base
            r1, r2 = _uniform_pairs(k0, k1, ctr)
        vel = w * vel + c1 * r1 * (pbest - pos) + c2 * r2 * (gbest - pos)
        pos = pos + vel
        cost = mask_cost(score(pos, gbest))
        better = cost < pbest_cost
        pbest = jnp.where(better, pos, pbest)
        pbest_cost = jnp.where(better, cost, pbest_cost)
        bc, bp = _select_min(pbest_cost, pbest)
        gimp = bc < gcost
        gbest = jnp.where(gimp, bp, gbest)
        gcost = jnp.where(gimp, bc, gcost)
        return pos, vel, pbest, pbest_cost, gbest, gcost, w * f32(cfg.w_damping)

    init = (pos, jnp.zeros_like(pos), pos, cost, gbest, gcost, f32(cfg.w))
    if early_exit > 0:
        # Same converged-swarm early exit as the frozen kernel: the fixed
        # iteration budget becomes a cap; stale counter as int32 [1, 1]
        # (Mosaic scalarizes int32 extractions only).
        def ee_cond(carry):
            i, stale, *_ = carry
            return jnp.logical_and(i < cfg.iterations,
                                   stale[0, 0] < early_exit)

        def ee_body(carry):
            i, stale, inner = carry
            gcost_before = inner[5]
            inner = body(i, inner)
            imp = (inner[5] < gcost_before).astype(jnp.int32)
            stale = jnp.where(imp > 0, 0, stale + 1)
            return i + 1, stale, inner

        _, _, (_, _, _, _, gbest, gcost, _) = jax.lax.while_loop(
            ee_cond, ee_body,
            (jnp.int32(0), jnp.zeros((1, 1), jnp.int32), init),
        )
    else:
        *_, gbest, gcost, _ = jax.lax.fori_loop(0, cfg.iterations, body, init)

    res_row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    res8 = jnp.where(res_row < 3, gbest, gcost)
    out_ref[0] = jnp.broadcast_to(res8, (8, 128))


def pack_rollout_local_inputs(nbr, points):
    """Repack a NeighborhoodBind + points into the LOCAL kernel's
    column-oriented layouts: points [N, 8] and stencil [N, K2*6] (per
    offset k: mx, my, la, lb, lc, pen).  Stats of unbuilt/out-of-grid
    neighbors are ZEROED (their rolled-gather lanes hold wrapped garbage,
    possibly inf/nan inverse covariances) and their penalty column is BIG,
    so the kernel's additive-penalty score is exactly 0 there with no NaN
    propagation.  Pure transposes/elementwise, run once per solve in XLA."""
    f32 = jnp.float32
    n = points.shape[0]
    k2 = nbr.mean.shape[1]
    built = nbr.built[..., None]  # [N, K2, 1] bool
    # True select, not multiplication: unbuilt lanes can hold inf/NaN stats
    # (regularized_inverse's degenerate-cell convention) and 0*inf = NaN
    # would leak through the kernel's additive select.
    sten = jnp.moveaxis(
        jnp.concatenate(
            [
                jnp.where(built, nbr.mean.astype(f32), 0.0),
                jnp.where(built, nbr.icov.astype(f32), 0.0),
                jnp.where(built, 0.0, f32(_BIG)),
                jnp.zeros((n, k2, 2), f32),
            ],
            axis=-1,
        ),
        0, 1,
    )  # [K2, N, 8]
    pts = jnp.stack(
        [
            points[:, 0].astype(f32),
            points[:, 1].astype(f32),
            nbr.anchor_ix.astype(f32),
            nbr.anchor_iy.astype(f32),
            nbr.valid.astype(f32),
            jnp.zeros((n,), f32),
            jnp.zeros((n,), f32),
            jnp.zeros((n,), f32),
        ],
        axis=-1,
    )  # [N, 8]
    return sten, pts


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "map_cfg", "radius", "interpret", "rng_mode", "grid_block",
        "exp_mode", "early_exit",
    ),
)
def pso_rollout_local(
    keys: jnp.ndarray,  # [B, 2] uint32
    guesses: jnp.ndarray,  # [B, 3] f32
    deviations: jnp.ndarray,  # [B, 3] f32
    sten: jnp.ndarray,  # [B, K2, N, 8] f32 (pack_rollout_local_inputs)
    pts: jnp.ndarray,  # [B, N, 8] f32
    cfg: PSOConfig,
    map_cfg: MapConfig,
    radius: int = 2,
    interpret: bool = False,
    rng_mode: str = "threefry",
    grid_block: int | None = None,
    exp_mode: str | None = None,
    early_exit: int = 0,
):
    """B whole-solve PSO rollouts with per-particle exact stencil rebinding
    (`_rollout_local_kernel`) — the kernel for the reference's own
    sequential deployment (`scan.launch`, 0.5 m cells), where the frozen
    binding fails the accuracy gate.  Returns (pose [B, 3], cost [B]).

    Same RNG modes/grid blocking contract as :func:`pso_rollout`; there is
    no bf16 mode (scoring is elementwise VPU work — no matmul to feed).
    ``exp_mode=None`` resolves like pso_rollout: 'exp' (matches the XLA
    `local_exact` path to float-associativity tolerance) for Threefry,
    'exp2' for turbo."""
    if exp_mode is None:
        exp_mode = "exp2" if rng_mode == "native" else "exp"
    b, k2_in, n, _ = sten.shape
    if grid_block is not None and b > grid_block:
        nb = -(-b // grid_block)
        pad = nb * grid_block - b
        rsh = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
        ).reshape((nb, grid_block) + x.shape[1:]) if pad else x.reshape(
            (nb, grid_block) + x.shape[1:]
        )
        block = functools.partial(
            pso_rollout_local, cfg=cfg, map_cfg=map_cfg, radius=radius,
            interpret=interpret, rng_mode=rng_mode, grid_block=None,
            exp_mode=exp_mode, early_exit=early_exit,
        )
        poses, costs = jax.lax.map(
            lambda a: block(a[0], a[1], a[2], a[3], a[4]),
            (rsh(keys), rsh(guesses), rsh(deviations), rsh(sten), rsh(pts)),
        )
        return (
            poses.reshape(nb * grid_block, 3)[:b],
            costs.reshape(nb * grid_block)[:b],
        )
    p_pad = -(-cfg.population // 128) * 128
    k2 = (2 * radius + 1) ** 2
    assert n % 128 == 0, f"padded beam count {n} must be lane-aligned (128)"
    assert k2_in == k2
    kern = functools.partial(
        _rollout_local_kernel,
        cfg=cfg,
        half=map_cfg.size_m / 2.0,
        inv_cell=1.0 / map_cfg.cell_side_m,
        radius=radius,
        n_pts=n,
        p_pad=p_pad,
        native_rng=rng_mode == "native",
        exp_mode=exp_mode,
        early_exit=early_exit,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, n, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, k2, n, 8), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (cfg.iterations + 2) * p_pad * n * (14 * k2 + 30),
            bytes_accessed=4 * b * (k2 * n * 8 + n * 8 + 8 * 128),
            transcendentals=b * (cfg.iterations + 2) * p_pad * n,
        ),
    )(
        keys.astype(jnp.uint32),
        guesses.astype(jnp.float32),
        deviations.astype(jnp.float32),
        pts,
        sten,
    )
    return out[:, 0:3, 0], out[:, 3, 0]
