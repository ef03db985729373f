"""NumPy golden oracle of the reference semantics.

A deliberately literal, slow reimplementation of the reference's per-cell
window statistics (`ndtcell.cpp`), frame binning (`ndtframe.cpp:240-249`),
cost (`core.cpp:26-48`) and synchronous-batch PSO, in float64 with raw
per-slot point buffers — exactly the data layout the C++ uses, so it
cross-validates the engine's dense second-moment reformulation.  Includes an
independent pure-NumPy Threefry so the engine's RNG is checked against a
second implementation.
"""

from __future__ import annotations

import numpy as np

ROT_A = (13, 15, 26, 6)
ROT_B = (17, 29, 16, 24)


def threefry2x32_np(key, c0, c1):
    """Pure-NumPy Threefry-2x32 (20 rounds), mirrors ops/rng.py."""
    u32 = np.uint32
    k0, k1 = u32(key[0]), u32(key[1])
    k2 = u32(k0 ^ k1 ^ u32(0x1BD11BDA))
    ks = (k0, k1, k2)
    x0 = (np.asarray(c0, np.uint64) + np.uint64(k0)).astype(u32)
    x1 = (np.asarray(c1, np.uint64) + np.uint64(k1)).astype(u32)

    def rotl(x, r):
        x = np.asarray(x, np.uint64)
        return (((x << np.uint64(r)) | (x >> np.uint64(32 - r))) & np.uint64(0xFFFFFFFF)).astype(u32)

    for block in range(5):
        rots = ROT_A if block % 2 == 0 else ROT_B
        for r in rots:
            x0 = (x0.astype(np.uint64) + x1).astype(u32)
            x1 = rotl(x1, r) ^ x0
        x0 = (x0.astype(np.uint64) + ks[(block + 1) % 3]).astype(u32)
        x1 = (x1.astype(np.uint64) + ks[(block + 2) % 3] + np.uint64(block + 1)).astype(u32)
    return x0, x1


def uniform_pairs_np(key, pair_indices):
    ctr = np.asarray(pair_indices, np.uint32)
    x0, x1 = threefry2x32_np(key, ctr, np.zeros_like(ctr))
    return (x0 >> 8) / float(1 << 24), (x1 >> 8) / float(1 << 24)


class OracleCell:
    """Literal `NDTCell` (`ndtcell.cpp:5-111`) with raw point slots."""

    def __init__(self, slots=100, capacity=50):
        self.S, self.cap = slots, capacity
        self.slot_sum = np.zeros((slots, 2))
        self.slot_count = np.zeros(slots, np.int64)
        self.slot_cov = np.zeros((slots, 2, 2))
        self.points = [[] for _ in range(slots)]
        self.g_sum = np.zeros(2)
        self.g_count = 0
        self.g_cov = np.zeros((2, 2))
        self.cur_sum = np.zeros(2)
        self.cur_count = 0
        self.idx = 0
        self.mean = np.zeros(2)
        self.inv_cov = np.zeros((2, 2))
        self.built = False
        self.created = False

    def add_point(self, p):
        if self.cur_count == 0:
            self.points[self.idx] = []
        self.cur_count += 1
        self.cur_sum = self.cur_sum + p
        self.points[self.idx].append(np.array(p, float))
        self.created = True
        self.built = False

    def build(self):
        self.g_sum = self.g_sum + self.cur_sum - self.slot_sum[self.idx]
        self.slot_sum[self.idx] = self.cur_sum
        self.g_count = self.g_count + self.cur_count - self.slot_count[self.idx]
        self.slot_count[self.idx] = self.cur_count
        if self.g_count > 2:
            self.mean = self.g_sum / self.g_count
            cov = np.zeros((2, 2))
            for pt in self.points[self.idx]:
                d = pt - self.mean
                cov += np.outer(d, d)
            self.g_cov = self.g_cov + cov - self.slot_cov[self.idx]
            self.slot_cov[self.idx] = cov
            self._calc_inv()
            self.built = True
        if self.cur_count > self.cap:
            self.idx = (self.idx + 1) % self.S
            self.cur_count = 0
            self.cur_sum = np.zeros(2)
        return self.built

    def _calc_inv(self):
        covar = self.g_cov / self.g_count
        eigvals = np.linalg.eigvalsh(covar)
        small, large = float(eigvals[0]), float(eigvals[1])
        if small < 1e-3 * large:
            det = 1e-3 * large * large
        else:
            det = covar[0, 0] * covar[1, 1] - covar[0, 1] * covar[1, 0]
        self.inv_cov = (
            np.array([[covar[1, 1], -covar[0, 1]], [-covar[1, 0], covar[0, 0]]]) / det
        )

    def score(self, p):
        if not self.built:
            return 0.0
        d = p - self.mean
        return float(np.exp(-d @ self.inv_cov @ d / 2.0))


class OracleFrame:
    """Literal `NDTFrame` grid + cost (`ndtframe.cpp`, `core.cpp:26-48`)."""

    def __init__(self, size_m, cell_side, slots=100, capacity=50):
        self.size = float(size_m)
        self.cell = float(cell_side)
        self.w = int(np.ceil(size_m / cell_side))
        self.slots, self.capacity = slots, capacity
        self.cells = {}

    def cell_index(self, p):
        half = self.size / 2.0
        if -half < p[0] < half and -half < p[1] < half:
            return int(
                np.floor((p[0] + half) / self.cell)
                + self.w * np.floor((p[1] + half) / self.cell)
            )
        return -1

    def add_point(self, p):
        i = self.cell_index(p)
        if i != -1:
            if i not in self.cells:
                self.cells[i] = OracleCell(self.slots, self.capacity)
            self.cells[i].add_point(np.asarray(p, float))

    def update(self, pose, points):
        c, s = np.cos(pose[2]), np.sin(pose[2])
        for p in points:
            q = np.array(
                [p[0] * c - p[1] * s + pose[0], p[0] * s + p[1] * c + pose[1]]
            )
            self.add_point(q)

    def build(self):
        for cell in self.cells.values():
            cell.build()

    def cost(self, pose, points):
        c, s = np.cos(pose[2]), np.sin(pose[2])
        total = 0.0
        for p in points:
            q = np.array(
                [p[0] * c - p[1] * s + pose[0], p[0] * s + p[1] * c + pose[1]]
            )
            i = self.cell_index(q)
            if i != -1 and i in self.cells and self.cells[i].built:
                total -= self.cells[i].score(q)
        return total


ZERO_DEV = np.array([1e-4, 1e-4, 1e-5])


def oracle_pso(key, guess, deviation, cost_fn, iterations, population, w=0.8,
               c1=2.0, c2=2.0, w_damping=1.0):
    """Synchronous-batch PSO with the engine's frozen Threefry protocol
    (mirrors models/pso.py semantics; `core.cpp:50-116` math)."""
    guess = np.asarray(guess, float)
    p = population
    u_g, _ = uniform_pairs_np(key, np.arange(3, dtype=np.uint32))
    g_pos = guess + (2 * u_g - 1) * ZERO_DEV
    g_cost = cost_fn(g_pos)
    u_p, _ = uniform_pairs_np(
        key, 3 + np.arange(p * 3, dtype=np.uint32).reshape(p, 3)
    )
    pos = guess + (2 * u_p - 1) * np.asarray(deviation, float)
    cost = np.array([cost_fn(x) for x in pos])
    bi = int(np.argmin(cost))
    gbest, gbest_cost = (pos[bi].copy(), cost[bi]) if cost[bi] < g_cost else (g_pos, g_cost)
    pbest, pbest_cost = pos.copy(), cost.copy()
    vel = np.zeros_like(pos)
    base = 3 + p * 3
    for i in range(iterations):
        ctr = base + i * p * 3 + np.arange(p * 3, dtype=np.uint32).reshape(p, 3)
        r1, r2 = uniform_pairs_np(key, ctr)
        vel = w * vel + c1 * r1 * (pbest - pos) + c2 * r2 * (gbest - pos)
        pos = pos + vel
        cost = np.array([cost_fn(x) for x in pos])
        better = cost < pbest_cost
        pbest[better] = pos[better]
        pbest_cost = np.minimum(cost, pbest_cost)
        bi = int(np.argmin(pbest_cost))
        if pbest_cost[bi] < gbest_cost:
            gbest, gbest_cost = pbest[bi].copy(), pbest_cost[bi]
        w = w * w_damping
    return gbest, gbest_cost
