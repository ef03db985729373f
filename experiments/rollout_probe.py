"""Reproduce the Mosaic crash with the real rollout kernel at small shapes."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ndtpso_slam_tpu import config as cfgm
from ndtpso_slam_tpu.ops.pallas_rollout import pso_rollout

B, P, N, R = 2, 256, 256, 2
K2 = (2 * R + 1) ** 2
map_cfg = cfgm.MapConfig(size_m=32.0, cell_side_m=1.0, window_slots=4)
pso_cfg = cfgm.PSOConfig(iterations=int(sys.argv[1]) if len(sys.argv) > 1 else 3,
                         population=P)

rs = np.random.RandomState(0)
keys = rs.randint(0, 2**31, (B, 2)).astype(np.uint32)
guesses = np.zeros((B, 3), np.float32)
devs = np.tile(np.float32([0.2, 0.2, 0.05]), (B, 1))
sten = rs.uniform(0, 1, (B, K2, 8, N)).astype(np.float32)
pts = rs.uniform(-8, 8, (B, 8, N)).astype(np.float32)
pts[:, 4] = 1.0  # valid
pts[:, 2:4] = np.floor((pts[:, 0:2] + 16.0))  # anchors consistent-ish

pose, cost = pso_rollout(keys, guesses, devs, jnp.asarray(sten),
                         jnp.asarray(pts), pso_cfg, map_cfg, radius=R)
jax.block_until_ready(pose)
print("OK", np.asarray(pose), np.asarray(cost), file=sys.stderr)
