"""Test harness config: force CPU JAX with 8 virtual devices.

The environment's sitecustomize registers a TPU (axon) PJRT backend in every
Python process and pins ``jax_platforms`` programmatically, so an env var
alone is not enough — we re-pin the config to CPU here (conftest runs before
any test imports trigger backend initialization).  Sharding tests then
exercise real collectives on an 8-device virtual mesh without a TPU pod
(SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
