"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native replacement for "test DDP without a cluster"
(SURVEY.md section 4): multi-chip sharding is validated with
xla_force_host_platform_device_count on CPU, while real-TPU benchmarking is
done separately by bench.py.

The ambient environment pins JAX_PLATFORMS to the TPU plugin, which ignores
a plain env override — so we also set the config flag after importing jax
(before any backend is initialized).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
