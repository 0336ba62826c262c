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

# Persistent compilation cache: the e2e tests are compile-bound (tiny-stack
# XLA compiles dominate the suite), so repeat runs load cached executables
# (~4.5x faster second run).  Keyed by HLO hash — code changes simply miss
# and recompile.  Opt out with CONSOLVER_JAX_CACHE=0.
if os.environ.get("CONSOLVER_JAX_CACHE", "1") != "0":
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_compilation_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    # persist EVERYTHING: the suite dispatches hundreds of small eager ops
    # (flax inits, host-side schedule math) whose compiles are individually
    # <0.5s but sum to ~40% of some tests; caching them is a big win on the
    # single-core CI box
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_llava_ckpt(tmp_path_factory):
    """A real (tiny, random-weight) local LLaVA checkpoint: the drive target
    for the transformers VLM-judge glue (rewards/vlm.py)."""
    from tests.vlm_fixtures import build_tiny_llava

    return build_tiny_llava(str(tmp_path_factory.mktemp("vlm") / "tiny_llava"))
