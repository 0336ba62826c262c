"""Shared TPU probe timing helpers (the CLAUDE.md tunneled-TPU recipe):
chain N dependent iterations INSIDE one jit (content caching defeats
repeated identical calls), synchronize with a HOST READ, and subtract the
~29 ms RPC round-trip baseline."""

import time

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    """Best-of-reps wall time of fn(*args) synchronized by a host read."""
    out = fn(*args)  # compile + warm
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def rpc_baseline():
    """Round-trip cost of a trivial dispatch + host read, to subtract."""

    @jax.jit
    def tiny(x):
        return x + 1

    return timed(tiny, jnp.zeros((8, 128)), reps=5)
