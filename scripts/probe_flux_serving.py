#!/usr/bin/env python
"""Single-chip FLUX-Kontext serving probe: the 11.9B-param DiT does NOT fit
one 16GB chip in bf16 (23.8GB -> needs >= 2 chips + dist/tp rules), but the
int8 path (FluxConfig.quant_int8) brings weights to ~12GB.  This builds the
full-size int8 transformer with random weights and times a Kontext-shaped
forward (1024^2 target + 1024^2 reference + 512 text tokens) on one chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from consolver_tpu.models.flux import FluxConfig, FluxTransformer


def random_tree_like(shapes, seed=0):
    """Random host values per eval_shape leaf: int8 kernels get random ints,
    float leaves small normals (values don't matter for throughput/memory)."""
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree.flatten(shapes)
    out = []
    for s in leaves:
        if s.dtype == jnp.int8:
            out.append(rng.integers(-127, 128, s.shape, dtype=np.int8))
        else:
            out.append((rng.standard_normal(s.shape) * 0.02).astype(s.dtype))
    return jax.tree.unflatten(treedef, out)


def main():
    cfg = FluxConfig(**{**FluxConfig.flux_kontext().__dict__, "quant_int8": True})
    model = FluxTransformer(cfg, dtype=jnp.bfloat16)

    b = 1
    s_target = 4096   # 1024^2 -> 128^2 latents -> 64^2 packed tokens
    s_img = 2 * s_target  # + reference-image tokens (Kontext)
    s_txt = 512
    img = jnp.zeros((b, s_img, cfg.in_channels), jnp.bfloat16)
    txt = jnp.zeros((b, s_txt, cfg.joint_text_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, cfg.pooled_text_dim), jnp.bfloat16)
    t = jnp.ones((b,))
    g = jnp.full((b,), 2.5)
    img_ids = jnp.zeros((s_img, 3))
    txt_ids = jnp.zeros((s_txt, 3))
    args = (img, txt, pooled, t, g, img_ids, txt_ids)

    shapes = jax.eval_shape(model.init, jax.random.key(0), *args)
    n_bytes = sum(
        int(np.prod(s.shape)) * s.dtype.itemsize for s in jax.tree.leaves(shapes)
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    print(f"flux_kontext int8: {n_params/1e9:.2f}B params, {n_bytes/1e9:.2f} GB",
          flush=True)

    t0 = time.perf_counter()
    params = random_tree_like(shapes)
    print(f"host params built in {time.perf_counter()-t0:.0f}s", flush=True)

    fwd = jax.jit(model.apply)
    t0 = time.perf_counter()
    out = fwd(params, *args)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"transfer+compile+1st fwd: {time.perf_counter()-t0:.0f}s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fwd(params, *args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    gflop = 2 * (n_params - 0) * (s_img + s_txt) * b / 1e9  # ~2*N*tokens
    print(
        f"steady fwd: {best*1e3:.0f} ms  (~{gflop/best/1e3:.0f} TOP/s effective); "
        f"5-step Kontext edit ~= {5*best:.1f} s/image on ONE chip", flush=True
    )
    try:
        stats = jax.local_devices()[0].memory_stats()
        print(f"HBM in use: {stats.get('bytes_in_use', 0)/1e9:.2f} GB "
              f"/ limit {stats.get('bytes_limit', 0)/1e9:.2f} GB", flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()
