#!/usr/bin/env python
"""Real-TPU measurement for SURVEY §7 bullet 1 / VERDICT r1 #8: variable
inference-step counts under jit — 14 per-count compiled programs (the
reference randomizes steps in [2,16), train_ppo.py:345) vs ONE padded
program at max_steps=15 with step masks (pipelines/t2i.make_padded_denoise_fn).

Measures, on the full SD-1.5-size bf16 UNet at the production rollout batch:
  * compile+first-run wall time of a per-count program (x samples);
  * compile+first-run wall time of the padded program;
  * steady-state rollout time per count for both.
Decision rule: padded wins iff
  (n_counts-1) * compile > train_steps * (t_padded(avg) - t_exact(avg)).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from consolver_tpu.core import schedules
from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
from consolver_tpu.pipelines.t2i import (
    make_denoise_fn,
    make_padded_denoise_fn,
    padded_ladder,
)
from consolver_tpu.policy import FactorNet, FactorNetConfig

BATCH = 8
MAX_STEPS = 15


def sync(x):
    float(jnp.sum(x.astype(jnp.float32)))


def main():
    from bench import random_params_like

    ucfg = UNetConfig.sd15()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 64, 64, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
    )
    params = random_params_like(shapes, 1, jnp.bfloat16)
    sched = schedules.DiffusionSchedule.sd15()
    fcfg = FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
    fnet = FactorNet(fcfg)
    fparams = fnet.init(jax.random.key(3))
    apply = lambda p, x, t, c: unet.apply(p, x, t, c)

    noise = jax.random.normal(jax.random.key(4), (BATCH, 64, 64, 4))
    ctx = jax.random.normal(jax.random.key(5), (BATCH, 77, 768), jnp.bfloat16)

    def steady(fn, *args, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out, _ = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    # --- per-count programs (sample two counts for the compile cost) ---
    per_count = {}
    for steps in (8, 12):
        fn = make_denoise_fn(apply, sched, fnet, steps, 3.0)
        t0 = time.perf_counter()
        out, _ = fn(params, fparams, jax.random.key(6), noise, ctx, ctx)
        sync(out)
        compile_s = time.perf_counter() - t0
        run_s = steady(fn, params, fparams, jax.random.key(7), noise, ctx, ctx)
        per_count[steps] = (compile_s, run_s)
        print(f"per-count S={steps}: compile+1st {compile_s:.1f}s steady {run_s*1e3:.0f}ms",
              flush=True)

    # --- padded program ---
    padded = make_padded_denoise_fn(apply, sched, fnet, MAX_STEPS, 3.0)
    ladder8 = padded_ladder(sched, 8, MAX_STEPS)
    t0 = time.perf_counter()
    out, _ = padded(params, fparams, jax.random.key(6), noise, ctx, ctx, *ladder8)
    sync(out)
    compile_p = time.perf_counter() - t0
    print(f"padded M={MAX_STEPS}: compile+1st {compile_p:.1f}s", flush=True)
    for steps in (2, 8, 14):
        ladder = padded_ladder(sched, steps, MAX_STEPS)
        run_s = steady(padded, params, fparams, jax.random.key(7), noise, ctx, ctx, *ladder)
        print(f"padded s={steps}: steady {run_s*1e3:.0f}ms", flush=True)

    avg_compile = sum(c for c, _ in per_count.values()) / len(per_count)
    print(f"\nper-count avg compile {avg_compile:.1f}s -> 14 programs ~ "
          f"{14*avg_compile/60:.1f} min warmup; padded warmup {compile_p/60:.1f} min")


if __name__ == "__main__":
    main()
