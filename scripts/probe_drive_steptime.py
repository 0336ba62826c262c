#!/usr/bin/env python
"""Reconcile DRIVE step times with probe_train_tpu (VERDICT r4 #6).

DRIVE_r04.json reported control steady p50 = 15.96 s/step for the batch-80
512^2 production run while scripts/probe_train_tpu.py reports 13.28 s/step
for the "same" config — and the resumed run was 8% slower than control.
The suspected cause is not overhead but CONFIG: the probe pins
num_inference=8, while production draws the count uniformly from [2, 16)
per step (train_ppo.py:345) and each count is its own program whose rollout
cost scales linearly with the count.  A pooled p50 over counts 2..15 is
then a p50 over a ~[a+2b, a+15b] spread — not comparable to the count-8
point.

This probe measures exactly that, through the REAL production path
(TeacherDataset npz stream -> PPOTrainer.train_step):

  * a drawn-count window (production config) recording per-step wall time,
    the drawn count, and the host-side batch-fetch time separately;
  * a fixed-count-8 window through the SAME trainer/pipe (programs shared);
  * a linear fit  step_s ~= a + b * count  over the steady drawn samples,
    plus the model's predicted pooled p50/p90 for uniform counts 2..15,
    compared against DRIVE_r04's measured 15.96/21.18.

  python scripts/probe_drive_steptime.py [--root /tmp/drive_steptime]
      [--drawn-steps 42] [--fixed-steps 5] [--batch 80]

One v5e chip: ~14 per-count compiles (~20 min, persistent-cached) +
~42 steps x ~16 s => ~35 min total.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_window(trainer, dataset, batch_size, n_steps, seed, flush=None):
    """Drive the trainer off the real npz stream for n_steps, timing the
    host fetch and the train_step separately.  ``flush(rows)`` runs after
    every step so a truncated run still leaves analyzable data."""
    rows = []
    stream = None
    epoch = 0
    for _ in range(n_steps):
        t0 = time.perf_counter()
        batch = None
        while batch is None:
            if stream is None:
                stream = dataset.batches(batch_size, seed=seed + epoch, shuffle=True)
            batch = next(stream, None)
            if batch is None:
                stream, epoch = None, epoch + 1
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = trainer.train_step(batch)
        t_step = time.perf_counter() - t0
        rows.append({
            "step": trainer.global_step - 1,
            "num_inference": int(out["num_inference"]),
            "fetch_s": t_fetch,
            "step_s": t_step,
        })
        print(f"step {rows[-1]['step']:3d} count={rows[-1]['num_inference']:2d} "
              f"fetch={t_fetch*1e3:6.1f}ms step={t_step:7.2f}s", flush=True)
        if flush is not None:
            flush(rows)
    return rows


def steady_by_count(rows):
    """Drop each count's first occurrence (compile) like
    drive_resume.step_time_stats, then group by count."""
    seen, per_count = set(), {}
    for r in rows:
        n = r["num_inference"]
        if n in seen:
            per_count.setdefault(n, []).append(r["step_s"])
        seen.add(n)
    return per_count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/drive_steptime")
    ap.add_argument("--drawn-steps", type=int, default=42)
    ap.add_argument("--fixed-steps", type=int, default=5)
    ap.add_argument("--pinned-counts", type=int, nargs="*", default=None,
                    help="cheap mode: instead of the drawn-count window, "
                    "pin each listed count for --pinned-steps steps (the "
                    "first step per count is its compile) and fit the "
                    "linear model from those medians — 3 counts bound the "
                    "whole line at ~1/4 the chip time")
    ap.add_argument("--pinned-steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--out", default="DRIVE_r05_steptime.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_compilation_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from scripts.drive_resume import prepare
    from scripts.train_sd15 import build_pipeline, build_reward
    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.group import TeacherDataset
    from consolver_tpu.policy import FactorNet
    from consolver_tpu.rl.train import PPOTrainer

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    os.makedirs(args.root, exist_ok=True)
    prepare(args.root, tiny=False, n_samples=160)

    cfg = ExperimentConfig.sd15_ppo()
    cfg = apply_overrides(cfg, {
        "model.pretrained_path": os.path.join(args.root, "ckpt"),
        "data.train_data_dir": os.path.join(args.root, "teacher"),
        "data.batch_size": args.batch,
        "reward.reward_type": "image_psnr",
        "train.decode_chunk": 8,
    })
    fnet = FactorNet(cfg.factor_net)
    fparams = fnet.init(jax.random.key(0))
    pipe = build_pipeline(cfg, fnet, fparams)
    reward_fn = build_reward(cfg)
    dataset = TeacherDataset(cfg.data.train_data_dir)

    trainer = PPOTrainer(pipe, reward_fn, cfg.train)
    partial_path = os.path.join(REPO, args.out + ".partial")

    def flush(rows):
        with open(partial_path, "w") as f:
            json.dump({"partial": True, "raw_drawn": rows}, f)

    import dataclasses

    def pinned_window(n, steps, seed):
        c = dataclasses.replace(
            cfg.train, min_inference_steps=n, max_inference_steps=n + 1)
        tr = PPOTrainer(pipe, reward_fn, c)
        tr.params, tr.opt_state = trainer.params, trainer.opt_state
        return run_window(tr, dataset, args.batch, steps, seed=seed,
                          flush=flush)

    if args.pinned_counts:
        drawn = []
        for n in args.pinned_counts:
            print(f"== pinned-count-{n} window ({args.pinned_steps} steps) "
                  f"==", flush=True)
            drawn += pinned_window(n, args.pinned_steps, seed=50 + n)
        fixed = [r for r in drawn if r["num_inference"] == 8] or drawn[-args.pinned_steps:]
    else:
        print(f"== drawn-count window ({args.drawn_steps} steps, counts "
              f"[{cfg.train.min_inference_steps},{cfg.train.max_inference_steps})"
              f" drawn per step) ==", flush=True)
        drawn = run_window(trainer, dataset, args.batch, args.drawn_steps,
                           seed=0, flush=flush)
        print(f"== fixed-count-8 window ({args.fixed_steps} steps) ==",
              flush=True)
        fixed = pinned_window(8, args.fixed_steps, seed=100)

    per_count = steady_by_count(drawn)
    counts = sorted(per_count)
    med = {n: float(np.median(per_count[n])) for n in counts}
    # linear fit over (count, median) pairs
    if len(counts) >= 2:
        b, a = np.polyfit(counts, [med[n] for n in counts], 1)
    else:
        a, b = float("nan"), float("nan")
    lo, hi = (cfg.train.min_inference_steps, cfg.train.max_inference_steps)
    model_times = [a + b * n for n in range(lo, hi)]
    steady_all = [s for v in per_count.values() for s in v]
    fixed_steady = [r["step_s"] for r in fixed[1:]] or [r["step_s"] for r in fixed]

    report = {
        "config": {"batch": args.batch, "resolution": 512,
                   "count_range": [lo, hi], "drawn_steps": args.drawn_steps,
                   "pinned_counts": args.pinned_counts,
                   "pinned_steps": args.pinned_steps,
                   "hardware": "one v5e chip via tunnel"},
        "per_count_median_step_s": {str(n): med[n] for n in counts},
        "per_count_samples": {str(n): len(per_count[n]) for n in counts},
        "linear_fit": {"intercept_s": float(a), "slope_s_per_count": float(b)},
        "pooled_measured": {
            "p50": float(np.percentile(steady_all, 50)) if steady_all else None,
            "p90": float(np.percentile(steady_all, 90)) if steady_all else None,
            "n": len(steady_all),
        },
        "pooled_model_uniform_counts": {
            "p50": float(np.percentile(model_times, 50)),
            "p90": float(np.percentile(model_times, 90)),
        },
        "fixed_count8": {
            "p50": float(np.percentile(fixed_steady, 50)),
            "min": float(np.min(fixed_steady)),
            "n": len(fixed_steady),
        },
        "fetch_ms_p50": float(np.percentile(
            [r["fetch_s"] for r in drawn], 50) * 1e3),
        "reference_points": {
            "probe_train_tpu_fixed8_min_s": 13.28,
            "drive_r04_control_p50_s": 15.96,
            "drive_r04_control_p90_s": 21.18,
            "drive_r04_resumed_p50_s": 17.26,
        },
        "raw_drawn": drawn,
        "raw_fixed": fixed,
    }
    out_path = os.path.join(REPO, args.out)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    if os.path.exists(partial_path):
        os.remove(partial_path)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("raw_drawn", "raw_fixed")}, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
