#!/usr/bin/env python
"""Production kill/resume rehearsal on the real chip (VERDICT r3 #2).

Runs the REAL production CLI (scripts/train_sd15.py, sd15_ppo preset:
batch 80, 512^2, ckpt every 100) end-to-end at full SD-1.5 model size with
random weights and a synthetic teacher set, then proves the operational
loop of the reference (train_ppo.py:290-311,445-449):

  1. prepare   — synthesize a full-size random "converted checkpoint"
                 (orbax unet/vae/clip_text + config sidecars, the exact
                 scripts/convert_checkpoints.py layout) and a teacher npz
                 dataset (data/group.TeacherDataset format).
  2. control   — uninterrupted run to --max-steps.
  3. victim    — same run; SIGKILLed from outside once checkpoint-100 has
                 landed (we watch metrics.jsonl for step >= kill_after).
  4. resume    — the IDENTICAL command again: the CLI auto-resumes
                 "latest", fast-forwards the data stream, finishes.
  5. compare   — final checkpoints of control vs resumed run must be
                 BIT-EQUAL (params + opt_state); prints steady step-time
                 stats and the reward/entropy curve tail from both logs.

  python scripts/drive_resume.py --root /tmp/drive_r4 [--max-steps 120]
      [--kill-after 104] [--batch 80] [--tiny]   # --tiny = CPU smoke

One v5e chip: ~19 min per-count compile warmup (14 programs, persistent
cache) + ~13.3 s/step (scripts/probe_train_tpu.py) => ~1.5 h total.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = False  # set by main() from --tiny; routes subprocesses to CPU


def prepare(root: str, tiny: bool, n_samples: int) -> None:
    """Full-size random converted checkpoint + synthetic teacher set."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from bench import random_params_like
    from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig

    cpu = jax.devices("cpu")[0]
    ckpt = os.path.join(root, "ckpt")
    ucfg = UNetConfig.tiny() if tiny else UNetConfig.sd15()
    vcfg = VaeConfig.tiny() if tiny else VaeConfig.sd15()
    tcfg = ClipTextConfig.tiny() if tiny else ClipTextConfig.sd15()
    with jax.default_device(cpu):
        specs = {
            "unet": (ucfg, jax.eval_shape(
                UNet2DCondition(ucfg).init, jax.random.key(0),
                jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 4, ucfg.cross_attention_dim)))),
            "vae": (vcfg, jax.eval_shape(
                AutoencoderKL(vcfg).init, jax.random.key(0),
                jnp.zeros((1, 16, 16, 3)), jax.random.key(1))),
            "clip_text": (tcfg, jax.eval_shape(
                ClipTextEncoder(tcfg).init, jax.random.key(0),
                jnp.zeros((1, 4), jnp.int32))),
        }
        for i, (name, (cfg, shapes)) in enumerate(specs.items()):
            dst = os.path.join(ckpt, name)
            if os.path.isdir(dst):
                continue
            params = random_params_like(shapes, i + 1, jnp.float32)
            # numpy payloads, like scripts/convert_checkpoints.py:176 —
            # orbax restores numpy without a sharding-bearing template
            params = jax.tree.map(np.asarray, params)
            ocp.PyTreeCheckpointer().save(dst, params)
            with open(dst + "_config.json", "w") as f:
                json.dump(dataclasses.asdict(cfg), f)
            print(f"prepared {dst}", flush=True)

    data = os.path.join(root, "teacher")
    os.makedirs(data, exist_ok=True)
    lat = 8 if tiny else 64
    seq = 77
    vocab = tcfg.vocab_size
    rng = np.random.default_rng(11)
    for i in range(n_samples):
        p = os.path.join(data, f"sample_{i:05d}.npz")
        if os.path.exists(p):
            continue
        np.savez(
            p,
            noise=rng.standard_normal((lat, lat, 4)).astype(np.float32),
            latent=rng.standard_normal((lat, lat, 4)).astype(np.float32),
            prompt_ids=rng.integers(1, vocab, (seq,)).astype(np.int64),
        )
    print(f"prepared {n_samples} teacher samples under {data}", flush=True)


def train_cmd(root: str, out: str, args) -> list:
    over = {
        "model.pretrained_path": os.path.join(root, "ckpt"),
        "data.train_data_dir": os.path.join(root, "teacher"),
        "data.batch_size": args.batch,
        "reward.reward_type": "image_psnr",
        "train.output_dir": out,
        "train.max_train_steps": args.max_steps,
        "train.decode_chunk": 8,
        "train.log_every": 1,
        "train.checkpointing_steps": args.ckpt_every,
    }
    cmd = [sys.executable, os.path.join(REPO, "scripts", "train_sd15.py"),
           "--preset", "sd15_ppo"]
    for k, v in over.items():
        cmd += ["--set", f"{k}={v}"]
    return cmd


def run_phase(name: str, cmd: list, log_path: str,
              kill_after: int = 0, metrics_path: str = "") -> int:
    """Run a training subprocess; if kill_after > 0, SIGKILL it once
    metrics.jsonl reports a step >= kill_after (so checkpoint-{N} at the
    preceding cadence boundary is guaranteed on disk)."""
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_compilation_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.0"
    if TINY:
        env["JAX_PLATFORMS"] = "cpu"  # train_sd15.py double-pins from this
    t0 = time.monotonic()
    with open(log_path, "w") as lf:
        proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                env=env, cwd=REPO)
        try:
            if kill_after:
                while proc.poll() is None:
                    time.sleep(5)
                    step = last_step(metrics_path)
                    if step >= kill_after:
                        print(f"[{name}] step {step} logged -> SIGKILL "
                              f"(checkpoint cadence boundary passed)",
                              flush=True)
                        proc.send_signal(signal.SIGKILL)
                        proc.wait()
                        break
            rc = proc.wait()
        finally:
            if proc.poll() is None:
                proc.kill()
    print(f"[{name}] exited rc={rc} after {time.monotonic()-t0:.0f}s",
          flush=True)
    return rc


def last_step(metrics_path: str) -> int:
    try:
        with open(metrics_path) as f:
            lines = f.readlines()
        return json.loads(lines[-1])["step"] if lines else -1
    except (OSError, json.JSONDecodeError, KeyError, IndexError):
        return -1


def step_time_stats(metrics_path: str):
    """Steady step time from consecutive metrics.jsonl timestamps
    (skipping each num_inference count's first occurrence = compile)."""
    rows = []
    with open(metrics_path) as f:
        for line in f:
            rows.append(json.loads(line))
    seen, deltas = set(), []
    for a, b in zip(rows, rows[1:]):
        n = b.get("num_inference")
        dt = b["time"] - a["time"]
        if n in seen and dt < 300:
            deltas.append(dt)
        seen.add(n)
    if not deltas:
        return {}
    return {
        "steady_step_s_p50": float(np.percentile(deltas, 50)),
        "steady_step_s_p90": float(np.percentile(deltas, 90)),
        "steady_steps_counted": len(deltas),
    }


def curves(metrics_path: str, keys=("reward", "entropy", "loss")):
    rows = []
    with open(metrics_path) as f:
        for line in f:
            r = json.loads(line)
            rows.append({k: r.get(k) for k in ("step",) + tuple(keys)})
    return rows


def compare(control_out: str, resumed_out: str, step: int) -> bool:
    import jax
    import orbax.checkpoint as ocp

    a = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(control_out, f"checkpoint-{step}")))
    b = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(resumed_out, f"checkpoint-{step}")))
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(b)}
    ok = True
    for p, va in flat_a:
        key = jax.tree_util.keystr(p)
        vb = flat_b.get(key)
        if vb is None or np.asarray(va).shape != np.asarray(vb).shape or \
                not np.array_equal(np.asarray(va), np.asarray(vb)):
            print(f"MISMATCH at {key}", flush=True)
            ok = False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/drive_resume_r4")
    ap.add_argument("--max-steps", type=int, default=120)
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--kill-after", type=int, default=104,
                    help="SIGKILL the victim once this step is logged "
                         "(> the checkpoint boundary)")
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--samples", type=int, default=160)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny models / CPU smoke of the whole drive")
    args = ap.parse_args()

    global TINY
    TINY = args.tiny
    if args.tiny:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.root, exist_ok=True)
    prepare(args.root, args.tiny, args.samples)

    out_a = os.path.join(args.root, "control")
    out_b = os.path.join(args.root, "victim")

    rc = run_phase("control", train_cmd(args.root, out_a, args),
                   os.path.join(args.root, "control.log"))
    assert rc == 0, "control run failed"

    rc = run_phase("victim", train_cmd(args.root, out_b, args),
                   os.path.join(args.root, "victim.log"),
                   kill_after=args.kill_after,
                   metrics_path=os.path.join(out_b, "metrics.jsonl"))
    assert rc != 0, "victim was supposed to die"
    boundary = (args.kill_after // args.ckpt_every) * args.ckpt_every
    assert os.path.isdir(os.path.join(out_b, f"checkpoint-{boundary}")), \
        f"no checkpoint-{boundary} before the kill"

    rc = run_phase("resume", train_cmd(args.root, out_b, args),
                   os.path.join(args.root, "resume.log"))
    assert rc == 0, "resumed run failed"

    ok = compare(out_a, out_b, args.max_steps)
    report = {
        "bit_equal_at_step": args.max_steps if ok else None,
        "killed_after_step": args.kill_after,
        "checkpoint_boundary": boundary,
        "control": step_time_stats(os.path.join(out_a, "metrics.jsonl")),
        "resumed": step_time_stats(os.path.join(out_b, "metrics.jsonl")),
        "curve_tail_control": curves(os.path.join(out_a, "metrics.jsonl"))[-5:],
        "curve_tail_resumed": curves(os.path.join(out_b, "metrics.jsonl"))[-5:],
    }
    print("DRIVE " + ("PASS" if ok else "FAIL"), flush=True)
    print(json.dumps(report, indent=2), flush=True)
    with open(os.path.join(args.root, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
