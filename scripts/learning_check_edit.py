"""End-to-end learning check for the FLUX edit PPO loop.

FM twin of scripts/learning_check.py: miniature consistency objective on the
tiny FLUX-Kontext stack — teacher = 20-step Euler edits; 3-step previews
through the full EditPPOTrainer loop (baseline Euler rollout, baseline-
clipped advantages, ppo_epochs — edit_ppo/train_ppo.py).

Run results (2026-08-17, CPU, fixed prompt):
  * production policy config (family="fm", T=0.01, random init): reward
    CONSTANT at 20.4073 for 400 steps — softmax(logits/0.01) at random init
    is near-one-hot, so the policy explores ~never on a toy; this mirrors
    the reference's own FM config (edit_ppo/factor_net_ppo.py:168, no
    zero-init :87-88).  At production scale exploration comes from varied
    (sigma, sigma_next) conds across step-count draws.
  * softened exploration (temperature_override=1.0, same loop): 20.28 ->
    20.41 (+0.13), converging above the Euler baseline (20.40) — the
    rollout -> reward -> baseline-clipped-advantage -> update loop
    verifiably optimizes the FM policy.

Rerun after touching rl/train_edit.py, pipelines/edit.py, or the FM solver.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, sys
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
from consolver_tpu.rewards.registry import make_reward_fn
from consolver_tpu.rl.ppo import PPOConfig
from consolver_tpu.rl.train import TrainConfig
from consolver_tpu.rl.train_edit import EditPPOTrainer
from tests.test_edit import pipe as _pipe_fixture

pipe = _pipe_fixture.__wrapped__()

# Production FM sharpness (T=0.01) makes the random-init policy
# near-deterministic: measured 400 fixed-prompt steps hold reward constant
# at 20.4073 (zero exploration).  The toy therefore softens the temperature
# (policy/factor_net.temperature_override) to give PPO a stochastic policy
# to optimize; everything else is the production edit loop.
from consolver_tpu.policy import FactorNet, FactorNetConfig
fcfg = FactorNetConfig(order_dim=2, scaler_dim=0, mu_dim=0, num_actions=11,
                       family="fm", temperature_override=1.0)
fnet = FactorNet(fcfg)
pipe.factor_net = fnet
pipe.factor_params = fnet.init(jax.random.key(7))

# teacher: 20-step Euler edits for 6 (ref, instruction) pairs
rng = np.random.default_rng(0)
N = 6
refs = rng.uniform(-1, 1, (N, 16, 16, 3)).astype(np.float32)
noises = rng.standard_normal((N, 8, 8, 4)).astype(np.float32)
t5_ids = rng.integers(1, 60, (N, 4)).astype(np.int64)
clip_ids = rng.integers(1, 60, (N, 4)).astype(np.int64)
teach_lat = []
for i in range(N):
    lat, _ = pipe(
        jax.random.key(0), jnp.asarray(t5_ids[i:i+1]), jnp.asarray(clip_ids[i:i+1]),
        jnp.asarray(refs[i:i+1]), jnp.asarray(noises[i:i+1]),
        num_inference_steps=20, guidance_scale=2.5, solver="euler", decode=False,
    )
    teach_lat.append(np.asarray(lat[0]))
teach_lat = np.stack(teach_lat)
print("teacher built", flush=True)

config = TrainConfig(
    max_train_steps=10_000, guidance_scale=2.5,
    min_inference_steps=3, max_inference_steps=4,  # fixed 3 steps
    seed=0, output_dir="/tmp/learn_ck_edit", checkpointing_steps=10_000,
    ppo=PPOConfig(ppo_epochs=4, learning_rate=1e-3, entropy_coef=0.01),
)
trainer = EditPPOTrainer(pipe, make_reward_fn("image_psnr"), config)

B = 8
rewards = []
for step in range(300):
    idx = 0  # fixed prompt: reward comparable across steps
    batch = {
        "noise": np.tile(noises[idx:idx+1], (B, 1, 1, 1)),
        "latent": np.tile(teach_lat[idx:idx+1], (B, 1, 1, 1)),
        "ref_image": np.tile(refs[idx:idx+1], (B, 1, 1, 1)),
        "t5_ids": np.tile(t5_ids[idx:idx+1], (B, 1)),
        "clip_ids": np.tile(clip_ids[idx:idx+1], (B, 1)),
    }
    m = trainer.train_step(batch)
    rewards.append(m["reward"])
    if step % 40 == 39:
        print(f"step {step+1}: mean reward last40 = {np.mean(rewards[-40:]):.4f} "
              f"(baseline {m['baseline_reward']:.2f})", flush=True)

first, last = np.mean(rewards[:80]), np.mean(rewards[-80:])
print(f"FIRST80={first:.4f} LAST80={last:.4f} delta={last-first:+.4f}")
print("LEARNING" if last > first + 0.05 else "NO-CLEAR-LEARNING")
