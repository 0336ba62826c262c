"""End-to-end learning check: PPO on a miniature consistency objective.

Run results (2026-08-16, CPU): 240 steps: 27.69 -> 28.09 (+0.40);
600 steps: first100 27.81 -> last100 27.90 (+0.09) — consistent positive
learning that saturates early on this toy (random-weight UNet + 11-point
grids cap the headroom). The full rollout->reward->advantage->update loop
optimizes the solver policy.

Teacher = 40-step DDIM with a tiny random UNet. The factor net must learn
coefficients that make 3-step previews match the teacher latents better
than the zero-init (DDIM-equivalent-ish) policy.

--quantize runs the same check with the ROLLOUT environment on the int8
serving path (ModelConfig.quantize_rollout): teacher targets stay float,
the student rolls out through the quantized UNet/VAE — validating that
the policy still learns against the environment it will be served in."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, sys
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT); sys.path.insert(0, os.path.join(ROOT, "tests"))
from consolver_tpu.core import schedules
from consolver_tpu.pipelines.t2i import TextToImagePipeline, make_denoise_fn
from consolver_tpu.policy import FactorNet, FactorNetConfig
from consolver_tpu.rewards.registry import make_reward_fn
from consolver_tpu.rl.ppo import PPOConfig
from consolver_tpu.rl.train import PPOTrainer, TrainConfig
from test_pipeline import make_tiny_stack

(unet, up), (te, tp), (vae, vp) = make_tiny_stack()
sched = schedules.DiffusionSchedule.sd15()

# teacher: 40-step DDIM trajectories for 8 prompts
teacher = make_denoise_fn(lambda p,x,t,c: unet.apply(p,x,t,c), sched, None, 40, 3.0,
                          record_trajectory=False)
rng = np.random.default_rng(0)
N = 8
noises = rng.standard_normal((N, 8, 8, 4)).astype(np.float32)
prompt_ids = rng.integers(1, 900, (N, 4)).astype(np.int64)
enc = jax.jit(lambda ids: te.apply(tp, ids))
# teacher and student must condition the CFG negative branch identically:
# the tokenized empty prompt (what PPOTrainer now derives), not zeros
from consolver_tpu.data.tokenizer import HashTokenizer, uncond_input_ids
unc_ids = jnp.asarray(uncond_input_ids(
    HashTokenizer(max_length=4), 1, 4, vocab_size=te.cfg.vocab_size))
teach_lat = []
for i in range(N):
    ctx = enc(jnp.asarray(prompt_ids[i:i+1]))
    unc = enc(unc_ids)
    lat, _ = teacher(up, None, jax.random.key(0), jnp.asarray(noises[i:i+1]), ctx, unc)
    teach_lat.append(np.asarray(lat[0]))
teach_lat = np.stack(teach_lat)
print("teacher built", flush=True)

fcfg = FactorNetConfig(order_dim=3, scaler_dim=0, num_actions=11, family="sd")
fnet = FactorNet(fcfg)
pipe = TextToImagePipeline(unet, up, te, tp, vae, vp, sched,
                           factor_net=fnet, factor_params=fnet.init(jax.random.key(1)))
if "--quantize" in sys.argv:
    print("int8 rollout environment (pipeline .quantize())", flush=True)
    pipe = pipe.quantize()
config = TrainConfig(
    max_train_steps=10_000, guidance_scale=3.0,
    min_inference_steps=3, max_inference_steps=4,  # fixed 3 steps
    seed=0, output_dir="/tmp/learn_ck", checkpointing_steps=10_000,
    ppo=PPOConfig(ppo_epochs=1, learning_rate=3e-3, entropy_coef=0.003,
                  advantage_scale=10.0),
)
trainer = PPOTrainer(pipe, make_reward_fn("image_psnr"), config)

B = 16
rewards = []
for step in range(240):
    idx = rng.integers(0, N)
    batch = {
        "noise": np.tile(noises[idx:idx+1], (B,1,1,1)),
        "latent": np.tile(teach_lat[idx:idx+1], (B,1,1,1)),
        "prompt_ids": np.tile(prompt_ids[idx:idx+1], (B,1)),
    }
    m = trainer.train_step(batch)
    rewards.append(m["reward"])
    if step % 40 == 39:
        print(f"step {step+1}: mean reward last40 = {np.mean(rewards[-40:]):.4f}", flush=True)

first, last = np.mean(rewards[:60]), np.mean(rewards[-60:])
print(f"FIRST60={first:.4f} LAST60={last:.4f} delta={last-first:+.4f}")
print("LEARNING" if last > first + 0.05 else "NO-CLEAR-LEARNING")
