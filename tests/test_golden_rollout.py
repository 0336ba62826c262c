"""End-to-end ROLLOUT golden: the reference's actual denoise_diffusion
recorder (/root/reference/denoise_ppo.py:6-140, run on torch-CPU with the
stub-loaded PPOScheduler and a real tiny CLIPTokenizer/CLIPTextModel)
against our make_denoise_fn pipeline — covering what the scheduler-level
goldens cannot: tokenize -> encode -> CFG batching order, the i>0
trajectory recording/stacking, and the mask/prob bookkeeping across a full
multi-step rollout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from consolver_tpu.core import schedules
from consolver_tpu.data.tokenizer import tokenize_batch, uncond_input_ids
from consolver_tpu.pipelines.t2i import make_denoise_fn
from consolver_tpu.policy import FactorNetConfig
from tests.diffusers_stub import FixedActionNet, load_reference
from tests.tokenizer_fixtures import make_tiny_clip_tokenizer


class _TorchFakeUNet:
    """Closed-form eps both frameworks can evaluate identically:
    eps = 0.3*sin(latent) + mean(ctx) + t/1000."""

    def __call__(self, latent, t, encoder_hidden_states=None, return_dict=False):
        ctx = encoder_hidden_states
        eps = (
            0.3 * torch.sin(latent)
            + ctx.mean(dim=(1, 2))[:, None, None, None]
            + float(t) / 1000.0
        )
        return (eps,)


def _jax_fake_unet(params, x, t, context):
    return (
        0.3 * jnp.sin(x)
        + context.mean(axis=(1, 2))[:, None, None, None]
        + t.astype(jnp.float32)[:, None, None, None] / 1000.0
    )


class _TorchTextEncoder:
    def __init__(self, model):
        self.model = model

    def __call__(self, ids):
        with torch.no_grad():
            return (self.model(ids).last_hidden_state,)


class _LookupActionNet:
    """Our-side action injection for make_denoise_fn: a FactorNet-shaped
    object whose sample_action returns the pre-planned actions for the
    current step, located by matching the traced conds t against the static
    timestep ladder."""

    def __init__(self, config, ts, actions):
        self.config = config
        self._ts = jnp.asarray(ts, jnp.float32)
        self._actions = jnp.asarray(actions, jnp.float32)  # [S, B, A]

    def sample_action(self, params, key, conds):
        t = conds["x"][0, 0]
        idx = jnp.argmin(jnp.abs(self._ts - t))
        a = self._actions[idx]
        return a, jnp.full_like(a, 0.5)


@pytest.mark.parametrize("order_dim,scaler_dim", [(4, 0), (3, 1)])
def test_sd_rollout_recorder_golden(tmp_path, capsys, order_dim, scaler_dim):
    from transformers import CLIPTextConfig as HfClipConfig, CLIPTextModel

    from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from consolver_tpu.models.convert import convert_clip_text

    num_steps, batch = 6, 2
    cfg_scale = 3.0
    rng = np.random.default_rng(order_dim)
    n_actions = order_dim + scaler_dim - 1
    actions = rng.uniform(-0.3, 0.3, (num_steps, batch, n_actions)).astype(
        np.float32
    )
    noise = rng.standard_normal((batch, 3, 4, 4)).astype(np.float32)
    prompts = ["a b c", "d e"]

    # --- shared tiny real tokenizer + torch CLIP text model ---
    tok = make_tiny_clip_tokenizer(str(tmp_path))
    tok.model_max_length = 8
    vocab = len(tok.get_vocab())
    hf_cfg = HfClipConfig(
        vocab_size=vocab, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=tok.eos_token_id, bos_token_id=tok.bos_token_id,
        pad_token_id=tok.pad_token_id,
    )
    torch.manual_seed(0)
    hf_clip = CLIPTextModel(hf_cfg).eval()

    # --- reference rollout: the ACTUAL recorder + ACTUAL scheduler ---
    ref_mod = load_reference("denoise_ppo.py")
    sched_mod = load_reference("scheduler_ppo.py")
    sched = sched_mod.PPOScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", timestep_spacing="trailing",
        steps_offset=1, order_dim=order_dim, scaler_dim=scaler_dim,
    )
    sched.factor_net = FixedActionNet(list(actions))
    lat_ref, conds_ref, probs_ref, actions_ref, masks_ref, _ = (
        ref_mod.denoise_diffusion(
            _TorchTextEncoder(hf_clip), sched, _TorchFakeUNet(),
            torch.from_numpy(noise.copy()), list(prompts), tok,
            cfg=cfg_scale, num_inference_steps=num_steps,
        )
    )
    capsys.readouterr()  # swallow the reference's per-step prints

    # --- our pipeline: same tokenizer ids -> converted encoder -> scan ---
    enc = ClipTextEncoder(ClipTextConfig(
        vocab_size=vocab, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=77,
    ))
    enc_params = convert_clip_text(hf_clip.state_dict())
    ids = tokenize_batch(tok, prompts, tok.model_max_length)
    unc_ids = uncond_input_ids(tok, batch, tok.model_max_length)
    context = enc.apply(enc_params, jnp.asarray(ids))
    uncond_context = enc.apply(enc_params, jnp.asarray(unc_ids))

    our_sched = schedules.DiffusionSchedule.sd15()
    ts = schedules.spaced_timesteps(1000, num_steps, "trailing", 1)
    fcfg = FactorNetConfig(
        order_dim=order_dim, scaler_dim=scaler_dim, num_actions=11,
        family="sd",
    )
    fnet = _LookupActionNet(fcfg, ts, actions)
    denoise = make_denoise_fn(
        _jax_fake_unet, our_sched, fnet, num_steps, cfg_scale,
        timestep_spacing="trailing", steps_offset=1,
    )
    # NCHW reference latents vs our NHWC: the fake unet and solver are
    # layout-agnostic elementwise/broadcast ops, so run ours in NCHW too
    lat_our, traj = denoise(
        None, None, jax.random.key(0), jnp.asarray(noise), context,
        uncond_context,
    )

    np.testing.assert_allclose(
        np.asarray(lat_our), lat_ref.numpy(), rtol=1e-4, atol=1e-4
    )
    # trajectory stacking: [B, S-1, ...] with step 0 dropped, same masks,
    # same recorded actions, same conds t-ladder
    np.testing.assert_allclose(
        np.asarray(traj.actions), actions_ref.numpy(), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(traj.masks), masks_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(traj.conds_x), conds_ref["x"].numpy(), atol=1e-4
    )
    assert traj.probs.shape == tuple(probs_ref.shape)
