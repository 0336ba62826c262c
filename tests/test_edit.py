import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.core import schedules
from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
from consolver_tpu.models.flux import FluxConfig, FluxTransformer
from consolver_tpu.models.t5 import T5Config, T5Encoder
from consolver_tpu.models.vae import AutoencoderKL, VaeConfig
from consolver_tpu.pipelines.edit import FluxKontextPipeline
from consolver_tpu.policy import FactorNet, FactorNetConfig


def make_tiny_flux_pipeline():
    """Tiny random FLUX-Kontext stack (also reused by test_serve)."""
    fcfg = FluxConfig.tiny()  # in_channels=16 => latent channels 4
    transformer = FluxTransformer(fcfg)
    keys = jax.random.split(jax.random.key(0), 8)

    b, lh, lw, s_txt = 1, 8, 8, 4
    img = jnp.zeros((b, (lh // 2) * (lw // 2) * 2, fcfg.in_channels))
    t5_cfg = T5Config(vocab_size=64, d_model=fcfg.joint_text_dim, d_kv=8,
                      d_ff=64, num_layers=1, num_heads=4)
    t5 = T5Encoder(t5_cfg)
    t5_params = jax.jit(t5.init)(keys[0], jnp.zeros((1, s_txt), jnp.int32))

    clip_cfg = ClipTextConfig(vocab_size=64, hidden_size=fcfg.pooled_text_dim,
                              num_layers=1, num_heads=2, intermediate_size=32)
    clip = ClipTextEncoder(clip_cfg)
    clip_params = jax.jit(clip.init)(keys[1], jnp.zeros((1, s_txt), jnp.int32))

    vae = AutoencoderKL(VaeConfig(block_out_channels=(8, 16), layers_per_block=1,
                                  norm_num_groups=4, latent_channels=4))
    vae_params = jax.jit(vae.init)(keys[2], jnp.zeros((1, 16, 16, 3)), keys[3])

    img_ids = jnp.zeros((img.shape[1], 3))
    txt_ids = jnp.zeros((s_txt, 3))
    tr_params = jax.jit(transformer.init)(
        keys[4], img, jnp.zeros((b, s_txt, fcfg.joint_text_dim)),
        jnp.zeros((b, fcfg.pooled_text_dim)), jnp.ones((b,)), jnp.ones((b,)),
        img_ids, txt_ids,
    )

    fnet_cfg = FactorNetConfig(order_dim=2, scaler_dim=0, mu_dim=0,
                               num_actions=11, family="fm")
    fnet = FactorNet(fnet_cfg)
    return FluxKontextPipeline(
        transformer, tr_params, t5, t5_params, clip, clip_params, vae, vae_params,
        factor_net=fnet, factor_params=fnet.init(keys[5]),
    )


@pytest.fixture(scope="module")
def pipe():
    return make_tiny_flux_pipeline()


def test_fmppo_edit_rollout(pipe):
    key = jax.random.key(1)
    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    ref_image = jnp.zeros((1, 16, 16, 3))
    noise = jax.random.normal(jax.random.key(2), (1, 8, 8, 4))
    image, traj = pipe(key, t5_ids, clip_ids, ref_image, noise,
                       num_inference_steps=3)
    assert image.shape == (1, 16, 16, 3)
    assert float(image.min()) >= 0 and float(image.max()) <= 1
    assert traj.actions.shape == (1, 2, 1)
    assert bool(jnp.isfinite(image).all())


def test_baseline_euler_edit(pipe):
    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    ref_image = jnp.zeros((1, 16, 16, 3))
    noise = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    latents, traj = pipe(
        jax.random.key(4), t5_ids, clip_ids, ref_image, noise,
        num_inference_steps=3, solver="euler", decode=False,
    )
    assert latents.shape == noise.shape
    assert traj is None
    assert bool(jnp.isfinite(latents).all())


def test_true_cfg_double_forward(pipe):
    """Negative-prompt true CFG (edit_ppo/pipeline.py:1100-1115): with
    scale > 1 and a differing negative prompt the output must change; at
    scale 1 (or with no negative prompt) the embeds-only path runs."""
    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    neg_t5 = 2 * jnp.ones((1, 4), jnp.int32)
    neg_clip = 2 * jnp.ones((1, 4), jnp.int32)
    ref_image = jnp.zeros((1, 16, 16, 3))
    noise = jax.random.normal(jax.random.key(8), (1, 8, 8, 4))
    kw = dict(num_inference_steps=2, solver="euler", decode=False)

    plain, _ = pipe(jax.random.key(9), t5_ids, clip_ids, ref_image, noise, **kw)
    cfg, _ = pipe(jax.random.key(9), t5_ids, clip_ids, ref_image, noise,
                  neg_t5_ids=neg_t5, neg_clip_ids=neg_clip,
                  true_cfg_scale=4.0, **kw)
    assert not np.allclose(np.asarray(plain), np.asarray(cfg))
    assert bool(jnp.isfinite(cfg).all())

    # scale 1 reduces to the embeds-only path exactly
    at_one, _ = pipe(jax.random.key(9), t5_ids, clip_ids, ref_image, noise,
                     neg_t5_ids=neg_t5, neg_clip_ids=neg_clip,
                     true_cfg_scale=1.0, **kw)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(at_one))

    # with an IDENTICAL negative prompt the double forward is a no-op:
    # v_neg == v_pos, so any scale gives the plain output
    same_neg, _ = pipe(jax.random.key(9), t5_ids, clip_ids, ref_image, noise,
                       neg_t5_ids=t5_ids, neg_clip_ids=clip_ids,
                       true_cfg_scale=4.0, **kw)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(same_neg), rtol=1e-5, atol=1e-5
    )


def test_true_cfg_with_fmppo_solver(pipe):
    """True CFG composes with the learnable solver + trajectory recording."""
    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    noise = jax.random.normal(jax.random.key(10), (1, 8, 8, 4))
    out, traj = pipe(jax.random.key(11), t5_ids, clip_ids,
                     jnp.zeros((1, 16, 16, 3)), noise,
                     num_inference_steps=3, decode=False,
                     neg_t5_ids=2 * t5_ids, neg_clip_ids=2 * clip_ids,
                     true_cfg_scale=2.0)
    assert traj is not None and traj.actions.shape == (1, 2, 1)
    assert bool(jnp.isfinite(out).all())


def test_reference_image_conditions_output(pipe):
    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    noise = jax.random.normal(jax.random.key(5), (1, 8, 8, 4))
    out_a, _ = pipe(jax.random.key(6), t5_ids, clip_ids,
                    jnp.zeros((1, 16, 16, 3)), noise, num_inference_steps=2,
                    solver="euler", decode=False)
    out_b, _ = pipe(jax.random.key(6), t5_ids, clip_ids,
                    0.9 * jnp.ones((1, 16, 16, 3)), noise, num_inference_steps=2,
                    solver="euler", decode=False)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
