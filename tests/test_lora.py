import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.models.lora import collect_lora_pairs, merge_lora
from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition


def _tiny_unet_params():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, cfg.cross_attention_dim)),
    )
    return cfg, model, jax.tree.map(np.asarray, params)


def test_collect_peft_pairs():
    sd = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight":
            np.ones((4, 32), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight":
            np.ones((32, 4), np.float32),
    }
    pairs = collect_lora_pairs(sd)
    assert len(pairs) == 1
    down, up, s = next(iter(pairs.values()))
    assert down.shape == (4, 32) and up.shape == (32, 4)
    assert s == 1.0  # alpha defaults to rank


def test_collect_kohya_pairs():
    sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q_lora_down.weight":
            np.ones((2, 8), np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q_lora_up.weight":
            np.ones((8, 2), np.float32),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha":
            np.asarray(8.0),
    }
    pairs = collect_lora_pairs(sd)
    assert len(pairs) == 1
    down, up, s = next(iter(pairs.values()))
    assert s == 4.0  # alpha / r = 8 / 2


def test_merge_changes_only_target():
    cfg, model, params = _tiny_unet_params()
    q_kern = params["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    in_dim, out_dim = q_kern.shape
    rng = np.random.default_rng(0)
    down = rng.standard_normal((2, in_dim)).astype(np.float32)
    up = rng.standard_normal((out_dim, 2)).astype(np.float32)
    sd = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": down,
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": up,
    }
    merged = merge_lora(params, sd, scale=0.5)
    new_q = merged["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    expected = q_kern + 0.5 * (up @ down).T / 2 * 2  # alpha/r = 2/2 = 1
    np.testing.assert_allclose(new_q, expected, rtol=1e-5)
    # unrelated kernels untouched
    k_kern_old = params["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_k"]["kernel"]
    k_kern_new = merged["params"]["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_k"]["kernel"]
    np.testing.assert_array_equal(k_kern_old, k_kern_new)
    # the forward pass actually changes
    x = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 4, cfg.cross_attention_dim))
    a = model.apply(params, x, jnp.asarray([10]), ctx)
    b = model.apply(jax.tree.map(jnp.asarray, merged), x, jnp.asarray([10]), ctx)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_unmatched_target_raises():
    _, _, params = _tiny_unet_params()
    sd = {
        "down_blocks.7.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight":
            np.ones((2, 8), np.float32),
        "down_blocks.7.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight":
            np.ones((8, 2), np.float32),
    }
    with pytest.raises(KeyError):
        merge_lora(params, sd)
