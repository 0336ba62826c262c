import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.models.segformer import (
    Segformer,
    SegformerConfig,
    convert_segformer,
    make_segment_fn,
)


def test_tiny_forward():
    cfg = SegformerConfig.tiny()
    model = Segformer(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 8, 8, cfg.num_labels)
    assert bool(jnp.isfinite(logits).all())


def test_b4_param_count():
    """SegFormer-b4 + ADE head is ~64M params."""
    model = Segformer(SegformerConfig.b4_ade())
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 512, 512, 3))
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    assert 60e6 < n < 68e6, n


def test_segmentation_reward_integration():
    from consolver_tpu.rewards.registry import RewardModel, make_reward_fn

    cfg = SegformerConfig.tiny()
    model = Segformer(cfg)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 512, 512, 3)))
    reward_fn = make_reward_fn(
        "segmentation", RewardModel(segment=make_segment_fn(model, params))
    )
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    r_same = reward_fn(pred, pred)
    np.testing.assert_allclose(np.asarray(r_same), 100.0)


class TestTorchParity:
    def test_full_model_parity(self):
        torch = pytest.importorskip("torch")
        try:
            from transformers import SegformerConfig as HfCfg, SegformerForSemanticSegmentation
        except ImportError:
            pytest.skip("transformers Segformer unavailable")

        hf_cfg = HfCfg(
            num_encoder_blocks=2, hidden_sizes=[8, 16], depths=[1, 1],
            num_attention_heads=[1, 2], patch_sizes=[7, 3], strides=[4, 2],
            sr_ratios=[2, 1], mlp_ratios=[2, 2], decoder_hidden_size=16,
            num_labels=5, reshape_last_stage=True,
        )
        torch.manual_seed(0)
        hf = SegformerForSemanticSegmentation(hf_cfg).eval()
        x = np.random.default_rng(1).random((2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(x)).logits.numpy()

        cfg = SegformerConfig.tiny()
        model = Segformer(cfg)
        params = convert_segformer(hf.state_dict())
        out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=5e-3, atol=5e-4
        )
