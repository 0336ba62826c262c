import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.models import vit as vit_lib
from consolver_tpu.models.vit import (
    ViT,
    ViTConfig,
    convert_clip_vision,
    convert_dinov2,
    make_encoder,
    preprocess,
)
from consolver_tpu.rewards.metrics import encoder_cosine_reward
from consolver_tpu.rewards.registry import RewardModel, make_reward_fn


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


class TestViT:
    def test_tiny_forward(self):
        cfg = ViTConfig.tiny()
        model = ViT(cfg)
        x = jnp.zeros((2, 28, 28, 3))
        params = jax.jit(model.init)(jax.random.key(0), x)
        hidden = model.apply(params, x)
        assert hidden.shape == (2, 1 + 4, cfg.hidden_size)
        feats = model.apply(params, x, method=model.features)
        assert feats.shape == (2, cfg.hidden_size)

    def test_dinov2_base_param_count(self):
        """transformers Dinov2Model base = 85,725,696 incl. the unused
        mask_token (768), which we omit."""
        model = ViT(ViTConfig.dinov2_base())
        shapes = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
        )
        assert _param_count(shapes) == 85_725_696 - 768

    def test_clip_vit_l14_param_count(self):
        """openai CLIP-ViT-L/14 vision tower + projection ~ 304M params."""
        model = ViT(ViTConfig.clip_vit_l14())
        shapes = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
        )
        n = _param_count(shapes)
        assert 300e6 < n < 310e6, n

    def test_preprocess(self):
        imgs = jnp.ones((2, 512, 512, 3)) * 0.5
        out = preprocess(imgs, 224)
        assert out.shape == (2, 224, 224, 3)
        expected = (0.5 - np.asarray(vit_lib.IMAGENET_MEAN)) / np.asarray(
            vit_lib.IMAGENET_STD
        )
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-4)

    def test_reward_integration(self):
        cfg = ViTConfig.tiny()
        model = ViT(cfg)
        params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
        encode = make_encoder(model, params, kind="dino")
        reward_fn = make_reward_fn("dino", RewardModel(encode=encode))
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.random((3, 64, 64, 3)).astype(np.float32))
        r_same = reward_fn(pred, pred)
        np.testing.assert_allclose(np.asarray(r_same), 100.0, atol=1e-2)
        target = jnp.asarray(rng.random((3, 64, 64, 3)).astype(np.float32))
        r_diff = reward_fn(pred, target)
        assert (np.asarray(r_diff) <= 100.0).all()


class TestDinov2Parity:
    def test_torch_parity(self):
        """Numerical parity vs transformers' Dinov2Model on a tiny random
        init, through the converter."""
        torch = pytest.importorskip("torch")
        try:
            from transformers import Dinov2Config, Dinov2Model
        except ImportError:
            pytest.skip("transformers Dinov2 unavailable")

        hf_cfg = Dinov2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, image_size=28, patch_size=14,
            layerscale_value=1.0,
        )
        torch.manual_seed(0)
        hf = Dinov2Model(hf_cfg).eval()
        x = np.random.default_rng(1).random((2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()

        cfg = ViTConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=2, layerscale=True,
        )
        model = ViT(cfg)
        params = convert_dinov2(hf.state_dict())
        out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)


class TestClipVisionParity:
    def test_torch_parity(self):
        torch = pytest.importorskip("torch")
        try:
            from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection
        except ImportError:
            pytest.skip("transformers CLIP unavailable")

        hf_cfg = CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, image_size=28, patch_size=14,
            projection_dim=16, hidden_act="quick_gelu",
        )
        torch.manual_seed(0)
        hf = CLIPVisionModelWithProjection(hf_cfg).eval()
        x = np.random.default_rng(2).random((2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(x)).image_embeds.numpy()

        cfg = ViTConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=2, mlp_ratio=2.0, layerscale=False, quick_gelu=True,
            pre_norm_embed=True, patch_bias=False, projection_dim=16, ln_eps=1e-5,
        )
        model = ViT(cfg)
        params = convert_clip_vision(hf.state_dict())
        feats = model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), method=model.features
        )
        np.testing.assert_allclose(np.asarray(feats), ref, rtol=2e-3, atol=2e-4)


class TestProcessorParity:
    """Preprocessing parity vs the actual transformers image processors —
    a silent resize mismatch would skew every backbone reward."""

    def test_dino_processor(self):
        pytest.importorskip("transformers")
        from transformers import BitImageProcessor

        rng = np.random.default_rng(0)
        img = rng.random((1, 512, 512, 3)).astype(np.float32)
        proc = BitImageProcessor(
            do_resize=True, size={"shortest_edge": 256}, resample=2,
            do_center_crop=True, crop_size={"height": 224, "width": 224},
            do_rescale=False, do_normalize=True,
            image_mean=list(vit_lib.IMAGENET_MEAN), image_std=list(vit_lib.IMAGENET_STD),
        )
        ref = proc(images=[img[0]], return_tensors="np",
                   input_data_format="channels_last")["pixel_values"][0].transpose(1, 2, 0)
        ours = np.asarray(preprocess(jnp.asarray(img), 224, resize_to=256))[0]
        assert float(np.abs(ref - ours).mean()) < 0.02

    def test_clip_processor(self):
        pytest.importorskip("transformers")
        from transformers import CLIPImageProcessor

        rng = np.random.default_rng(1)
        img = rng.random((1, 512, 512, 3)).astype(np.float32)
        proc = CLIPImageProcessor(
            do_resize=True, size={"shortest_edge": 224}, resample=3,
            do_center_crop=True, crop_size={"height": 224, "width": 224},
            do_rescale=False, do_normalize=True,
            image_mean=list(vit_lib.CLIP_MEAN), image_std=list(vit_lib.CLIP_STD),
            do_convert_rgb=False,
        )
        ref = proc(images=[img[0]], return_tensors="np",
                   input_data_format="channels_last")["pixel_values"][0].transpose(1, 2, 0)
        ours = np.asarray(preprocess(
            jnp.asarray(img), 224, vit_lib.CLIP_MEAN, vit_lib.CLIP_STD,
            resize_to=None, method="cubic",
        ))[0]
        assert float(np.abs(ref - ours).mean()) < 0.02
