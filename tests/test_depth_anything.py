import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.models.depth_anything import (
    DepthAnything,
    DepthAnythingConfig,
    convert_depth_anything,
    make_depth_fn,
    resize_align_corners,
)


def test_tiny_forward():
    cfg = DepthAnythingConfig.tiny()
    model = DepthAnything(cfg)
    x = jnp.zeros((2, 28, 28, 3))
    params = jax.jit(model.init)(jax.random.key(0), x)
    depth = model.apply(params, x)
    assert depth.shape == (2, 28, 28)
    assert bool(jnp.isfinite(depth).all())
    assert float(depth.min()) >= 0.0  # relative head ends in ReLU


def test_align_corners_resize_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).random((1, 5, 7, 3)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
            mode="bilinear", align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    out = resize_align_corners(jnp.asarray(x), (10, 14))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_depth_reward_integration():
    from consolver_tpu.rewards.registry import RewardModel, make_reward_fn

    cfg = DepthAnythingConfig.tiny()
    model = DepthAnything(cfg)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
    reward_fn = make_reward_fn("depth", RewardModel(depth=make_depth_fn(model, params)))
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    r_same = reward_fn(pred, pred)
    assert (np.asarray(r_same) > 70).all()  # identical depth maps -> huge PSNR
    target = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    r_diff = reward_fn(pred, target)
    assert np.isfinite(np.asarray(r_diff)).all()


class TestTorchParity:
    def test_full_model_parity(self):
        """Numerical parity vs transformers DepthAnythingForDepthEstimation
        (tiny random config) through the converter."""
        torch = pytest.importorskip("torch")
        try:
            from transformers import (
                DepthAnythingConfig as HfDAConfig,
                DepthAnythingForDepthEstimation,
                Dinov2Config,
            )
        except ImportError:
            pytest.skip("transformers DepthAnything unavailable")

        bb = Dinov2Config(
            image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=2, intermediate_size=128, layerscale_value=1.0,
            out_indices=[1, 2, 3, 4], apply_layernorm=True,
            reshape_hidden_states=False,
        )
        hf_cfg = HfDAConfig(
            backbone_config=bb, patch_size=14, reassemble_hidden_size=32,
            reassemble_factors=[4, 2, 1, 0.5], neck_hidden_sizes=[8, 8, 8, 8],
            fusion_hidden_size=8, head_hidden_size=8,
        )
        torch.manual_seed(0)
        hf = DepthAnythingForDepthEstimation(hf_cfg).eval()
        x = np.random.default_rng(2).random((2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(x)).predicted_depth.numpy()

        cfg = DepthAnythingConfig.tiny()
        model = DepthAnything(cfg)
        params = convert_depth_anything(hf.state_dict())
        out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-3, atol=5e-4)
