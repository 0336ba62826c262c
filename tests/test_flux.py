import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.models import flux
from consolver_tpu.models.flux import FluxConfig, FluxTransformer
from consolver_tpu.models.t5 import T5Config, T5Encoder, convert_t5


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


class TestPacking:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                        jnp.float32)
        packed = flux.pack_latents(x)
        assert packed.shape == (2, 16, 16)
        out = flux.unpack_latents(packed, 8, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))

    def test_feature_order_matches_reference_pack(self):
        """Golden vs the reference's torch _pack_latents/_unpack_latents
        (edit_ppo/pipeline.py:589-609): the packed 4C feature axis must be
        channel-major (index c*4 + dy*2 + dx), because converted hub
        x_embedder/proj_out weights were trained against that wiring."""
        import torch

        rng = np.random.default_rng(7)
        nhwc = rng.standard_normal((2, 8, 6, 4)).astype(np.float32)
        b, h, w, c = nhwc.shape
        # reference formula on the NCHW tensor (pipeline.py:590-592)
        t = torch.from_numpy(nhwc).permute(0, 3, 1, 2)
        ref = t.view(b, c, h // 2, 2, w // 2, 2)
        ref = ref.permute(0, 2, 4, 1, 3, 5)
        ref = ref.reshape(b, (h // 2) * (w // 2), c * 4)
        packed = flux.pack_latents(jnp.asarray(nhwc))
        np.testing.assert_allclose(np.asarray(packed), ref.numpy())
        # reference unpack (pipeline.py:606-609) -> back to NHWC
        ru = ref.view(b, h // 2, w // 2, c, 2, 2)
        ru = ru.permute(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)
        out = flux.unpack_latents(packed, h, w)
        np.testing.assert_allclose(
            np.asarray(out), ru.permute(0, 2, 3, 1).numpy()
        )

    def test_ids(self):
        ids = flux.latent_image_ids(4, 6)
        assert ids.shape == (6, 3)
        assert float(ids[:, 0].max()) == 0.0
        np.testing.assert_allclose(np.asarray(ids[-1]), [0, 1, 2])
        ref_ids = flux.latent_image_ids(4, 6, offset=1.0)
        np.testing.assert_allclose(np.asarray(ref_ids[:, 0]), 1.0)


class TestRope:
    def test_rotation_preserves_norm(self):
        ids = flux.latent_image_ids(8, 8)
        cos, sin = flux.rope_freqs(ids, (8, 8, 8))
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 16, 3, 24)), jnp.float32
        )
        out = flux.apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )

    def test_zero_ids_identity(self):
        ids = jnp.zeros((5, 3))
        cos, sin = flux.rope_freqs(ids, (8, 8, 8))
        x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 5, 2, 24)),
                        jnp.float32)
        out = flux.apply_rope(x, cos, sin)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_relative_phase(self):
        """RoPE inner products depend only on relative positions."""
        ids_a = flux.latent_image_ids(2, 8)
        cos, sin = flux.rope_freqs(ids_a, (8, 8, 8))
        q = jnp.ones((1, 4, 1, 24))
        k = jnp.ones((1, 4, 1, 24))
        qr = flux.apply_rope(q, cos[:4], sin[:4])
        kr = flux.apply_rope(k, cos[:4], sin[:4])
        dots = np.einsum("bshd,bthd->st", np.asarray(qr), np.asarray(kr))
        # same relative offset => same dot product
        np.testing.assert_allclose(dots[0, 1], dots[1, 2], rtol=1e-5)
        np.testing.assert_allclose(dots[0, 2], dots[1, 3], rtol=1e-5)


class TestFluxModel:
    def _tiny_inputs(self, cfg):
        b, h, w, s_txt = 2, 8, 8, 4
        img = flux.pack_latents(jnp.zeros((b, h, w, cfg.in_channels // 4)))
        txt = jnp.zeros((b, s_txt, cfg.joint_text_dim))
        pooled = jnp.zeros((b, cfg.pooled_text_dim))
        t = jnp.full((b,), 500.0)
        g = jnp.full((b,), 2.5)
        img_ids = flux.latent_image_ids(h, w)
        txt_ids = jnp.zeros((s_txt, 3))
        return img, txt, pooled, t, g, img_ids, txt_ids

    def test_tiny_forward(self):
        cfg = FluxConfig.tiny()
        model = FluxTransformer(cfg)
        args = self._tiny_inputs(cfg)
        params = jax.jit(model.init)(jax.random.key(0), *args)
        out = jax.jit(model.apply)(params, *args)
        assert out.shape == (2, 16, cfg.in_channels)
        assert bool(jnp.isfinite(out).all())

    def test_kontext_sequence_concat(self):
        """Editing mode: reference-image tokens concatenated after the target
        tokens with ids[...,0]=1; output sliced to target length
        (edit_ppo/denoise_diffusion.py:145)."""
        cfg = FluxConfig.tiny()
        model = FluxTransformer(cfg)
        b, h, w = 1, 8, 8
        target = flux.pack_latents(jnp.zeros((b, h, w, cfg.in_channels // 4)))
        ref = flux.pack_latents(jnp.ones((b, h, w, cfg.in_channels // 4)))
        img = jnp.concatenate([target, ref], axis=1)
        img_ids = jnp.concatenate(
            [flux.latent_image_ids(h, w), flux.latent_image_ids(h, w, offset=1.0)],
            axis=0,
        )
        txt = jnp.zeros((b, 4, cfg.joint_text_dim))
        pooled = jnp.zeros((b, cfg.pooled_text_dim))
        params = jax.jit(model.init)(
            jax.random.key(0), img, txt, pooled, jnp.ones((b,)), jnp.ones((b,)),
            img_ids, jnp.zeros((4, 3)),
        )
        out = model.apply(
            params, img, txt, pooled, jnp.ones((b,)), jnp.ones((b,)), img_ids,
            jnp.zeros((4, 3)),
        )
        v = out[:, : target.shape[1]]  # noise_pred[:, :latents.size(1)]
        assert v.shape == target.shape
        # the reference tokens must influence the target prediction (joint attn)
        img2 = jnp.concatenate([target, -ref], axis=1)
        out2 = model.apply(
            params, img2, txt, pooled, jnp.ones((b,)), jnp.ones((b,)), img_ids,
            jnp.zeros((4, 3)),
        )
        assert not np.allclose(np.asarray(out[:, :16]), np.asarray(out2[:, :16]))

    def test_guidance_embedding_changes_output(self):
        cfg = FluxConfig.tiny()
        model = FluxTransformer(cfg)
        args = self._tiny_inputs(cfg)
        params = jax.jit(model.init)(jax.random.key(0), *args)
        a = model.apply(params, *args)
        args2 = list(args)
        args2[4] = jnp.full((2,), 7.5)
        b = model.apply(params, *args2)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_full_config_param_count(self):
        """FLUX.1-class transformer lands at ~11.9B params."""
        cfg = FluxConfig.flux_kontext()
        model = FluxTransformer(cfg)
        img = jax.ShapeDtypeStruct((1, 16, 64), jnp.float32)
        txt = jax.ShapeDtypeStruct((1, 8, 4096), jnp.float32)
        pooled = jax.ShapeDtypeStruct((1, 768), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.float32)
        g = jax.ShapeDtypeStruct((1,), jnp.float32)
        iid = jax.ShapeDtypeStruct((16, 3), jnp.float32)
        tid = jax.ShapeDtypeStruct((8, 3), jnp.float32)
        shapes = jax.eval_shape(model.init, jax.random.key(0), img, txt, pooled, t, g, iid, tid)
        n = _param_count(shapes)
        assert 11.5e9 < n < 12.5e9, n


class TestT5:
    def test_tiny_forward(self):
        cfg = T5Config.tiny()
        enc = T5Encoder(cfg)
        ids = jnp.zeros((2, 10), jnp.int32)
        params = jax.jit(enc.init)(jax.random.key(0), ids)
        out = enc.apply(params, ids)
        assert out.shape == (2, 10, cfg.d_model)

    def test_xxl_param_count(self):
        """T5-XXL encoder is ~4.76B params."""
        enc = T5Encoder(T5Config.xxl())
        shapes = jax.eval_shape(
            enc.init, jax.random.key(0), jax.ShapeDtypeStruct((1, 16), jnp.int32)
        )
        n = _param_count(shapes)
        assert 4.5e9 < n < 5.0e9, n

    def test_position_bucket_symmetric_range(self):
        from consolver_tpu.models.t5 import relative_position_buckets

        b = relative_position_buckets(8, 8)
        assert b.shape == (8, 8)
        assert b.min() >= 0 and b.max() < 32
        # bidirectional: positive and negative offsets use different halves
        assert b[0, 5] >= 16 and b[5, 0] < 16

    def test_torch_parity(self):
        """Full-stack parity vs transformers' T5EncoderModel on a tiny
        random-init config (torch cpu is available in the image)."""
        torch = pytest.importorskip("torch")
        try:
            from transformers import T5Config as HfT5Config, T5EncoderModel
        except ImportError:
            pytest.skip("transformers T5 unavailable")

        hf_cfg = HfT5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, relative_attention_num_buckets=32,
            relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
            is_encoder_decoder=False, use_cache=False, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        hf = T5EncoderModel(hf_cfg).eval()
        ids_np = np.array([[3, 5, 7, 9, 11, 2, 4, 6]], dtype=np.int64)
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids_np)).last_hidden_state.numpy()

        cfg = T5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
        )
        enc = T5Encoder(cfg)
        params = convert_t5(hf.state_dict())
        out = enc.apply(params, jnp.asarray(ids_np))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)
