import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
from consolver_tpu.models.vae import AutoencoderKL, VaeConfig, decode_latents
from consolver_tpu.models import convert


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


class TestUNet:
    def test_tiny_forward(self):
        cfg = UNetConfig.tiny()
        model = UNet2DCondition(cfg)
        x = jnp.zeros((2, 16, 16, 4))
        t = jnp.asarray([999, 500])
        ctx = jnp.zeros((2, 8, cfg.cross_attention_dim))
        params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
        out = jax.jit(model.apply)(params, x, t, ctx)
        assert out.shape == (2, 16, 16, 4)
        assert bool(jnp.isfinite(out).all())

    def test_sd15_param_count(self):
        """Structure check: SD-1.5 UNet has 859,520,964 parameters."""
        cfg = UNetConfig.sd15()
        model = UNet2DCondition(cfg)
        shapes = jax.eval_shape(
            model.init,
            jax.random.key(0),
            jnp.zeros((1, 64, 64, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 768)),
        )
        assert _param_count(shapes) == 859_520_964

    def test_timestep_conditioning_changes_output(self):
        cfg = UNetConfig.tiny()
        model = UNet2DCondition(cfg)
        x = jnp.ones((1, 8, 8, 4))
        ctx = jnp.ones((1, 4, cfg.cross_attention_dim))
        params = jax.jit(model.init)(jax.random.key(0), x, jnp.asarray([0]), ctx)
        a = model.apply(params, x, jnp.asarray([0]), ctx)
        b = model.apply(params, x, jnp.asarray([999]), ctx)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_context_conditioning_changes_output(self):
        cfg = UNetConfig.tiny()
        model = UNet2DCondition(cfg)
        x = jnp.ones((1, 8, 8, 4))
        params = jax.jit(model.init)(
            jax.random.key(0), x, jnp.asarray([10]), jnp.ones((1, 4, cfg.cross_attention_dim))
        )
        a = model.apply(params, x, jnp.asarray([10]), jnp.ones((1, 4, cfg.cross_attention_dim)))
        b = model.apply(params, x, jnp.asarray([10]), -jnp.ones((1, 4, cfg.cross_attention_dim)))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestVae:
    def test_roundtrip_shapes(self):
        cfg = VaeConfig.tiny()
        vae = AutoencoderKL(cfg)
        x = jnp.zeros((2, 16, 16, 3))
        params = jax.jit(vae.init)(jax.random.key(0), x, jax.random.key(1))
        mean, logvar = vae.apply(params, x, method=vae.encode)
        assert mean.shape == (2, 8, 8, cfg.latent_channels)
        assert logvar.shape == mean.shape
        img = vae.apply(params, mean, method=vae.decode)
        assert img.shape == (2, 16, 16, 3)

    def test_sd15_param_count(self):
        """diffusers SD-1.5 AutoencoderKL has 83,653,863 parameters."""
        vae = AutoencoderKL(VaeConfig.sd15())
        shapes = jax.eval_shape(
            vae.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jax.random.key(1)
        )
        assert _param_count(shapes) == 83_653_863

    def test_decode_latents_range(self):
        cfg = VaeConfig.tiny()
        vae = AutoencoderKL(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        params = jax.jit(vae.init)(jax.random.key(0), x, jax.random.key(1))
        z = jax.random.normal(jax.random.key(2), (1, 8, 8, 4)) * cfg.scaling_factor
        img = decode_latents(vae, params, z)
        assert img.shape == (1, 16, 16, 3)
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0

    def test_decode_latents_chunked_matches_whole_batch(self):
        """lax.map micro-batched decode == whole-batch decode (the
        reference's micro-batches of 8, utils.py:6-34), including the
        ragged tail (pad-and-slice)."""
        import numpy as np

        cfg = VaeConfig.tiny()
        vae = AutoencoderKL(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        params = jax.jit(vae.init)(jax.random.key(0), x, jax.random.key(1))
        z = jax.random.normal(jax.random.key(2), (6, 8, 8, 4)) * cfg.scaling_factor
        whole = decode_latents(vae, params, z)
        chunked = decode_latents(vae, params, z, chunk=2)
        np.testing.assert_allclose(
            np.asarray(whole), np.asarray(chunked), rtol=1e-5, atol=1e-5
        )
        # chunk >= batch falls back to the fused whole-batch call
        np.testing.assert_allclose(
            np.asarray(decode_latents(vae, params, z, chunk=8)),
            np.asarray(whole), rtol=1e-6,
        )
        # ragged: 6 % 4 != 0 -> padded to 8, decoded, sliced back
        np.testing.assert_allclose(
            np.asarray(decode_latents(vae, params, z, chunk=4)),
            np.asarray(whole), rtol=1e-5, atol=1e-5,
        )


class TestClip:
    def test_forward_shape(self):
        cfg = ClipTextConfig.tiny()
        enc = ClipTextEncoder(cfg)
        ids = jnp.zeros((2, 77), jnp.int32)
        params = jax.jit(enc.init)(jax.random.key(0), ids)
        out = enc.apply(params, ids)
        assert out.shape == (2, 77, cfg.hidden_size)

    def test_sd15_param_count(self):
        """CLIP ViT-L/14 text tower has 123,060,480 parameters."""
        enc = ClipTextEncoder(ClipTextConfig.sd15())
        shapes = jax.eval_shape(enc.init, jax.random.key(0), jnp.zeros((1, 77), jnp.int32))
        assert _param_count(shapes) == 123_060_480

    def test_causality(self):
        """Changing a later token must not affect earlier hidden states."""
        cfg = ClipTextConfig.tiny()
        enc = ClipTextEncoder(cfg)
        ids_a = jnp.asarray([[1, 2, 3, 4]])
        ids_b = jnp.asarray([[1, 2, 3, 999]])
        params = jax.jit(enc.init)(jax.random.key(0), ids_a)
        out_a = enc.apply(params, ids_a)
        out_b = enc.apply(params, ids_b)
        np.testing.assert_allclose(
            np.asarray(out_a[:, :3]), np.asarray(out_b[:, :3]), atol=1e-5
        )
        assert not np.allclose(np.asarray(out_a[:, 3]), np.asarray(out_b[:, 3]))

    def test_torch_parity(self):
        """Full-stack golden parity vs transformers' CLIPTextModel on a
        tiny random-init config (the technique proven for T5,
        tests/test_flux.py) — this encoder feeds every SD rollout
        (train_ppo.py:102-107), so a numeric deviation here would corrupt
        every generation."""
        torch = pytest.importorskip("torch")
        try:
            from transformers import CLIPTextConfig as HfClipConfig, CLIPTextModel
        except ImportError:
            pytest.skip("transformers CLIP unavailable")

        vocab = 128
        hf_cfg = HfClipConfig(
            vocab_size=vocab, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=vocab - 1, bos_token_id=0, pad_token_id=1,
        )
        torch.manual_seed(0)
        hf = CLIPTextModel(hf_cfg).eval()
        # eos token (= highest id, as in real CLIP) mid-sequence, then pad
        ids_np = np.array(
            [[0, 5, 9, 13, vocab - 1, 1, 1, 1], [0, 7, vocab - 1, 1, 1, 1, 1, 1]],
            dtype=np.int64,
        )
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids_np))
        ref_hidden = ref.last_hidden_state.numpy()
        ref_pooled = ref.pooler_output.numpy()

        from consolver_tpu.models.convert import convert_clip_text

        cfg = ClipTextConfig(
            vocab_size=vocab, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=77,
        )
        enc = ClipTextEncoder(cfg)
        params = convert_clip_text(hf.state_dict())
        out, pooled = enc.apply(params, jnp.asarray(ids_np), return_pooled=True)
        np.testing.assert_allclose(np.asarray(out), ref_hidden, rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(pooled), ref_pooled, rtol=2e-3, atol=2e-5)

    def test_uncond_context_golden(self, tmp_path):
        """The CFG negative context on REAL-tokenizer empty-prompt ids
        matches transformers' CLIPTextModel (denoise_ppo.py:39-48 tokenizes
        [""]; VERDICT r2 Missing #1).  A real CLIPTokenizer is built from
        locally-written vocab files, so this runs zero-egress."""
        torch = pytest.importorskip("torch")
        try:
            from transformers import CLIPTextConfig as HfClipConfig, CLIPTextModel
        except ImportError:
            pytest.skip("transformers CLIP unavailable")
        from tests.tokenizer_fixtures import make_tiny_clip_tokenizer

        from consolver_tpu.data.tokenizer import uncond_input_ids
        from consolver_tpu.models.convert import convert_clip_text

        tok = make_tiny_clip_tokenizer(str(tmp_path))
        vocab = len(tok.get_vocab())  # 54: startoftext, endoftext, a-z x2
        ids = uncond_input_ids(tok, 2, 8)
        # real empty-prompt encoding: [BOS, EOS, EOS...] — not zeros
        np.testing.assert_array_equal(ids[0, :2], [tok.bos_token_id, tok.eos_token_id])
        assert (ids[:, 1:] == tok.eos_token_id).all()

        hf_cfg = HfClipConfig(
            vocab_size=vocab, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=tok.eos_token_id, bos_token_id=tok.bos_token_id,
            pad_token_id=tok.pad_token_id,
        )
        torch.manual_seed(1)
        hf = CLIPTextModel(hf_cfg).eval()
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

        cfg = ClipTextConfig(
            vocab_size=vocab, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=77,
        )
        out = ClipTextEncoder(cfg).apply(
            convert_clip_text(hf.state_dict()), jnp.asarray(ids)
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-5)


class TestTorchParity:
    """Block-level numerical parity against equivalent torch modules
    (the reference's building blocks come from diffusers/torch)."""

    def test_resnet_block(self):
        torch = pytest.importorskip("torch")
        from consolver_tpu.models.layers import ResnetBlock2D

        c_in, c_out, groups = 8, 16, 4
        tnorm1 = torch.nn.GroupNorm(groups, c_in, eps=1e-5)
        tconv1 = torch.nn.Conv2d(c_in, c_out, 3, padding=1)
        ttime = torch.nn.Linear(12, c_out)
        tnorm2 = torch.nn.GroupNorm(groups, c_out, eps=1e-5)
        tconv2 = torch.nn.Conv2d(c_out, c_out, 3, padding=1)
        tshort = torch.nn.Conv2d(c_in, c_out, 1)
        for m in [tnorm1, tconv1, ttime, tnorm2, tconv2, tshort]:
            torch.nn.init.normal_(m.weight, std=0.3)
            torch.nn.init.normal_(m.bias, std=0.1)

        x = torch.randn(2, c_in, 6, 6)
        temb = torch.randn(2, 12)
        with torch.no_grad():
            h = tconv1(torch.nn.functional.silu(tnorm1(x)))
            h = h + ttime(torch.nn.functional.silu(temb))[:, :, None, None]
            h = tconv2(torch.nn.functional.silu(tnorm2(h)))
            ref = (tshort(x) + h).numpy()

        sd = {}
        for name, mod in [
            ("norm1", tnorm1), ("conv1", tconv1), ("time_emb_proj", ttime),
            ("norm2", tnorm2), ("conv2", tconv2), ("conv_shortcut", tshort),
        ]:
            for k, v in mod.state_dict().items():
                sd[f"{name}.{k}"] = v
        params = convert.convert_state_dict(sd)

        block = ResnetBlock2D(out_channels=c_out, groups=groups)
        out = block.apply(
            params,
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(temb.numpy()),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
        )

    def test_downsample_asymmetric_padding(self):
        torch = pytest.importorskip("torch")
        from consolver_tpu.models.layers import Downsample2D

        tconv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
        x = torch.randn(1, 4, 8, 8)
        with torch.no_grad():
            ref = tconv(torch.nn.functional.pad(x, (0, 1, 0, 1))).numpy()
        params = convert.convert_state_dict(
            {f"conv.{k}": v for k, v in tconv.state_dict().items()}
        )
        out = Downsample2D(4).apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
        )

    def test_attention_vs_torch_sdpa(self):
        torch = pytest.importorskip("torch")
        from consolver_tpu.kernels.attention import xla_attention

        b, s, h, d = 2, 10, 3, 8
        q = np.random.default_rng(0).standard_normal((b, s, h, d)).astype(np.float32)
        k = np.random.default_rng(1).standard_normal((b, s, h, d)).astype(np.float32)
        v = np.random.default_rng(2).standard_normal((b, s, h, d)).astype(np.float32)
        with torch.no_grad():
            ref = torch.nn.functional.scaled_dot_product_attention(
                torch.from_numpy(q).permute(0, 2, 1, 3),
                torch.from_numpy(k).permute(0, 2, 1, 3),
                torch.from_numpy(v).permute(0, 2, 1, 3),
            ).permute(0, 2, 1, 3).numpy()
        out = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TestConverter:
    def test_merge_indices(self):
        assert convert._merge_indices("down_blocks.0.resnets.1.conv1.weight") == (
            "down_blocks_0", "resnets_1", "conv1", "weight",
        )
        assert convert._merge_indices("to_out.0.weight") == ("to_out_0", "weight")
        assert convert._merge_indices("ff.net.0.proj.bias") == ("ff", "net_0", "proj", "bias")

    def test_clip_renames(self):
        sd = {
            "text_model.encoder.layers.0.mlp.fc1.weight": np.zeros((4, 2)),
            "text_model.embeddings.token_embedding.weight": np.zeros((10, 2)),
            "text_model.embeddings.position_embedding.weight": np.zeros((7, 2)),
            "text_model.final_layer_norm.weight": np.zeros((2,)),
        }
        tree = convert.convert_clip_text(sd)["params"]
        assert tree["layers_0"]["mlp_fc1"]["kernel"].shape == (2, 4)
        assert tree["token_embedding"]["embedding"].shape == (10, 2)
        assert tree["position_embedding"]["embedding"].shape == (7, 2)
        assert tree["final_layer_norm"]["scale"].shape == (2,)

    def test_tiny_unet_structure_roundtrip(self):
        """Converter output matches the init tree structure for a synthesized
        torch-style state dict derived from the flax tree itself."""
        cfg = UNetConfig.tiny()
        model = UNet2DCondition(cfg)
        init_tree = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4, cfg.cross_attention_dim)),
        )["params"]

        sd = {}

        def walk(node, prefix):
            for k, v in node.items():
                name = k
                # invert the index merge: trailing _N -> .N
                import re as _re
                name = _re.sub(r"_(\d+)$", r".\1", name)
                path = f"{prefix}.{name}" if prefix else name
                if isinstance(v, dict):
                    walk(v, path)
                else:
                    shape = v.shape
                    if k == "kernel" and len(shape) == 4:
                        sd[f"{prefix}.weight"] = np.zeros(
                            (shape[3], shape[2], shape[0], shape[1]), np.float32
                        )
                    elif k == "kernel":
                        sd[f"{prefix}.weight"] = np.zeros((shape[1], shape[0]), np.float32)
                    elif k == "scale":
                        sd[f"{prefix}.weight"] = np.zeros(shape, np.float32)
                    else:
                        sd[f"{prefix}.{k}"] = np.zeros(shape, np.float32)

        walk(init_tree, "")
        converted = convert.convert_unet(sd)["params"]
        convert.assert_tree_matches(converted, jax.tree.map(lambda x: x, init_tree))


class TestRealDiffusersKeys:
    """Converter mapping checked against REAL hub checkpoint key names (the
    publicly documented diffusers/transformers formats) — catches naming
    drift the synthesized round-trips can't."""

    def test_sd15_unet_keys_map_to_init_paths(self):
        cfg = UNetConfig.sd15()
        model = UNet2DCondition(cfg)
        init = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 64, 64, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
        )["params"]

        real_keys = {
            "conv_in.weight": (320, 4, 3, 3),
            "time_embedding.linear_1.weight": (1280, 320),
            "time_embedding.linear_2.bias": (1280,),
            "down_blocks.0.resnets.0.norm1.weight": (320,),
            "down_blocks.0.resnets.0.conv1.weight": (320, 320, 3, 3),
            "down_blocks.0.resnets.0.time_emb_proj.weight": (320, 1280),
            "down_blocks.0.attentions.0.norm.weight": (320,),
            "down_blocks.0.attentions.0.proj_in.weight": (320, 320, 1, 1),
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight": (320, 320),
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight": (320, 768),
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight": (320, 320),
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight": (2560, 320),
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight": (320, 1280),
            "down_blocks.0.attentions.0.transformer_blocks.0.norm3.weight": (320,),
            "down_blocks.0.downsamplers.0.conv.weight": (320, 320, 3, 3),
            "down_blocks.1.resnets.0.conv_shortcut.weight": (640, 320, 1, 1),
            "mid_block.resnets.0.conv2.weight": (1280, 1280, 3, 3),
            "mid_block.attentions.0.proj_out.weight": (1280, 1280, 1, 1),
            "up_blocks.0.resnets.0.conv1.weight": (1280, 2560, 3, 3),
            "up_blocks.1.upsamplers.0.conv.weight": (1280, 1280, 3, 3),
            "conv_norm_out.weight": (320,),
            "conv_out.weight": (4, 320, 3, 3),
        }
        sd = {k: np.zeros(s, np.float32) for k, s in real_keys.items()}
        tree = convert.convert_unet(sd)["params"]

        def lookup(node, path):
            for comp in path:
                assert comp in node, f"missing {comp} of {path} (have {sorted(node)[:8]}...)"
                node = node[comp]
            return node

        checks = {
            ("conv_in", "kernel"): (3, 3, 4, 320),
            ("time_embedding", "linear_1", "kernel"): (320, 1280),
            ("down_blocks_0", "resnets_0", "norm1", "scale"): (320,),
            ("down_blocks_0", "resnets_0", "time_emb_proj", "kernel"): (1280, 320),
            ("down_blocks_0", "attentions_0", "proj_in", "kernel"): (1, 1, 320, 320),
            ("down_blocks_0", "attentions_0", "transformer_blocks_0", "attn1",
             "to_out_0", "kernel"): (320, 320),
            ("down_blocks_0", "attentions_0", "transformer_blocks_0", "ff",
             "net_0", "proj", "kernel"): (320, 2560),
            ("down_blocks_0", "downsamplers_0", "conv", "kernel"): (3, 3, 320, 320),
            ("down_blocks_1", "resnets_0", "conv_shortcut", "kernel"): (1, 1, 320, 640),
            ("up_blocks_0", "resnets_0", "conv1", "kernel"): (3, 3, 2560, 1280),
            ("up_blocks_1", "upsamplers_0", "conv", "kernel"): (3, 3, 1280, 1280),
            ("conv_out", "kernel"): (3, 3, 320, 4),
        }
        for path, shape in checks.items():
            leaf = lookup(tree, path)
            assert leaf.shape == shape, (path, leaf.shape, shape)
            # and the path exists in the real init tree with the same shape
            init_leaf = lookup(init, path)
            assert tuple(init_leaf.shape) == shape, (path, init_leaf.shape)

    def test_sd_vae_keys_map(self):
        from consolver_tpu.models.vae import AutoencoderKL, VaeConfig

        vae = AutoencoderKL(VaeConfig.sd15())
        init = jax.eval_shape(
            vae.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jax.random.key(1)
        )["params"]
        real_keys = {
            "encoder.conv_in.weight": (128, 3, 3, 3),
            "encoder.down_blocks.0.resnets.0.conv1.weight": (128, 128, 3, 3),
            "encoder.down_blocks.0.downsamplers.0.conv.weight": (128, 128, 3, 3),
            "encoder.mid_block.attentions.0.to_q.weight": (512, 512),
            "encoder.mid_block.attentions.0.group_norm.weight": (512,),
            "encoder.conv_out.weight": (8, 512, 3, 3),
            "decoder.up_blocks.0.resnets.2.conv2.weight": (512, 512, 3, 3),
            "decoder.up_blocks.0.upsamplers.0.conv.weight": (512, 512, 3, 3),
            "quant_conv.weight": (8, 8, 1, 1),
            "post_quant_conv.weight": (4, 4, 1, 1),
        }
        sd = {k: np.zeros(s, np.float32) for k, s in real_keys.items()}
        tree = convert.convert_vae(sd)["params"]

        def lookup(node, path):
            for comp in path:
                assert comp in node, f"missing {comp} of {path}"
                node = node[comp]
            return node

        for path in [
            ("encoder", "conv_in", "kernel"),
            ("encoder", "down_blocks_0", "resnets_0", "conv1", "kernel"),
            ("encoder", "down_blocks_0", "downsamplers_0", "conv", "kernel"),
            ("encoder", "mid_block", "attentions_0", "to_q", "kernel"),
            ("encoder", "mid_block", "attentions_0", "group_norm", "scale"),
            ("decoder", "up_blocks_0", "resnets_2", "conv2", "kernel"),
            ("decoder", "up_blocks_0", "upsamplers_0", "conv", "kernel"),
            ("quant_conv", "kernel"),
            ("post_quant_conv", "kernel"),
        ]:
            leaf = lookup(tree, path)
            init_leaf = lookup(init, path)
            assert tuple(leaf.shape) == tuple(init_leaf.shape), (
                path, leaf.shape, init_leaf.shape,
            )
