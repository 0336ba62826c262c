"""W8A8 int8 path (kernels/quant.py): numerics vs the float modules, param
conversion, and the quantized UNet end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from consolver_tpu.kernels.quant import (
    Int8Conv,
    Int8Dense,
    int8_conv,
    int8_dense,
    quantize_params_like,
    quantize_weight,
)
from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition


def test_quantize_weight_roundtrip():
    w = np.random.default_rng(0).standard_normal((64, 32)).astype(np.float32)
    wq, scale = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and scale.shape == (32,)
    deq = np.asarray(wq, np.float32) * np.asarray(scale)[None, :]
    # symmetric per-channel: max error is half a quantization step per channel
    step = np.asarray(scale)
    assert (np.abs(deq - w) <= 0.5 * step[None, :] + 1e-7).all()


def test_int8_dense_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((32,)).astype(np.float32) * 0.1)
    ref = x @ w + b
    wq, scale = quantize_weight(w)
    out = int8_dense(x, wq, scale, b)
    err = np.abs(np.asarray(out - ref))
    assert err.max() < 0.05 * float(jnp.abs(ref).max()), err.max()


def test_int8_conv_close_to_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 24)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    wq, scale = quantize_weight(w)
    out = int8_conv(x, wq, scale, padding=1)
    err = np.abs(np.asarray(out - ref))
    assert err.max() < 0.05 * float(jnp.abs(ref).max()), err.max()


def test_int8_modules_match_functional():
    """Int8Dense/Int8Conv param layout converts mechanically from the float
    modules via quantize_params_like."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    dense = nn.Dense(8)
    params = jax.jit(dense.init)(jax.random.key(0), x)
    qdense = Int8Dense(8)
    qshapes = jax.eval_shape(qdense.init, jax.random.key(0), x)
    qparams = quantize_params_like(qshapes, params)
    out_q = qdense.apply(qparams, x)
    out_f = dense.apply(params, x)
    assert np.abs(np.asarray(out_q - out_f)).max() < 0.05 * float(
        jnp.abs(out_f).max() + 1e-6
    )

    xc = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    conv = nn.Conv(12, (3, 3), strides=(2, 2), padding="VALID")
    cparams = jax.jit(conv.init)(jax.random.key(1), xc)
    qconv = Int8Conv(12, (3, 3), strides=(2, 2), padding="VALID")
    qcshapes = jax.eval_shape(qconv.init, jax.random.key(1), xc)
    qcparams = quantize_params_like(qcshapes, cparams)
    out_qc = qconv.apply(qcparams, xc)
    out_fc = conv.apply(cparams, xc)
    assert out_qc.shape == out_fc.shape
    assert np.abs(np.asarray(out_qc - out_fc)).max() < 0.05 * float(
        jnp.abs(out_fc).max()
    )


def test_quantized_tiny_unet_close_to_float():
    """Full UNet with quant_int8: converted params produce outputs close to
    the float model — the serving-time quality gate in miniature."""
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (2, 4, cfg.cross_attention_dim))
    params = jax.jit(unet.init)(jax.random.key(2), x, t, ctx)
    ref = unet.apply(params, x, t, ctx)

    qcfg = UNetConfig.tiny()
    qcfg = type(qcfg)(**{**qcfg.__dict__, "quant_int8": True})
    qunet = UNet2DCondition(qcfg)
    qshapes = jax.eval_shape(qunet.init, jax.random.key(2), x, t, ctx)
    qparams = quantize_params_like(qshapes, params)
    out = qunet.apply(qparams, x, t, ctx)

    assert out.shape == ref.shape
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-8))
    assert rel < 0.10, rel
    # int8 kernels really are int8 in the converted tree
    kinds = [
        leaf.dtype
        for path, leaf in jax.tree_util.tree_flatten_with_path(qparams)[0]
        if path[-1].key == "kernel"
    ]
    assert any(k == jnp.int8 for k in kinds)


def test_unquantized_config_unchanged():
    """quant_int8 defaults off: param tree has no kernel_scale leaves."""
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4, cfg.cross_attention_dim)),
    )
    paths = [
        "/".join(p.key for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(shapes)[0]
    ]
    assert not any("kernel_scale" in p for p in paths)


def test_quantized_vae_decoder_close_to_float():
    """quant_int8 VAE: decoder runs int8, encoder stays float; decode output
    stays close to the float decode."""
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig

    cfg = VaeConfig.tiny()
    vae = AutoencoderKL(cfg)
    z = jax.random.normal(jax.random.key(0), (2, 8, 8, cfg.latent_channels))
    params = jax.jit(vae.init)(jax.random.key(1), jnp.zeros((1, 16, 16, 3)), jax.random.key(2))
    ref = vae.apply(params, z, method=vae.decode)

    qcfg = VaeConfig(**{**cfg.__dict__, "quant_int8": True})
    qvae = AutoencoderKL(qcfg)
    qshapes = jax.eval_shape(
        qvae.init, jax.random.key(1), jnp.zeros((1, 16, 16, 3)), jax.random.key(2)
    )
    qparams = quantize_params_like(qshapes, params)
    out = qvae.apply(qparams, z, method=qvae.decode)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-8))
    assert rel < 0.10, rel

    # encoder params are untouched floats (no kernel_scale under encoder)
    enc_paths = [
        "/".join(p.key for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]
    ]
    assert not any("encoder" in p and "kernel_scale" in p for p in enc_paths)
    assert any("decoder" in p and "kernel_scale" in p for p in enc_paths)


def test_int8_attention_close_to_float():
    """int8 QK/PV attention vs the XLA float reference at an SD-like shape."""
    from consolver_tpu.kernels.attention import xla_attention
    from consolver_tpu.kernels.quant import int8_attention

    rng = np.random.default_rng(5)
    b, s, h, d = 2, 64, 4, 40
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    ref = xla_attention(q, k, v)
    out = int8_attention(q, k, v)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_quantized_flux_close_to_float():
    """FluxConfig.quant_int8: stream-block projections run int8; output
    stays close to float and composes with the rope/flash attention path."""
    from consolver_tpu.models.flux import FluxConfig, FluxTransformer

    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    b, s_img, s_txt = 1, 8, 4
    img = jax.random.normal(jax.random.key(0), (b, s_img, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(1), (b, s_txt, cfg.joint_text_dim))
    pooled = jax.random.normal(jax.random.key(2), (b, cfg.pooled_text_dim))
    t = jnp.ones((b,))
    g = jnp.ones((b,))
    img_ids = jnp.zeros((s_img, 3))
    txt_ids = jnp.zeros((s_txt, 3))
    args = (img, txt, pooled, t, g, img_ids, txt_ids)
    params = jax.jit(model.init)(jax.random.key(3), *args)
    ref = model.apply(params, *args)

    qcfg = FluxConfig(**{**cfg.__dict__, "quant_int8": True})
    qmodel = FluxTransformer(qcfg)
    qshapes = jax.eval_shape(qmodel.init, jax.random.key(3), *args)
    qparams = quantize_params_like(qshapes, params)
    out = qmodel.apply(qparams, *args)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-8))
    assert rel < 0.10, rel


def test_pipeline_quantize_method():
    """TextToImagePipeline.quantize(): one call converts the serving path;
    preview stays close to the float pipeline on the same inputs."""
    from tests.test_pipeline import make_tiny_stack
    from consolver_tpu.core import schedules
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.policy import FactorNet, FactorNetConfig

    (unet, up), (te, tp), (vae, vp) = make_tiny_stack()
    fnet = FactorNet(FactorNetConfig(order_dim=2, scaler_dim=0,
                                     num_actions=11, family="sd"))
    pipe = TextToImagePipeline(
        unet, up, te, tp, vae, vp, schedules.DiffusionSchedule.sd15(),
        factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
    )
    qpipe = pipe.quantize()
    ids = jnp.ones((2, 4), jnp.int32)
    noise = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    img_f, _ = pipe(jax.random.key(2), ids, noise, num_inference_steps=3)
    img_q, _ = qpipe(jax.random.key(2), ids, noise, num_inference_steps=3)
    assert img_q.shape == img_f.shape
    mse = float(np.mean((np.asarray(img_q) - np.asarray(img_f)) ** 2))
    assert mse < 1e-3, mse


def test_edit_pipeline_quantize_method():
    from tests.test_edit import pipe as pipe_fixture  # noqa: F401

    # build the tiny edit pipeline directly (fixture is module-scoped there)
    import tests.test_edit as te_mod

    pipe = te_mod.pipe.__wrapped__()
    qpipe = pipe.quantize()
    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    ref = jnp.zeros((1, 16, 16, 3))
    noise = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    out_f, _ = pipe(jax.random.key(4), t5_ids, clip_ids, ref, noise,
                    num_inference_steps=2, solver="euler", decode=False)
    out_q, _ = qpipe(jax.random.key(4), t5_ids, clip_ids, ref, noise,
                     num_inference_steps=2, solver="euler", decode=False)
    rel = float(jnp.linalg.norm(out_q - out_f) / (jnp.linalg.norm(out_f) + 1e-8))
    assert rel < 0.15, rel


@pytest.mark.slow
def test_int8_serving_checkpoint_roundtrip(tmp_path, monkeypatch):
    """scripts/quantize_checkpoint.py: float ckpt -> int8 orbax serving ckpt
    whose trees + quant_int8 configs load back through build_pipeline and
    produce EXACTLY the in-memory .quantize() preview."""
    import sys

    from scripts.selftest_eval import run_cli, synthesize_sources
    from scripts import convert_checkpoints, quantize_checkpoint
    from scripts.train_sd15 import build_pipeline
    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.policy import FactorNet

    src, ckpts, qdst = (str(tmp_path / d) for d in ("src", "ckpts", "int8"))
    synthesize_sources(src)
    for kind in ("unet", "vae", "clip_text"):
        run_cli(convert_checkpoints, [
            "--kind", kind, "--src", f"{src}/{kind}",
            "--dst", f"{ckpts}/{kind}", "--config", "tiny",
        ])
    run_cli(quantize_checkpoint, [
        "--family", "sd", "--pretrained", ckpts, "--dst", qdst,
    ])
    import json
    with open(f"{qdst}/unet_config.json") as f:
        assert json.load(f)["quant_int8"] is True

    def build(path):
        cfg = apply_overrides(
            ExperimentConfig.sd15_ppo(), {"model.pretrained_path": path}
        )
        fnet = FactorNet(cfg.factor_net)
        return build_pipeline(cfg, fnet, fnet.init(jax.random.key(0)))

    float_pipe = build(ckpts)
    int8_pipe = build(qdst)  # loads int8 trees directly via the configs

    ids = jnp.ones((2, 4), jnp.int32)
    noise = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    img_mem, _ = float_pipe.quantize()(jax.random.key(2), ids, noise,
                                       num_inference_steps=3)
    img_ckpt, _ = int8_pipe(jax.random.key(2), ids, noise,
                            num_inference_steps=3)
    np.testing.assert_allclose(
        np.asarray(img_ckpt), np.asarray(img_mem), rtol=1e-5, atol=1e-5
    )


def test_hybrid_quant_skip_levels():
    """quant_skip_levels keeps the named resolution levels bf16 while the
    rest run int8 (v5e measurement: int8 convs lose to bf16 at the 64^2
    level, scripts/probe_requant.py); quantize_params_like converts the
    mixed tree mechanically and the hybrid output is at least as close to
    float as uniform int8."""
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (2, 4, cfg.cross_attention_dim))
    params = jax.jit(unet.init)(jax.random.key(2), x, t, ctx)
    ref = unet.apply(params, x, t, ctx)

    import dataclasses as _dc

    hcfg = _dc.replace(cfg, quant_int8=True, quant_skip_levels=(0,))
    hunet = UNet2DCondition(hcfg)
    hshapes = jax.eval_shape(hunet.init, jax.random.key(2), x, t, ctx)
    hparams = quantize_params_like(hshapes, params)
    out = hunet.apply(hparams, x, t, ctx)
    assert out.shape == ref.shape
    rel_h = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-8))
    assert rel_h < 0.10, rel_h

    # level-0 blocks stay float, deeper blocks are int8
    leaves = jax.tree_util.tree_flatten_with_path(hparams)[0]
    int8 = np.dtype(jnp.int8)

    def kernel_dtypes(prefix):
        return {
            np.dtype(leaf.dtype)
            for path, leaf in leaves
            if path[-1].key == "kernel"
            and any(prefix in getattr(p, "key", "") for p in path)
        }
    # (some kernels — e.g. time_emb_proj — stay float even in quantized
    # blocks by design, so assert int8 presence/absence, not uniformity)
    assert int8 not in kernel_dtypes("down_blocks_0")
    assert int8 in kernel_dtypes("down_blocks_1")
    assert int8 in kernel_dtypes("mid_block")
    # up_blocks_1 mirrors level 0 (highest resolution) -> float
    assert int8 not in kernel_dtypes("up_blocks_1")
    assert int8 in kernel_dtypes("up_blocks_0")

    # uniform int8 for comparison: hybrid is no worse numerically
    qcfg = _dc.replace(cfg, quant_int8=True)
    qunet = UNet2DCondition(qcfg)
    qshapes = jax.eval_shape(qunet.init, jax.random.key(2), x, t, ctx)
    qout = qunet.apply(quantize_params_like(qshapes, params), x, t, ctx)
    rel_q = float(jnp.linalg.norm(qout - ref) / (jnp.linalg.norm(ref) + 1e-8))
    assert rel_h <= rel_q + 1e-6, (rel_h, rel_q)


def test_int8_conv_channel_pad_exact():
    """Lane-padding (channel_pad=128) is numerically EXACT vs the unpadded
    conv — zero-padded channels contribute zero products — at a
    non-multiple-of-128 channel count like the UNet's 320-wide level."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 40)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 40, 24)).astype(np.float32) * 0.1)
    wq, scale = quantize_weight(w, out_axis=-1)
    bias = jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.1)
    y_padded = int8_conv(x, wq, scale, bias, channel_pad=128)
    y_plain = int8_conv(x, wq, scale, bias, channel_pad=0)
    np.testing.assert_array_equal(np.asarray(y_padded), np.asarray(y_plain))
    assert y_padded.shape == (2, 6, 6, 24)


# ---------------------------------------------------------------------------
# Int4 weight-only (W4A16) path — the MEMORY config for 11.9B FLUX serving
# (kernels/quant.py int4 section; pipelines/edit.py quantize(bits=4)).
# ---------------------------------------------------------------------------


def test_int4_pack_unpack_roundtrip():
    from consolver_tpu.kernels.quant import pack_int4, unpack_int4

    w4 = np.random.default_rng(0).integers(-8, 8, size=(256, 40)).astype(np.int8)
    packed = pack_int4(jnp.asarray(w4))
    assert packed.dtype == jnp.uint8 and packed.shape == (128, 40)
    assert (np.asarray(unpack_int4(packed)) == w4).all()


def test_int4_quantize_error_bound():
    """Group-wise symmetric int4: per-element error <= half a step of the
    element's group scale."""
    from consolver_tpu.kernels.quant import dequantize_int4, quantize_weight_int4

    w = np.random.default_rng(1).standard_normal((384, 48)).astype(np.float32)
    packed, scale = quantize_weight_int4(jnp.asarray(w), group_size=128)
    assert scale.shape == (3, 48)
    deq = np.asarray(dequantize_int4(packed, scale))
    err = np.abs(deq - w).reshape(3, 128, 48)
    assert (err <= 0.5 * np.asarray(scale)[:, None, :] + 1e-6).all()


def test_int4_group_fallback_small_input():
    """Inputs not divisible by the group size (FLUX x_embedder's 64) fall
    back to a single per-channel group."""
    from consolver_tpu.kernels.quant import quantize_weight_int4

    w = np.random.default_rng(2).standard_normal((64, 16)).astype(np.float32)
    packed, scale = quantize_weight_int4(jnp.asarray(w), group_size=128)
    assert packed.shape == (32, 16) and scale.shape == (1, 16)


def test_int4_dense_module_matches_functional():
    from consolver_tpu.kernels.quant import Int4Dense, int4_dense

    rng = np.random.default_rng(3)
    w = rng.standard_normal((256, 24)).astype(np.float32)
    b = rng.standard_normal((24,)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))

    mod = Int4Dense(24)
    shapes = jax.eval_shape(mod.init, jax.random.key(0), x)
    qparams = quantize_params_like(
        {"m": shapes["params"]}, {"m": {"kernel": w, "bias": b}}
    )["m"]
    out_mod = mod.apply({"params": qparams}, x)
    out_fn = int4_dense(
        x, qparams["kernel_packed"], qparams["kernel_scale"], qparams["bias"]
    )
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_fn))

    # close to the float layer (int4 on random normals is the worst case;
    # ~0.11 measured — real checkpoints are tamer)
    ref = np.asarray(x) @ w + b
    rel = np.linalg.norm(out_mod - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel


def test_quantized_flux_int4_close_to_float():
    """FluxConfig.quant_int4: same wiring sites as int8 but packed 4-bit
    kernels; output stays close to float (looser than int8)."""
    from consolver_tpu.models.flux import FluxConfig, FluxTransformer

    cfg = FluxConfig.tiny()
    model = FluxTransformer(cfg)
    b, s_img, s_txt = 1, 8, 4
    img = jax.random.normal(jax.random.key(0), (b, s_img, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(1), (b, s_txt, cfg.joint_text_dim))
    pooled = jax.random.normal(jax.random.key(2), (b, cfg.pooled_text_dim))
    t = jnp.ones((b,))
    g = jnp.ones((b,))
    img_ids = jnp.zeros((s_img, 3))
    txt_ids = jnp.zeros((s_txt, 3))
    args = (img, txt, pooled, t, g, img_ids, txt_ids)
    params = jax.jit(model.init)(jax.random.key(3), *args)
    ref = model.apply(params, *args)

    qcfg = FluxConfig(**{**cfg.__dict__, "quant_int4": True})
    assert qcfg.quant_mode == "int4"
    qmodel = FluxTransformer(qcfg)
    qshapes = jax.eval_shape(qmodel.init, jax.random.key(3), *args)
    qparams = quantize_params_like(qshapes, params)
    # every quantized kernel is packed uint8 at half the rows
    leaves = jax.tree.leaves_with_path(qparams)
    n_packed = sum(1 for p, v in leaves if "kernel_packed" in str(p))
    assert n_packed > 0
    out = qmodel.apply(qparams, *args)
    rel = float(jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-8))
    assert rel < 0.20, rel


def test_edit_pipeline_quantize_bits4():
    """pipe.quantize(bits=4): DiT kernels packed to half the int8 bytes;
    rollout output stays close to float."""
    from consolver_tpu.kernels.quant import tree_bytes
    import tests.test_edit as te_mod

    pipe = te_mod.pipe.__wrapped__()
    q8 = pipe.quantize()
    q4 = pipe.quantize(bits=4)

    def kernel_bytes(params, key):
        return sum(
            int(np.prod(np.shape(v))) * jnp.asarray(v).dtype.itemsize
            for p, v in jax.tree.leaves_with_path(params)
            if key in str(p)
        )

    b8 = kernel_bytes(q8.transformer_params, "kernel'")
    b4 = kernel_bytes(q4.transformer_params, "kernel_packed")
    assert 0 < b4 <= b8 / 2 + 1024, (b4, b8)

    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    ref = jnp.zeros((1, 16, 16, 3))
    noise = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    out_f, _ = pipe(jax.random.key(4), t5_ids, clip_ids, ref, noise,
                    num_inference_steps=2, solver="euler", decode=False)
    out_q, _ = q4(jax.random.key(4), t5_ids, clip_ids, ref, noise,
                  num_inference_steps=2, solver="euler", decode=False)
    rel = float(jnp.linalg.norm(out_q - out_f) / (jnp.linalg.norm(out_f) + 1e-8))
    assert rel < 0.25, rel


def test_int4_checkpoint_roundtrip(tmp_path):
    """quantize(bits=4) trees survive an orbax save/load (uint8 packed
    kernels + group scales) and the reloaded FluxConfig (quant_int4 in the
    sidecar json, as quantize_checkpoint.py writes it) rebuilds a pipeline
    producing identical outputs."""
    import dataclasses
    import json

    import orbax.checkpoint as ocp

    import tests.test_edit as te_mod
    from consolver_tpu.models.flux import FluxConfig, FluxTransformer

    pipe = te_mod.pipe.__wrapped__()
    q4 = pipe.quantize(bits=4)

    path = str(tmp_path / "transformer")
    ocp.PyTreeCheckpointer().save(path, jax.device_get(q4.transformer_params))
    cfg_json = json.loads(json.dumps(dataclasses.asdict(q4.transformer.cfg)))
    assert cfg_json["quant_int4"] is True

    cfg2 = FluxConfig(**{**cfg_json, "axes_dims": tuple(cfg_json["axes_dims"])})
    tr2 = FluxTransformer(cfg2, dtype=q4.transformer.dtype)
    params2 = ocp.PyTreeCheckpointer().restore(path)

    q4b = dataclasses.replace(
        q4, transformer=tr2, transformer_params=params2
    ) if dataclasses.is_dataclass(q4) else None
    if q4b is None:  # pipeline is a plain class: rebuild by ctor
        from consolver_tpu.pipelines.edit import FluxKontextPipeline

        q4b = FluxKontextPipeline(
            tr2, params2, q4.t5, q4.t5_params, q4.clip, q4.clip_params,
            q4.vae, q4.vae_params, fm_config=q4.fm_config,
            factor_net=q4.factor_net, factor_params=q4.factor_params,
            vae_scaling_factor=q4.vae_scaling_factor,
            vae_shift_factor=q4.vae_shift_factor,
        )

    t5_ids = jnp.ones((1, 4), jnp.int32)
    clip_ids = jnp.ones((1, 4), jnp.int32)
    ref = jnp.zeros((1, 16, 16, 3))
    noise = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    out_a, _ = q4(jax.random.key(4), t5_ids, clip_ids, ref, noise,
                  num_inference_steps=2, solver="euler", decode=False)
    out_b, _ = q4b(jax.random.key(4), t5_ids, clip_ids, ref, noise,
                   num_inference_steps=2, solver="euler", decode=False)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_batch_composition_independence():
    """A sample's quantized output must be a pure function of its own
    inputs, bit-equal whether it runs solo or inside a mixed batch — the
    serving determinism contract (measured on chip: a per-TENSOR conv
    activation scale moved mixed-batch outputs by one uint8 step vs solo;
    fixed by per-sample scales in _quantize_act)."""
    from consolver_tpu.kernels.quant import int8_attention

    key = jax.random.key(11)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    # conv: row 0 alone vs row 0 next to a large-magnitude batchmate
    x0 = jax.random.normal(k1, (1, 8, 8, 16))
    x_big = 50.0 * jax.random.normal(k2, (1, 8, 8, 16))
    kern = jax.random.normal(k3, (3, 3, 16, 16))
    kq, ks = quantize_weight(kern, out_axis=-1)
    solo = int8_conv(x0, kq, ks, channel_pad=0)
    mixed = int8_conv(jnp.concatenate([x0, x_big]), kq, ks, channel_pad=0)[:1]
    np.testing.assert_array_equal(np.asarray(solo), np.asarray(mixed))

    # dense (per-token scales are already row-local; pin it anyway)
    xd0 = jax.random.normal(k4, (1, 6, 16))
    xd_big = 50.0 * jax.random.normal(k5, (1, 6, 16))
    dk = jax.random.normal(k3, (16, 8))
    dkq, dks = quantize_weight(dk, out_axis=-1)
    solo_d = int8_dense(xd0, dkq, dks)
    mixed_d = int8_dense(jnp.concatenate([xd0, xd_big]), dkq, dks)[:1]
    np.testing.assert_array_equal(np.asarray(solo_d), np.asarray(mixed_d))

    # attention (unwired, but keep the contract)
    q = jax.random.normal(k1, (1, 4, 2, 8))
    kk = jax.random.normal(k2, (1, 4, 2, 8))
    v = jax.random.normal(k4, (1, 4, 2, 8))
    big = (50.0 * jax.random.normal(k5, (1, 4, 2, 8)),) * 3
    solo_a = int8_attention(q, kk, v)
    mixed_a = int8_attention(
        jnp.concatenate([q, big[0]]), jnp.concatenate([kk, big[1]]),
        jnp.concatenate([v, big[2]]),
    )[:1]
    np.testing.assert_array_equal(np.asarray(solo_a), np.asarray(mixed_a))
