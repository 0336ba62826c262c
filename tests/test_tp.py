"""Tensor-parallel sharding: FLUX DiT forward over a (data x model) mesh on
the virtual 8-device CPU mesh, equivalence vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from consolver_tpu.dist import mesh as meshlib
from consolver_tpu.dist.tp import FLUX_TP_RULES, shard_params_by_rules
from consolver_tpu.models import flux
from consolver_tpu.models.flux import FluxConfig, FluxTransformer


def _tiny_flux():
    cfg = FluxConfig.tiny()  # hidden 48, heads 2 — head dim divides tp=2
    model = FluxTransformer(cfg)
    b, s_txt = 4, 4
    img = flux.pack_latents(jnp.zeros((b, 8, 8, cfg.in_channels // 4)))
    txt = jax.random.normal(jax.random.key(1), (b, s_txt, cfg.joint_text_dim))
    pooled = jax.random.normal(jax.random.key(2), (b, cfg.pooled_text_dim))
    t = jnp.full((b,), 500.0)
    g = jnp.full((b,), 2.5)
    img_ids = flux.latent_image_ids(8, 8)
    txt_ids = jnp.zeros((s_txt, 3))
    params = jax.jit(model.init)(jax.random.key(0), img, txt, pooled, t, g, img_ids, txt_ids)
    img = jax.random.normal(jax.random.key(3), img.shape)
    return model, params, (img, txt, pooled, t, g, img_ids, txt_ids)


def test_tp_sharded_forward_matches_replicated():
    model, params, args = _tiny_flux()
    ref = np.asarray(model.apply(params, *args))

    mesh = meshlib.make_mesh(
        axis_shape=(4, 2), axis_names=(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
    )
    sharded = shard_params_by_rules(mesh, params, FLUX_TP_RULES)
    batch_sharding = meshlib.batch_sharding(mesh)
    args_sharded = [jax.device_put(args[0], batch_sharding)] + [
        jax.device_put(a, meshlib.replicated(mesh)) for a in args[1:]
    ]
    out = jax.jit(model.apply)(sharded, *args_sharded)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_rules_actually_shard():
    model, params, args = _tiny_flux()
    mesh = meshlib.make_mesh(
        axis_shape=(4, 2), axis_names=(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
    )
    sharded = shard_params_by_rules(mesh, params, FLUX_TP_RULES)
    kern = sharded["params"]["transformer_blocks_0"]["attn_to_q"]["kernel"]
    assert len(kern.sharding.device_set) == 8
    assert tuple(kern.sharding.spec) == (None, meshlib.MODEL_AXIS)


def test_divisibility_fallback_replicates():
    mesh = meshlib.make_mesh(
        axis_shape=(1, 8), axis_names=(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
    )
    odd = {"attn_to_q": {"kernel": jnp.zeros((6, 6))}}  # 6 % 8 != 0
    sharded = shard_params_by_rules(mesh, odd, FLUX_TP_RULES)
    spec = tuple(sharded["attn_to_q"]["kernel"].sharding.spec)
    assert all(s is None for s in spec) or spec == ()


def _quantized_tiny_flux(bits):
    from consolver_tpu.kernels.quant import quantize_params_like

    model, params, args = _tiny_flux()
    cfg = model.cfg
    qcfg = FluxConfig(**{
        **cfg.__dict__,
        ("quant_int4" if bits == 4 else "quant_int8"): True,
    })
    qmodel = FluxTransformer(qcfg)
    qshapes = jax.eval_shape(qmodel.init, jax.random.key(0), *args)
    return qmodel, quantize_params_like(qshapes, params), args


def test_tp_rules_shard_int4_packed_leaves():
    """Packed int4 leaves inherit the float kernel's rule: kernel_packed
    [in//2, out] and the group-wise kernel_scale [groups, out] shard
    dim-for-dim with the kernel (tp._spec_for_leaf)."""
    qmodel, qparams, args = _quantized_tiny_flux(bits=4)
    mesh = meshlib.make_mesh(
        axis_shape=(4, 2), axis_names=(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
    )
    sharded = shard_params_by_rules(mesh, qparams, FLUX_TP_RULES)
    blk = sharded["params"]["transformer_blocks_0"]
    packed = blk["attn_to_q"]["kernel_packed"]
    assert tuple(packed.sharding.spec) == (None, meshlib.MODEL_AXIS)
    scale = blk["attn_to_q"]["kernel_scale"]
    assert tuple(scale.sharding.spec) == (None, meshlib.MODEL_AXIS)
    # input-split projection: packed rows (in//2) shard over the model axis
    out_packed = blk["attn_to_out_0"]["kernel_packed"]
    assert tuple(out_packed.sharding.spec) == (meshlib.MODEL_AXIS, None)
    # its scale has groups=1 (tiny input -> per-channel fallback): 1 % 2 != 0
    # so the divisibility guard replicates it
    out_scale = blk["attn_to_out_0"]["kernel_scale"]
    spec = tuple(out_scale.sharding.spec)
    assert all(s is None for s in spec) or spec == ()

    # the sharded int4 forward matches the unsharded quantized forward
    ref = np.asarray(qmodel.apply(qparams, *args))
    batch_sharding = meshlib.batch_sharding(mesh)
    args_sharded = [jax.device_put(args[0], batch_sharding)] + [
        jax.device_put(a, meshlib.replicated(mesh)) for a in args[1:]
    ]
    out = jax.jit(qmodel.apply)(sharded, *args_sharded)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_tp_rules_shard_int8_scale_with_kernel():
    """int8 per-channel kernel_scale [out] follows the kernel's OUTPUT-dim
    sharding (split for head-parallel projections, replicated for
    input-split ones)."""
    qmodel, qparams, args = _quantized_tiny_flux(bits=8)
    mesh = meshlib.make_mesh(
        axis_shape=(4, 2), axis_names=(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
    )
    sharded = shard_params_by_rules(mesh, qparams, FLUX_TP_RULES)
    blk = sharded["params"]["transformer_blocks_0"]
    assert tuple(blk["attn_to_q"]["kernel"].sharding.spec) == (
        None, meshlib.MODEL_AXIS)
    assert tuple(blk["attn_to_q"]["kernel_scale"].sharding.spec) == (
        meshlib.MODEL_AXIS,)
    out_spec = tuple(blk["attn_to_out_0"]["kernel_scale"].sharding.spec)
    assert all(s is None for s in out_spec) or out_spec == ()

    ref = np.asarray(qmodel.apply(qparams, *args))
    batch_sharding = meshlib.batch_sharding(mesh)
    args_sharded = [jax.device_put(args[0], batch_sharding)] + [
        jax.device_put(a, meshlib.replicated(mesh)) for a in args[1:]
    ]
    out = jax.jit(qmodel.apply)(sharded, *args_sharded)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
