"""Flash-attention kernel correctness (interpret mode on CPU; the real-TPU
path is exercised by bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.kernels.attention import xla_attention


def _flash_interpret(q, k, v, block_q=128, block_k=128):
    """Run the pallas kernel in interpreter mode (CPU-safe)."""
    from jax.experimental import pallas as pl
    import functools
    from consolver_tpu.kernels import flash_attention as fa

    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    qt, sq0 = fa._pad_to(qt, 1, block_q)
    kt, sk0 = fa._pad_to(kt, 1, block_k)
    vt, _ = fa._pad_to(vt, 1, block_k)
    out = pl.pallas_call(
        functools.partial(fa._flash_kernel, block_k=block_k, scale=scale, kv_len=sk0),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=(b * h, qt.shape[1] // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kt.shape[1], d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, vt.shape[1], d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=True,
    )(qt, kt, vt)
    return out[:, :sq0].reshape(b, h, sq0, d).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("sq,sk", [(256, 256), (256, 384), (200, 200)])
def test_matches_xla_attention(sq, sk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), jnp.float32)
    ref = xla_attention(q, k, v)
    out = _flash_interpret(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_softmax_stability_large_scores():
    """Large score magnitudes must not overflow the online softmax."""
    b, s, h, d = 1, 128, 1, 128
    q = jnp.full((b, s, h, d), 10.0)
    k = jnp.full((b, s, h, d), 10.0)
    v = jnp.asarray(
        np.random.default_rng(1).standard_normal((b, s, h, d)), jnp.float32
    )
    out = _flash_interpret(q, k, v)
    ref = xla_attention(q, k, v)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_supports_gate():
    from consolver_tpu.kernels.flash_attention import supports

    q = jnp.zeros((1, 4096, 24, 128))
    k = jnp.zeros((1, 4608, 24, 128))
    assert supports(q, k)
    # small head dims are NOT dispatched (padded path measured slower than
    # XLA for the SD UNet); the kernel itself still accepts them explicitly
    assert not supports(jnp.zeros((1, 4096, 8, 40)), jnp.zeros((1, 4096, 8, 40)))
    # d > 128 (VAE single-head 512) and short sequences stay on XLA
    assert not supports(jnp.zeros((1, 4096, 1, 512)), jnp.zeros((1, 4096, 1, 512)))
    assert not supports(jnp.zeros((1, 64, 24, 128)), jnp.zeros((1, 64, 24, 128)))
