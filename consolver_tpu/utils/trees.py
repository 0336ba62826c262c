"""Small param-tree utilities shared by the CLIs.

The reference loads the frozen model stack in ``weight_dtype`` (fp16/bf16
mixed precision, train_ppo.py:156-165 casts vae/text_encoder/unet before
training starts); converted checkpoints here are stored float32, so the
CLIs cast at load time instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a param tree to ``dtype``; leave
    integer leaves (packed int4/int8 weights, token tables) untouched.

    Frozen model trees at float32 are both 2x the HBM of the bf16 compute
    dtype and a per-call cast inside every compiled program; casting once
    at load matches the reference's weight_dtype behavior."""

    def cast(x):
        arr = np.asarray(x) if not isinstance(x, jax.Array) else x
        if jnp.issubdtype(arr.dtype, jnp.floating):
            return arr.astype(dtype)
        return x

    return jax.tree.map(cast, tree)
