"""InceptionV3, re-implemented in flax.

Backs the reference's 'inception' cosine reward (reward_model.py:98-108,
319-356: the stock torchvision ``inception_v3(aux_logits=True)`` called in
eval mode — whose forward runs THROUGH the final fc, so the reward cosines
the 1000-class logits despite its "features" comment; use
``num_classes=1000``) and the FID feature stream (fid_test.py via
clean-fid's pool3 features; use ``num_classes=0`` for the 2048-d pooled
output).  Torchvision checkpoint layout converts mechanically; conv+BN
pairs fold into inference-mode affine batch norms.  NHWC.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Pad = Union[int, Tuple[int, int]]


class BasicConv(nn.Module):
    """Conv (no bias) + inference BatchNorm (eps 1e-3) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bn_bias", nn.initializers.zeros_init(), (c,))
        mean = self.param("bn_mean", nn.initializers.zeros_init(), (c,))
        var = self.param("bn_var", nn.initializers.ones_init(), (c,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + 1e-3) * scale
        x = (x.astype(jnp.float32) - mean) * inv + bias
        return nn.relu(x).astype(self.dtype)


def _pad2(p_h: int, p_w: int):
    return ((p_h, p_h), (p_w, p_w))


def _maxpool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


def _avgpool3(x):
    # count_include_pad=True like torch AvgPool2d default
    s = nn.avg_pool(
        x * 9.0, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
    ) / 9.0
    return s


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=_pad2(2, 2), dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=_pad2(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=_pad2(1, 1), dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=_pad2(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=_pad2(0, 3), dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=_pad2(3, 0), dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=_pad2(3, 0), dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=_pad2(0, 3), dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=_pad2(3, 0), dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=_pad2(0, 3), dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=_pad2(0, 3), dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=_pad2(3, 0), dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=_pad2(0, 1), dtype=self.dtype, name="branch3x3_2a")(b3),
                BasicConv(384, (3, 1), padding=_pad2(1, 0), dtype=self.dtype, name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=_pad2(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=_pad2(0, 1), dtype=self.dtype, name="branch3x3dbl_3a")(bd),
                BasicConv(384, (3, 1), padding=_pad2(1, 0), dtype=self.dtype, name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """images NHWC (Inception-normalized, 299x299) -> pooled features
    [B, 2048] (``num_classes=0``, the FID/pool3 configuration) or class
    logits [B, num_classes] (``num_classes=1000``, the reward's stock
    eval-mode forward incl. fc, reward_model.py:339-341)."""

    dtype: jnp.dtype = jnp.float32
    num_classes: int = 0

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = BasicConv(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x.astype(d))
        x = BasicConv(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=_pad2(1, 1), dtype=d, name="Conv2d_2b_3x3")(x)
        x = _maxpool(x)
        x = BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _maxpool(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(dtype=d, name="Mixed_7b")(x)
        x = InceptionE(dtype=d, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool
        if self.num_classes:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x


def convert_inception(state_dict, dtype=np.float32, keep_fc: bool = False):
    """torchvision inception_v3 state dict -> InceptionV3 params.

    Torchvision layout: '<Block>.<branch>.conv.weight' and
    '<Block>.<branch>.bn.{weight,bias,running_mean,running_var}'.
    The aux classifier (AuxLogits.*) is always dropped; ``keep_fc=True``
    keeps the final classifier (the reward configuration, num_classes=1000),
    ``False`` drops it (the FID/pool3 configuration).
    """
    from consolver_tpu.models import convert as _c

    skip = ("AuxLogits.",) if keep_fc else ("AuxLogits.", "fc.")
    filtered = {
        k: v for k, v in state_dict.items() if not k.startswith(skip)
    }
    renames = (
        (r"\.bn\.weight$", ".bn_scale"),
        (r"\.bn\.bias$", ".bn_bias"),
        (r"\.bn\.running_mean$", ".bn_mean"),
        (r"\.bn\.running_var$", ".bn_var"),
    )
    return _c.convert_state_dict(filtered, renames=renames, dtype=dtype)


INCEPTION_MEAN = (0.485, 0.456, 0.406)
INCEPTION_STD = (0.229, 0.224, 0.225)


def make_inception_encoder(model: InceptionV3, params):
    """RewardModel.encode / FID encode_fn: [B,H,W,3] in [0,1] ->
    [B, 2048] features or [B, num_classes] logits.

    Preprocessing mirrors the reward's processor (reward_model.py:102-107):
    Resize(299, BICUBIC) on the shortest edge + CenterCrop(299) +
    ImageNet normalize."""
    from consolver_tpu.models.vit import preprocess

    def encode(images):
        x = preprocess(
            images, 299, INCEPTION_MEAN, INCEPTION_STD,
            resize_to=299, method="cubic",
        )
        return model.apply(params, x)

    return encode
