"""Shared conv building blocks (NHWC, Flax).

Equivalents of the reference's torch blocks (detect_face/nets/layers.py:10-32,
mobilenet025.py:3-19) designed NHWC/TPU-first: convolutions carry
``param_dtype=float32`` and a configurable ``dtype`` (bfloat16 on TPU) so the
MXU runs bf16 matmuls while parameters stay full precision.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def leaky_relu(x, negative_slope: float):
    if negative_slope == 0.0:
        return nn.relu(x)
    return nn.leaky_relu(x, negative_slope=negative_slope)


class ConvBN(nn.Module):
    """Conv2D (no bias) + BatchNorm [+ LeakyReLU].

    kernel: spatial size; stride; pad: symmetric padding; groups for depthwise.
    ``leaky`` < 0 disables the activation entirely (conv_bn_no_relu).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    pad: int = 1
    groups: int = 1
    leaky: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.leaky >= 0.0:
            x = leaky_relu(x, self.leaky)
        return x


def conv_bn(features, stride=1, leaky=0.0, dtype=jnp.float32, name=None):
    """3x3 conv + BN + LeakyReLU (reference layers.py:10-16)."""
    return ConvBN(features, (3, 3), stride, 1, leaky=leaky, dtype=dtype, name=name)


def conv_bn1x1(features, stride=1, leaky=0.0, dtype=jnp.float32, name=None):
    """1x1 conv + BN + LeakyReLU (reference layers.py:18-23)."""
    return ConvBN(features, (1, 1), stride, 0, leaky=leaky, dtype=dtype, name=name)


def conv_bn_no_relu(features, stride=1, dtype=jnp.float32, name=None):
    """3x3 conv + BN, no activation (reference layers.py:29-32)."""
    return ConvBN(features, (3, 3), stride, 1, leaky=-1.0, dtype=dtype, name=name)
