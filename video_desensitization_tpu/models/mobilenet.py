"""MobileNetV1 x0.25 backbone (NHWC, Flax).

Equivalent of the reference alternative backbone
(detect_face/nets/mobilenet025.py:22-63): three stages of depthwise-separable
convs (8 -> 16 -> 32 -> 64 -> 128 -> 256 channels), LeakyReLU(0.1), returning
{1: stage1 (s8, 64ch), 2: stage2 (s16, 128ch), 3: stage3 (s32, 256ch)}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from video_desensitization_tpu.models.common import ConvBN

Dtype = Any


class DepthwiseSeparable(nn.Module):
    """conv_dw: 3x3 depthwise + BN + LeakyReLU, then 1x1 pointwise + BN + LeakyReLU."""

    in_features: int
    out_features: int
    stride: int = 1
    leaky: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(
            self.in_features,
            (3, 3),
            self.stride,
            1,
            groups=self.in_features,
            leaky=self.leaky,
            dtype=self.dtype,
            name="dw",
        )(x, train=train)
        x = ConvBN(
            self.out_features,
            (1, 1),
            1,
            0,
            leaky=self.leaky,
            dtype=self.dtype,
            name="pw",
        )(x, train=train)
        return x


# (in, out, stride) per conv_dw within each stage (reference mobilenet025.py:25-51).
STAGE1 = [(8, 16, 1), (16, 32, 2), (32, 32, 1), (32, 64, 2), (64, 64, 1)]
STAGE2 = [(64, 128, 2)] + [(128, 128, 1)] * 5
STAGE3 = [(128, 256, 2), (256, 256, 1)]


class MobileNetV1Features(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[int, jnp.ndarray]:
        x = ConvBN(8, (3, 3), 2, 1, leaky=0.1, dtype=self.dtype, name="stage1_conv")(
            x, train=train
        )
        outputs = {}
        for si, stage in enumerate((STAGE1, STAGE2, STAGE3), start=1):
            for bi, (cin, cout, s) in enumerate(stage):
                x = DepthwiseSeparable(
                    cin, cout, s, dtype=self.dtype, name=f"stage{si}_{bi}"
                )(x, train=train)
            outputs[si] = x
        return outputs
