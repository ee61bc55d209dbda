"""ResNet-50 feature backbone (NHWC, Flax), torchvision-layout compatible.

Produces the three intermediate feature maps the reference extracts with
``IntermediateLayerGetter(resnet50, {layer2, layer3, layer4})``
(reference retinaface.py:71-73): strides 8/16/32 with 512/1024/2048 channels.
The block structure matches torchvision's Bottleneck (1x1 -> 3x3(stride) ->
1x1 x4 expansion, downsample = 1x1 conv + BN) so torch checkpoints convert
weight-for-weight; layout is NHWC and compute dtype is configurable for the
MXU (bfloat16 by default in the inference engine).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

BOTTLENECK_COUNTS = {"resnet50": (3, 4, 6, 3)}


class Bottleneck(nn.Module):
    width: int  # bottleneck width; output channels = 4 * width
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(feat, k, s, pad, name):
            return nn.Conv(
                feat,
                (k, k),
                strides=(s, s),
                padding=[(pad, pad)] * 2,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        identity = x
        out = nn.relu(bn("bn1")(conv(self.width, 1, 1, 0, "conv1")(x)))
        # torchvision places the stride on the 3x3 conv.
        out = nn.relu(bn("bn2")(conv(self.width, 3, self.stride, 1, "conv2")(out)))
        out = bn("bn3")(conv(self.width * 4, 1, 1, 0, "conv3")(out))
        if self.downsample:
            identity = bn("downsample_bn")(
                conv(self.width * 4, 1, self.stride, 0, "downsample_conv")(x)
            )
        return nn.relu(out + identity)


class ResNet50Features(nn.Module):
    """Returns {1: C3 (s8), 2: C4 (s16), 3: C5 (s32)} feature dict."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[int, jnp.ndarray]:
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn1",
        )(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1): pad with -inf then max.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        counts = BOTTLENECK_COUNTS["resnet50"]
        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        outputs = {}
        for li, (n, w, s) in enumerate(zip(counts, widths, strides), start=1):
            for bi in range(n):
                x = Bottleneck(
                    width=w,
                    stride=s if bi == 0 else 1,
                    downsample=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x, train=train)
            if li >= 2:
                outputs[li - 1] = x  # layer2 -> 1, layer3 -> 2, layer4 -> 3
        return outputs
