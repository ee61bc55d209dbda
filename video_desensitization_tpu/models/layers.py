"""FPN, SSH, and prediction heads (NHWC, Flax).

Structural equivalents of the reference modules
(detect_face/nets/layers.py:37-114, detect_face/retinaface.py:13-51):

* FPN: 1x1 lateral convs + nearest-neighbor upsample + add + 3x3 merges.
* SSH: parallel 3x3 / 5x5 (two 3x3) / 7x7 (three 3x3) branches, channel
  concat, ReLU. leaky = 0.1 iff channels <= 64.
* Heads: 1x1 convs emitting per-anchor (2 | 4 | 10) values. NHWC means the
  torch ``permute(0,2,3,1)`` is a no-op here — the reshape to
  (B, H*W*anchors, C) directly matches the reference anchor ordering.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_desensitization_tpu.models.common import conv_bn, conv_bn1x1, conv_bn_no_relu

Dtype = Any


def _upsample_nearest(x, target_hw):
    b, h, w, c = x.shape
    th, tw = target_hw
    # Exact F.interpolate(mode="nearest") semantics: src = floor(dst * h/th).
    rows = (jnp.arange(th) * h // th).astype(jnp.int32)
    cols = (jnp.arange(tw) * w // tw).astype(jnp.int32)
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Dict[int, jnp.ndarray], train: bool = False):
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        c3, c4, c5 = inputs[1], inputs[2], inputs[3]
        out1 = conv_bn1x1(self.out_channels, 1, leaky, self.dtype, name="output1")(
            c3, train=train
        )
        out2 = conv_bn1x1(self.out_channels, 1, leaky, self.dtype, name="output2")(
            c4, train=train
        )
        out3 = conv_bn1x1(self.out_channels, 1, leaky, self.dtype, name="output3")(
            c5, train=train
        )
        up3 = _upsample_nearest(out3, out2.shape[1:3])
        out2 = out2 + up3
        out2 = conv_bn(self.out_channels, 1, leaky, self.dtype, name="merge2")(
            out2, train=train
        )
        up2 = _upsample_nearest(out2, out1.shape[1:3])
        out1 = out1 + up2
        out1 = conv_bn(self.out_channels, 1, leaky, self.dtype, name="merge1")(
            out1, train=train
        )
        return [out1, out2, out3]


class SSH(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.out_channels % 4 == 0
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        half, quarter = self.out_channels // 2, self.out_channels // 4
        c3 = conv_bn_no_relu(half, 1, self.dtype, name="conv3X3")(x, train=train)
        c5_1 = conv_bn(quarter, 1, leaky, self.dtype, name="conv5X5_1")(x, train=train)
        c5 = conv_bn_no_relu(quarter, 1, self.dtype, name="conv5X5_2")(c5_1, train=train)
        c7_2 = conv_bn(quarter, 1, leaky, self.dtype, name="conv7X7_2")(
            c5_1, train=train
        )
        c7 = conv_bn_no_relu(quarter, 1, self.dtype, name="conv7x7_3")(c7_2, train=train)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class PredictionHead(nn.Module):
    """1x1 conv head -> (B, H*W*num_anchors, out_dim)."""

    out_dim: int
    num_anchors: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(
            self.num_anchors * self.out_dim,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1x1",
        )(x)
        b = out.shape[0]
        return out.reshape(b, -1, self.out_dim)
