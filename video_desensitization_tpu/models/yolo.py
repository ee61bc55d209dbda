"""YOLOv8-style license-plate detector (NHWC, Flax).

The reference loads an out-of-tree ultralytics YOLO checkpoint (``best.pt``,
combine_detect.py:872) and calls it on image batches with conf=0.5
(combine_detect.py:217). This is a from-scratch Flax implementation of the
YOLOv8 detection architecture (public design: Conv-BN-SiLU blocks, C2f, SPPF,
PAN head, decoupled box/cls heads with DFL box regression) sized by the
standard width/depth multiples, so ultralytics-format state_dicts convert
weight-for-weight (see ``convert_yolo_state_dict``).

Note the reference quirk (SURVEY.md C13): as written, its plate boxes are
silently dropped due to result-format mismatch; per the README's stated
intent we implement working plate detection.

TPU-first: one NHWC program; the DFL expectation is a tiny matmul; decode +
NMS run on device via ops.nms (shape-static). Default variant "n"
(w=0.25, d=0.33) matches the typical plate-detection checkpoint.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

REG_MAX = 16
STRIDES = (8, 16, 32)

VARIANTS = {
    # name: (depth_multiple, width_multiple, ratio)
    "n": (1 / 3, 0.25, 2.0),
    "s": (1 / 3, 0.50, 2.0),
    "m": (2 / 3, 0.75, 1.5),
    "l": (1.0, 1.00, 1.0),
    "x": (1.0, 1.25, 1.0),
}


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(math.ceil(x / divisor) * divisor))


def _width(c: int, w: float) -> int:
    return _make_divisible(c * w)


def _depth(n: int, d: float) -> int:
    return max(1, round(n * d))


class ConvBlock(nn.Module):
    """Conv2d + BN(eps=1e-3) + SiLU — ultralytics Conv."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.silu(x)


class YoloBottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBlock(self.features, 3, 1, self.dtype, name="cv1")(x, train=train)
        y = ConvBlock(self.features, 3, 1, self.dtype, name="cv2")(y, train=train)
        return x + y if self.shortcut else y


class C2f(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        y = ConvBlock(self.features, 1, 1, self.dtype, name="cv1")(x, train=train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        for i in range(self.n):
            y2 = YoloBottleneck(half, self.shortcut, self.dtype, name=f"m_{i}")(
                y2, train=train
            )
            outs.append(y2)
        return ConvBlock(self.features, 1, 1, self.dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1), train=train
        )


class SPPF(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        x = ConvBlock(half, 1, 1, self.dtype, name="cv1")(x, train=train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
        return ConvBlock(self.features, 1, 1, self.dtype, name="cv2")(
            jnp.concatenate([x, p1, p2, p3], axis=-1), train=train
        )


def _upsample2x(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class DetectHead(nn.Module):
    """Decoupled box (DFL) and class heads over three scales."""

    num_classes: int
    channels: Sequence[int]  # per-scale input channels
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2 = max(16, self.channels[0] // 4, REG_MAX * 4)
        c3 = max(self.channels[0], min(self.num_classes, 100))
        box_out, cls_out = [], []
        for i, f in enumerate(feats):
            b = ConvBlock(c2, 3, 1, self.dtype, name=f"cv2_{i}_0")(f, train=train)
            b = ConvBlock(c2, 3, 1, self.dtype, name=f"cv2_{i}_1")(b, train=train)
            b = nn.Conv(
                4 * REG_MAX,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"cv2_{i}_2",
            )(b)
            c = ConvBlock(c3, 3, 1, self.dtype, name=f"cv3_{i}_0")(f, train=train)
            c = ConvBlock(c3, 3, 1, self.dtype, name=f"cv3_{i}_1")(c, train=train)
            c = nn.Conv(
                self.num_classes,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"cv3_{i}_2",
            )(c)
            bsz = f.shape[0]
            box_out.append(b.reshape(bsz, -1, 4 * REG_MAX))
            cls_out.append(c.reshape(bsz, -1, self.num_classes))
        return jnp.concatenate(box_out, 1), jnp.concatenate(cls_out, 1)


class YoloV8(nn.Module):
    """Backbone + PAN + Detect; returns (boxes_xyxy_px, class_probs).

    Input: (B, H, W, 3) float in [0, 1] (ultralytics normalization), H and W
    multiples of 32. Boxes are in input-pixel space.
    """

    num_classes: int = 1
    variant: str = "n"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, w, r = VARIANTS[self.variant]
        c64, c128, c256, c512 = (
            _width(64, w),
            _width(128, w),
            _width(256, w),
            _width(512, w),
        )
        c_last = int(c512 * r)
        n3, n6 = _depth(3, d), _depth(6, d)

        y = ConvBlock(c64, 3, 2, self.dtype, name="m0")(x, train=train)  # P1
        y = ConvBlock(c128, 3, 2, self.dtype, name="m1")(y, train=train)  # P2
        y = C2f(c128, n3, True, self.dtype, name="m2")(y, train=train)
        y = ConvBlock(c256, 3, 2, self.dtype, name="m3")(y, train=train)  # P3
        p3 = C2f(c256, n6, True, self.dtype, name="m4")(y, train=train)
        y = ConvBlock(c512, 3, 2, self.dtype, name="m5")(p3, train=train)  # P4
        p4 = C2f(c512, n6, True, self.dtype, name="m6")(y, train=train)
        y = ConvBlock(c_last, 3, 2, self.dtype, name="m7")(p4, train=train)  # P5
        y = C2f(c_last, n3, True, self.dtype, name="m8")(y, train=train)
        p5 = SPPF(c_last, self.dtype, name="m9")(y, train=train)

        # PAN head
        u = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
        h4 = C2f(c512, n3, False, self.dtype, name="m12")(u, train=train)
        u = jnp.concatenate([_upsample2x(h4), p3], axis=-1)
        h3 = C2f(c256, n3, False, self.dtype, name="m15")(u, train=train)  # out small
        dn = ConvBlock(c256, 3, 2, self.dtype, name="m16")(h3, train=train)
        h4b = C2f(c512, n3, False, self.dtype, name="m18")(
            jnp.concatenate([dn, h4], axis=-1), train=train
        )
        dn = ConvBlock(c512, 3, 2, self.dtype, name="m19")(h4b, train=train)
        h5 = C2f(c_last, n3, False, self.dtype, name="m21")(
            jnp.concatenate([dn, p5], axis=-1), train=train
        )

        feats = [h3, h4b, h5]
        box_raw, cls_raw = DetectHead(
            self.num_classes, [h3.shape[-1], h4b.shape[-1], h5.shape[-1]],
            self.dtype, name="m22",
        )(feats, train=train)

        # Anchor grid (compile-time constants from static shapes).
        anchors, strides = [], []
        for f, s in zip(feats, STRIDES):
            hh, ww = f.shape[1], f.shape[2]
            gy, gx = jnp.meshgrid(
                jnp.arange(hh, dtype=jnp.float32) + 0.5,
                jnp.arange(ww, dtype=jnp.float32) + 0.5,
                indexing="ij",
            )
            anchors.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
            strides.append(jnp.full((hh * ww, 1), float(s), jnp.float32))
        anchor_points = jnp.concatenate(anchors, 0)  # (A, 2)
        stride_t = jnp.concatenate(strides, 0)  # (A, 1)

        # DFL: softmax over 16 bins -> expectation -> ltrb grid distances.
        bsz, a = box_raw.shape[0], box_raw.shape[1]
        dist = jax.nn.softmax(
            box_raw.reshape(bsz, a, 4, REG_MAX).astype(jnp.float32), axis=-1
        ) @ jnp.arange(REG_MAX, dtype=jnp.float32)
        lt, rb = dist[..., :2], dist[..., 2:]
        x1y1 = anchor_points - lt
        x2y2 = anchor_points + rb
        boxes = jnp.concatenate([x1y1, x2y2], -1) * stride_t  # (B, A, 4) * (A, 1)
        probs = jax.nn.sigmoid(cls_raw.astype(jnp.float32))
        return boxes, probs
