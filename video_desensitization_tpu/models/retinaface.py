"""RetinaFace detection network (NHWC, Flax).

Graph parity with the reference (detect_face/retinaface.py:53-148): backbone
(resnet50 layer2/3/4 or mobilenet0.25 stage1/2/3) -> FPN -> 3x SSH -> three
head triples whose per-level outputs concatenate over the anchor axis to
(B, A_total, {4 | 2 | 10}); eval mode applies softmax to the class logits.

TPU-first: single NHWC program, bf16-friendly, no data-dependent shapes.
The head concat order (level-major, spatial row-major, anchor-minor) matches
the anchor table from ops.anchors exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_desensitization_tpu.models.layers import FPN, SSH, PredictionHead
from video_desensitization_tpu.models.mobilenet import MobileNetV1Features
from video_desensitization_tpu.models.resnet import ResNet50Features

Dtype = Any


class RetinaFace(nn.Module):
    cfg: Any  # config dict (cfg_re50 / cfg_mnet); FrozenDict-compatible
    mode: str = "eval"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = dict(self.cfg)
        if cfg["name"] == "mobilenet0.25":
            body = MobileNetV1Features(dtype=self.dtype, name="body")
        else:
            body = ResNet50Features(dtype=self.dtype, name="body")
        feats = body(x, train=train)

        fpn_outs = FPN(cfg["out_channel"], dtype=self.dtype, name="fpn")(
            feats, train=train
        )
        features = [
            SSH(cfg["out_channel"], dtype=self.dtype, name=f"ssh{i + 1}")(
                fpn_outs[i], train=train
            )
            for i in range(3)
        ]

        bbox = jnp.concatenate(
            [
                PredictionHead(4, dtype=self.dtype, name=f"BboxHead_{i}")(f)
                for i, f in enumerate(features)
            ],
            axis=1,
        )
        cls = jnp.concatenate(
            [
                PredictionHead(2, dtype=self.dtype, name=f"ClassHead_{i}")(f)
                for i, f in enumerate(features)
            ],
            axis=1,
        )
        landm = jnp.concatenate(
            [
                PredictionHead(10, dtype=self.dtype, name=f"LandmarkHead_{i}")(f)
                for i, f in enumerate(features)
            ],
            axis=1,
        )

        if self.mode == "train" or train:
            return bbox, cls, landm
        return bbox, jax.nn.softmax(cls.astype(jnp.float32), axis=-1), landm
