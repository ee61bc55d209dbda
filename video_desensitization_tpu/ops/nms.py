"""Shape-static greedy NMS for TPU.

The reference filters detections by confidence and runs
``torchvision.ops.batched_nms`` per image (utils_bbox.py:103-130) — a
data-dependent-shape op that cannot compile on TPU. This module provides the
numerics-equivalent fixed-shape formulation:

1. score threshold -> validity mask (no compaction),
2. ``lax.top_k`` selects the K highest-scoring candidates (K static),
3. greedy suppression over the (K, K) IoU matrix via ``lax.fori_loop``:
   candidate i is kept iff it is valid and not suppressed by a kept,
   higher-scoring candidate with IoU > threshold (torchvision uses a strict
   ``>`` comparison, preserved here).

Outputs are padded (K, 15) detections sorted by score plus a boolean keep
mask — the standard TPU "padded + mask" idiom. For K in the hundreds the
suppression loop is a few hundred cheap VPU steps on a K-vector, fully inside
the jitted program (no host sync).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from video_desensitization_tpu.ops.boxes import pairwise_iou

Array = jax.Array


def nms_padded(
    detections: Array,
    conf_thres: float = 0.5,
    iou_thres: float = 0.45,
    top_k: int = 256,
) -> Tuple[Array, Array]:
    """Single-image padded NMS.

    detections: (N, C) with columns [x1, y1, x2, y2, score, ...extras].
    Returns (dets (K, C) sorted by descending score, keep (K,) bool).
    Padded rows have keep=False and score forced to 0.
    """
    scores = detections[:, 4]
    valid = scores >= conf_thres
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    k = min(top_k, detections.shape[0])
    top_scores, idx = jax.lax.top_k(masked_scores, k)
    dets = detections[idx]
    valid = top_scores > -jnp.inf

    iou = pairwise_iou(dets[:, :4], dets[:, :4])  # (K, K)

    def body(i, state):
        keep, suppressed = state
        keep_i = jnp.logical_and(valid[i], jnp.logical_not(suppressed[i]))
        keep = keep.at[i].set(keep_i)
        # Suppress strictly lower-ranked candidates overlapping > threshold.
        later = jnp.arange(k) > i
        suppressed = jnp.logical_or(
            suppressed, jnp.logical_and(keep_i, jnp.logical_and(later, iou[i] > iou_thres))
        )
        return keep, suppressed

    keep0 = jnp.zeros((k,), dtype=bool)
    sup0 = jnp.zeros((k,), dtype=bool)
    keep, _ = jax.lax.fori_loop(0, k, body, (keep0, sup0))

    # Zero out padded rows so downstream consumers can sum scores/boxes safely.
    dets = jnp.where(keep[:, None], dets, jnp.zeros_like(dets))
    return dets, keep


def batched_nms_padded(
    detections: Array,
    conf_thres: float = 0.5,
    iou_thres: float = 0.45,
    top_k: int = 256,
) -> Tuple[Array, Array]:
    """Batched padded NMS: (B, N, C) -> ((B, K, C), (B, K) bool)."""
    fn = lambda d: nms_padded(d, conf_thres, iou_thres, top_k)
    return jax.vmap(fn)(detections)
