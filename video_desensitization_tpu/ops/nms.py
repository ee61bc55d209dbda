"""Shape-static greedy NMS for TPU.

The reference filters detections by confidence and runs
``torchvision.ops.batched_nms`` per image (utils_bbox.py:103-130) — a
data-dependent-shape op that cannot compile on TPU. This module provides the
numerics-equivalent fixed-shape formulation:

1. score threshold -> validity mask (no compaction),
2. ``lax.top_k`` selects the K highest-scoring candidates (K static),
3. greedy suppression over the (K, K) IoU matrix: candidate i is kept iff
   it is valid and not suppressed by a kept, higher-scoring candidate with
   IoU > threshold (torchvision uses a strict ``>`` comparison, preserved
   here), computed as a Jacobi fixpoint of the triangular keep recurrence —
   a few vectorized (K, K) rounds with early exit instead of K sequential
   loop steps (see nms_padded body).

Outputs are padded (K, 15) detections sorted by score plus a boolean keep
mask — the standard TPU "padded + mask" idiom, fully inside the jitted
program (no host sync).
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

    # Greedy NMS as a FIXPOINT, not a K-step sequential scan. The greedy
    # keep vector is the unique solution of the triangular recurrence
    #   keep[i] = valid[i] and not any(j < i, keep[j], iou[j, i] > thr)
    # (unique by strong induction on i), so Jacobi-iterating that equation
    # from keep = valid converges to EXACTLY the greedy result — after t
    # rounds every candidate whose suppression-chain depth is <= t is
    # final, and any state with keep == prev is a fixpoint and therefore
    # the greedy answer. Round count = chain depth + 1 (a handful in
    # practice) and each round is one vectorized (K, K) masked reduce,
    # vs K sequential fori_loop steps — ~20x fewer TPU loop trips at
    # K=256 (profiled: the two sequential NMS loops were 3.4% of the
    # fused program, benchmarks/profiles/r3c). torchvision's strict ``>``
    # comparison is preserved; the K-round bound guarantees termination.
    sup_mat = jnp.logical_and(
        iou > iou_thres,
        jnp.arange(k)[:, None] < jnp.arange(k)[None, :],
    )  # sup_mat[j, i]: kept j would suppress lower-ranked i

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(
            jnp.logical_and(sup_mat, keep[:, None]), axis=0
        )
        return jnp.logical_and(valid, jnp.logical_not(suppressed)), keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.logical_not(valid), jnp.int32(0))
    )

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
