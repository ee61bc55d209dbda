"""Anchor-target assignment for multibox training (shape-static).

Inverse of ops.boxes.decode_boxes/decode_landmarks with SSD-style matching:
each anchor takes the ground-truth box of highest IoU (positive above a
threshold), and every ground-truth box claims its best anchor. Ground truth
is padded to a fixed count with a validity mask — the TPU idiom replacing the
reference ecosystem's variable-length python lists.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from video_desensitization_tpu.ops.boxes import DEFAULT_VARIANCES, pairwise_iou

Array = jax.Array


def _priors_xyxy(priors: Array) -> Array:
    c, s = priors[..., :2], priors[..., 2:]
    return jnp.concatenate([c - s / 2, c + s / 2], axis=-1)


def encode_boxes(
    matched: Array, priors: Array, variances: Sequence[float] = DEFAULT_VARIANCES
) -> Array:
    """xyxy ground truth -> regression targets against priors."""
    g_c = (matched[..., :2] + matched[..., 2:]) / 2
    g_wh = jnp.maximum(matched[..., 2:] - matched[..., :2], 1e-6)
    t_c = (g_c - priors[..., :2]) / (variances[0] * priors[..., 2:])
    t_wh = jnp.log(g_wh / priors[..., 2:]) / variances[1]
    return jnp.concatenate([t_c, t_wh], axis=-1)


def encode_landmarks(
    matched: Array, priors: Array, variances: Sequence[float] = DEFAULT_VARIANCES
) -> Array:
    """(..., 10) landmark points -> regression targets."""
    pts = matched.reshape(*matched.shape[:-1], 5, 2)
    t = (pts - priors[..., None, :2]) / (variances[0] * priors[..., None, 2:])
    return t.reshape(*matched.shape)


def match_anchors(
    gt_boxes: Array,
    gt_landms: Array,
    gt_valid: Array,
    priors: Array,
    iou_threshold: float = 0.35,
) -> Tuple[Array, Array, Array]:
    """Assign each anchor a target.

    gt_boxes: (G, 4) xyxy normalized (padded); gt_landms: (G, 10) with -1 for
    faces without annotated landmarks; gt_valid: (G,) bool. priors: (A, 4).
    Returns (loc_targets (A, 4), landm_targets (A, 10), labels (A,) int32)
    where labels: 0 background, 1 face, and -1 marks positives without
    landmark supervision (face with landm loss masked).
    """
    a_xyxy = _priors_xyxy(priors)
    iou = pairwise_iou(a_xyxy, gt_boxes)  # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)  # (A,)
    best_gt_iou = jnp.max(iou, axis=1)

    # Force-match: each valid gt claims its best anchor.
    best_anchor = jnp.argmax(iou, axis=0)  # (G,)
    forced = jnp.zeros(priors.shape[0], bool).at[best_anchor].set(gt_valid)
    forced_gt = (
        jnp.zeros(priors.shape[0], jnp.int32)
        .at[best_anchor]
        .set(jnp.arange(gt_boxes.shape[0], dtype=jnp.int32))
    )
    assigned_gt = jnp.where(forced, forced_gt, best_gt)
    positive = jnp.logical_or(forced, best_gt_iou >= iou_threshold)

    matched_boxes = gt_boxes[assigned_gt]
    matched_landms = gt_landms[assigned_gt]
    loc_t = encode_boxes(matched_boxes, priors)
    landm_t = encode_landmarks(jnp.maximum(matched_landms, 0.0), priors)

    has_landm = jnp.all(matched_landms.reshape(-1, 5, 2)[..., 0] >= 0, axis=-1)
    labels = jnp.where(positive, jnp.where(has_landm, 1, -1), 0).astype(jnp.int32)
    return loc_t, landm_t, labels
