"""Box and landmark decode + letterbox coordinate correction (pure JAX).

Numeric parity with the reference post-processing
(``/root/reference/detect_face/utils/utils_bbox.py``):

* ``decode_boxes``   — center-variance decode, variances (0.1, 0.2), then
  cxcywh -> xyxy (utils_bbox.py:49-59).
* ``decode_landmarks`` — 5-point landmark decode (utils_bbox.py:64-79).
* ``letterbox_correction`` — undo the letterbox transform, mapping normalized
  model-space coords back to normalized original-image coords
  (utils_bbox.py:12-43). Unlike the reference (a Python loop over a list of
  per-image tensors with a hardcoded ``.cuda()``), this is a fully batched,
  jittable transform over padded (B, K, 15) detections.

All functions are shape-static and differentiable; they run inside the single
jitted detection program so decode/NMS/correction never leave the TPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_VARIANCES: Tuple[float, float] = (0.1, 0.2)


def decode_boxes(
    loc: Array, priors: Array, variances: Sequence[float] = DEFAULT_VARIANCES
) -> Array:
    """Decode box regressions against priors.

    loc: (..., A, 4) regression offsets; priors: (A, 4) or broadcastable
    ``[cx, cy, s_kx, s_ky]``. Returns (..., A, 4) xyxy in normalized coords.
    """
    priors = jnp.asarray(priors, loc.dtype)
    centers = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    xy1 = centers - wh / 2
    xy2 = xy1 + wh
    return jnp.concatenate([xy1, xy2], axis=-1)


def decode_landmarks(
    landm: Array, priors: Array, variances: Sequence[float] = DEFAULT_VARIANCES
) -> Array:
    """Decode 5-point landmark regressions. landm: (..., A, 10) -> (..., A, 10)."""
    priors = jnp.asarray(priors, landm.dtype)
    a, s = priors[..., :2], priors[..., 2:]
    pts = landm.reshape(*landm.shape[:-1], 5, 2)
    decoded = a[..., None, :] + pts * variances[0] * s[..., None, :]
    return decoded.reshape(*landm.shape)


def pairwise_iou(boxes_a: Array, boxes_b: Array) -> Array:
    """IoU between two xyxy box sets: (..., M, 4) x (..., N, 4) -> (..., M, N)."""
    a = boxes_a[..., :, None, :]
    b = boxes_b[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(boxes_a[..., 2] - boxes_a[..., 0], 0.0) * jnp.maximum(
        boxes_a[..., 3] - boxes_a[..., 1], 0.0
    )
    area_b = jnp.maximum(boxes_b[..., 2] - boxes_b[..., 0], 0.0) * jnp.maximum(
        boxes_b[..., 3] - boxes_b[..., 1], 0.0
    )
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def letterbox_correction(
    detections: Array,
    input_shape: Tuple[int, int],
    image_shapes: Array,
) -> Array:
    """Map normalized letterboxed-space detections back to the original image.

    detections: (B, K, 15) [x1,y1,x2,y2,score,10*landmark] normalized to the
    model input square. input_shape: static (H, W) of the model input.
    image_shapes: (B, 2) float [h, w] original sizes. Returns same shape with
    box and landmark coords normalized to the original image.
    """
    inp = jnp.asarray(input_shape, detections.dtype)  # (2,) = (H, W)
    img = image_shapes.astype(detections.dtype)  # (B, 2) = (h, w)
    scale_ratio = jnp.min(inp / img, axis=-1, keepdims=True)  # (B, 1)
    new_shape = img * scale_ratio  # (B, 2)
    offset = (inp - new_shape) / 2.0 / inp  # (B, 2) in (y, x)... see below
    scale = inp / new_shape  # (B, 2)

    # Reference orders tensors as [H, W]; boxes are (x, y) so index 1 then 0.
    off_xy = jnp.stack([offset[:, 1], offset[:, 0]], axis=-1)  # (B, 2)
    sc_xy = jnp.stack([scale[:, 1], scale[:, 0]], axis=-1)  # (B, 2)

    off_box = jnp.tile(off_xy, (1, 2))[:, None, :]  # (B, 1, 4)
    sc_box = jnp.tile(sc_xy, (1, 2))[:, None, :]
    off_land = jnp.tile(off_xy, (1, 5))[:, None, :]  # (B, 1, 10)
    sc_land = jnp.tile(sc_xy, (1, 5))[:, None, :]

    boxes = (detections[..., :4] - off_box) * sc_box
    score = detections[..., 4:5]
    landms = (detections[..., 5:15] - off_land) * sc_land
    return jnp.concatenate([boxes, score, landms], axis=-1)


def scale_to_pixels(detections: Array, image_shapes: Array) -> Array:
    """Scale normalized (B, K, 15) detections to pixel coords of each image.

    image_shapes: (B, 2) [h, w]. Boxes scale by (w, h, w, h); landmarks by
    (w, h) per point; score untouched (reference face.py:144-146, 226-229).
    """
    w = image_shapes[:, 1:2].astype(detections.dtype)
    h = image_shapes[:, 0:1].astype(detections.dtype)
    sb = jnp.stack([w, h, w, h], axis=-1)  # (B, 1, 4)
    sl = jnp.tile(jnp.stack([w, h], axis=-1), (1, 1, 5))  # (B, 1, 10)
    return jnp.concatenate(
        [detections[..., :4] * sb, detections[..., 4:5], detections[..., 5:15] * sl],
        axis=-1,
    )
