"""Training data pipeline: WIDER-face labels -> encoded anchor-target batches.

The reference ships no training code (weights arrive pre-trained,
reference face.py:50-58); RetinaFace-family checkpoints are trained on
WIDER FACE with 5-point landmark annotations ("retinaface label.txt"
format). This module closes the loop so the train step (train/step.py) can
consume real data:

* ``load_retinaface_labels`` — parses the retinaface ``label.txt`` format
  (``# <path>`` header lines; one face per line: ``x y w h`` + 5 landmark
  (x, y, visibility) triplets). Plain detection-only WIDER files (no
  landmarks) also parse — landmarks come back as -1 (loss-masked).
* ``encode_example`` — letterbox an image + its annotations to the model
  input, normalize, pad ground truth to a fixed count, and run the
  shape-static anchor matcher (train/targets.py). jit-compiled once per
  (input_hw, max_gt).
* ``batch_iterator`` — shuffled epoch iterator of ready train batches
  {"images", "loc_t", "landm_t", "labels"}.
* ``multistep_lr`` — the classic SGD schedule (warmup + milestone decays).

All shapes are static: images letterbox to ``input_hw``, ground truth pads
to ``max_gt`` with a validity mask — the TPU idiom replacing variable-length
python lists.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from video_desensitization_tpu.ops.image import BGR_MEAN, letterbox_params
from video_desensitization_tpu.train.targets import match_anchors


def load_retinaface_labels(txt_path: str) -> Dict[str, np.ndarray]:
    """Parse retinaface-style label.txt.

    Returns {relative_image_path: (N, 14) float64} rows =
    [x1, y1, x2, y2, lm_x1, lm_y1, ..., lm_x5, lm_y5] with landmark
    coordinates -1 when unannotated. Accepts 4-field (boxes only),
    14/15-field (x y w h + 5*(x, y) [+ conf]) and 19/20-field
    (x y w h + 5*(x, y, vis) [+ conf]) face lines.
    """
    out: Dict[str, np.ndarray] = {}
    path = None
    rows: List[List[float]] = []

    def flush():
        if path is not None:
            out[path] = np.asarray(rows, np.float64).reshape(-1, 14)

    with open(txt_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                flush()
                path = line[1:].strip()
                rows = []
                continue
            vals = [float(v) for v in line.split()]
            x, y, w, h = vals[:4]
            if w <= 0 or h <= 0:
                continue
            box = [x, y, x + w, y + h]
            lm = [-1.0] * 10
            rest = vals[4:]
            if len(rest) >= 15:  # 5 x (x, y, visibility) triplets
                pts = [(rest[i * 3], rest[i * 3 + 1]) for i in range(5)]
            elif len(rest) >= 10:  # 5 x (x, y) pairs
                pts = [(rest[i * 2], rest[i * 2 + 1]) for i in range(5)]
            else:
                pts = None
            if pts is not None and all(px >= 0 for px, _ in pts):
                lm = [c for p in pts for c in p]
            rows.append(box + lm)
    flush()
    return out


def _letterbox_annotations(
    ann: np.ndarray, src_hw: Tuple[int, int], dst_hw: Tuple[int, int]
) -> np.ndarray:
    """Map pixel-space (N, 14) annotations through the letterbox transform
    into NORMALIZED [0, 1] coordinates of the dst canvas."""
    ih, iw = src_hw
    h, w = dst_hw
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    sx, sy = nw / iw, nh / ih
    out = ann.astype(np.float64).copy()
    # Box corners of partially-out-of-frame faces can be legitimately
    # negative (or beyond the image) — that is geometry, not a sentinel:
    # clip them into the frame instead of corrupting them below.
    out[:, [0, 2]] = np.clip(out[:, [0, 2]], 0, iw)
    out[:, [1, 3]] = np.clip(out[:, [1, 3]], 0, ih)
    xs = [0, 2, 4, 6, 8, 10, 12]
    ys = [1, 3, 5, 7, 9, 11, 13]
    neg = out[:, 4:] < 0  # unannotated landmarks stay -1 (sentinel)
    out[:, xs] = (out[:, xs] * sx + left) / w
    out[:, ys] = (out[:, ys] * sy + top) / h
    out[:, 4:][neg] = -1.0
    return out


class TargetEncoder:
    """jit-compiled anchor-target encoder for one input geometry."""

    def __init__(self, anchors: np.ndarray, max_gt: int = 64,
                 iou_threshold: float = 0.35):
        self.anchors = jnp.asarray(anchors)
        self.max_gt = max_gt
        self._match = jax.jit(
            lambda b, l, v: match_anchors(
                b, l, v, self.anchors, iou_threshold=iou_threshold
            )
        )

    def __call__(self, ann_norm: np.ndarray):
        """(N, 14) normalized annotations -> (loc_t, landm_t, labels)."""
        g = np.full((self.max_gt, 14), -1.0, np.float32)
        n = min(len(ann_norm), self.max_gt)
        g[:n] = ann_norm[:n]
        valid = np.zeros(self.max_gt, bool)
        valid[:n] = True
        loc_t, landm_t, labels = self._match(
            jnp.asarray(g[:, :4], jnp.float32),
            jnp.asarray(g[:, 4:], jnp.float32),
            jnp.asarray(valid),
        )
        return loc_t, landm_t, labels


def encode_example(
    image: np.ndarray,
    ann: np.ndarray,
    input_hw: Tuple[int, int],
    encoder: TargetEncoder,
):
    """HWC uint8 image + (N, 14) pixel annotations -> one train example."""
    from video_desensitization_tpu.pipeline.throughput import letterbox_u8

    ih, iw = image.shape[:2]
    # Same letterbox as the inference path (shared geometry + gray fill):
    # train/inference preprocessing parity by construction.
    canvas = letterbox_u8(image, input_hw)
    x = canvas.astype(np.float32) - np.asarray(BGR_MEAN, np.float32)
    loc_t, landm_t, labels = encoder(
        _letterbox_annotations(ann, (ih, iw), input_hw)
    )
    return x, np.asarray(loc_t), np.asarray(landm_t), np.asarray(labels)


def batch_iterator(
    labels: Dict[str, np.ndarray],
    images_root: str,
    input_hw: Tuple[int, int],
    anchors: np.ndarray,
    batch_size: int = 16,
    max_gt: int = 64,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """One shuffled epoch of ready train batches (shape-static)."""
    import cv2

    encoder = TargetEncoder(anchors, max_gt=max_gt)
    keys = sorted(labels)
    order = np.arange(len(keys))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    buf_x, buf_l, buf_m, buf_c = [], [], [], []
    for idx in order:
        key = keys[idx]
        img_path = os.path.join(images_root, key)
        img = cv2.imread(img_path)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        x, loc_t, landm_t, lab = encode_example(
            img, labels[key], input_hw, encoder
        )
        buf_x.append(x)
        buf_l.append(loc_t)
        buf_m.append(landm_t)
        buf_c.append(lab)
        if len(buf_x) == batch_size:
            yield {
                "images": np.stack(buf_x),
                "loc_t": np.stack(buf_l),
                "landm_t": np.stack(buf_m),
                "labels": np.stack(buf_c),
            }
            buf_x, buf_l, buf_m, buf_c = [], [], [], []
    if buf_x and not drop_remainder:
        yield {
            "images": np.stack(buf_x),
            "loc_t": np.stack(buf_l),
            "landm_t": np.stack(buf_m),
            "labels": np.stack(buf_c),
        }


def multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Classic detector schedule: linear warmup then step decays.

    ``milestones`` are GLOBAL step counts: the decay fires at exactly that
    optimizer step regardless of warmup (join_schedules rebases the inner
    schedule's step to count - warmup_steps, so boundaries shift to match).
    """
    if warmup_steps <= 0:
        return optax.piecewise_constant_schedule(
            base_lr, {int(m): gamma for m in milestones}
        )
    boundaries = {max(1, int(m) - warmup_steps): gamma for m in milestones}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warm, sched], [warmup_steps])
