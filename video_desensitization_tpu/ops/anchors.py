"""SSD-style prior (anchor) box generation for RetinaFace.

Behavior parity with the reference generator
(``/root/reference/detect_face/utils/anchors.py:7-41``): for each of the three
feature levels ``k`` with stride ``steps[k]`` the feature map is
``(ceil(H/step), ceil(W/step))``; priors are emitted row-major over spatial
positions with the per-level ``min_sizes`` innermost, as normalized
``[cx, cy, s_kx, s_ky]``. At 640x640 with the default config this yields
(80^2 + 40^2 + 20^2) * 2 = 16,800 priors.

TPU-first design notes: anchors are a compile-time constant — they are built
once in numpy on host and closed over by the jitted detection program, so no
device compute is spent on them.  The anchor ordering matches a NHWC head
reshape ``(B, H, W, A*C) -> (B, H*W*A, C)``, which is the natural layout on
TPU (no transposes needed, unlike the reference's NCHW permute at
``retinaface.py:20-22``).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np

# Default RetinaFace anchor configuration (reference config.py:1-29; shared by
# both the mobilenet0.25 and resnet50 variants).
DEFAULT_MIN_SIZES: Tuple[Tuple[int, ...], ...] = ((16, 32), (64, 128), (256, 512))
DEFAULT_STEPS: Tuple[int, ...] = (8, 16, 32)


def feature_map_shapes(
    image_size: Tuple[int, int], steps: Sequence[int] = DEFAULT_STEPS
) -> Tuple[Tuple[int, int], ...]:
    """Per-level feature map (height, width) = ceil(image/step)."""
    h, w = image_size
    return tuple((math.ceil(h / s), math.ceil(w / s)) for s in steps)


def num_anchors(
    image_size: Tuple[int, int],
    min_sizes: Sequence[Sequence[int]] = DEFAULT_MIN_SIZES,
    steps: Sequence[int] = DEFAULT_STEPS,
) -> int:
    """Total prior count for a given input size."""
    return sum(
        fh * fw * len(ms)
        for (fh, fw), ms in zip(feature_map_shapes(image_size, steps), min_sizes)
    )


@lru_cache(maxsize=16)
def _generate_anchors_cached(
    image_size: Tuple[int, int],
    min_sizes: Tuple[Tuple[int, ...], ...],
    steps: Tuple[int, ...],
    clip: bool,
) -> np.ndarray:
    h, w = image_size
    levels = []
    for (fh, fw), level_sizes, step in zip(
        feature_map_shapes(image_size, steps), min_sizes, steps
    ):
        a = len(level_sizes)
        # Centers: (j + 0.5) * step / W horizontally, (i + 0.5) * step / H
        # vertically; sizes normalized by the opposite image dim.
        cy = (np.arange(fh, dtype=np.float32) + 0.5) * step / h
        cx = (np.arange(fw, dtype=np.float32) + 0.5) * step / w
        cxg, cyg = np.meshgrid(cx, cy)  # (fh, fw) each, row-major over (i, j)
        centers = np.stack([cxg, cyg], axis=-1)  # (fh, fw, 2)
        centers = np.repeat(centers[:, :, None, :], a, axis=2)  # (fh, fw, a, 2)
        sizes = np.array(
            [[ms / w, ms / h] for ms in level_sizes], dtype=np.float32
        )  # (a, 2) = (s_kx, s_ky)
        sizes = np.broadcast_to(sizes, (fh, fw, a, 2))
        level = np.concatenate([centers, sizes], axis=-1).reshape(-1, 4)
        levels.append(level.astype(np.float32))
    anchors = np.concatenate(levels, axis=0)
    if clip:
        anchors = np.clip(anchors, 0.0, 1.0)
    anchors.setflags(write=False)
    return anchors


def generate_anchors(
    image_size: Tuple[int, int],
    min_sizes: Sequence[Sequence[int]] = DEFAULT_MIN_SIZES,
    steps: Sequence[int] = DEFAULT_STEPS,
    clip: bool = False,
) -> np.ndarray:
    """Build the (A, 4) float32 prior matrix ``[cx, cy, s_kx, s_ky]``.

    ``image_size`` is (height, width). Cached: repeated calls for the same
    geometry return the same read-only array (anchors are jit constants).
    """
    return _generate_anchors_cached(
        (int(image_size[0]), int(image_size[1])),
        tuple(tuple(int(m) for m in ms) for ms in min_sizes),
        tuple(int(s) for s in steps),
        bool(clip),
    )
