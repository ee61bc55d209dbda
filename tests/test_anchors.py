"""Anchor generator vs an independent closed-form re-derivation.

Golden semantics (reference anchors.py:7-41): per level k, feature map
(ceil(H/step), ceil(W/step)); priors emitted row-major (i, then j) with the
level's min_sizes innermost; values [cx, cy, s_kx, s_ky] normalized by (W, H).
"""

import math
from itertools import product

import numpy as np

from video_desensitization_tpu.ops.anchors import (
    DEFAULT_MIN_SIZES,
    DEFAULT_STEPS,
    generate_anchors,
    num_anchors,
)


def naive_anchors(image_size, min_sizes=DEFAULT_MIN_SIZES, steps=DEFAULT_STEPS):
    h, w = image_size
    feature_maps = [[math.ceil(h / s), math.ceil(w / s)] for s in steps]
    out = []
    for k, f in enumerate(feature_maps):
        for i, j in product(range(f[0]), range(f[1])):
            for ms in min_sizes[k]:
                s_kx = ms / w
                s_ky = ms / h
                cx = (j + 0.5) * steps[k] / w
                cy = (i + 0.5) * steps[k] / h
                out.append([cx, cy, s_kx, s_ky])
    return np.array(out, dtype=np.float32)


def test_count_640():
    assert num_anchors((640, 640)) == 16800


def test_matches_naive_640():
    got = generate_anchors((640, 640))
    want = naive_anchors((640, 640))
    assert got.shape == want.shape == (16800, 4)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_matches_naive_nonsquare():
    got = generate_anchors((480, 852))
    want = naive_anchors((480, 852))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_clip():
    got = generate_anchors((64, 64), clip=True)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_cache_returns_readonly():
    a = generate_anchors((640, 640))
    b = generate_anchors((640, 640))
    assert a is b
    assert not a.flags.writeable
