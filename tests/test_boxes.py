"""Box/landmark decode and letterbox correction vs numpy re-derivations and,
where available, vs torch (used purely as a CPU numerical oracle)."""

import numpy as np
import jax.numpy as jnp

from video_desensitization_tpu.ops.boxes import (
    decode_boxes,
    decode_landmarks,
    letterbox_correction,
    pairwise_iou,
    scale_to_pixels,
)

RNG = np.random.default_rng(42)


def _priors(n=64):
    cxcy = RNG.uniform(0.05, 0.95, (n, 2))
    wh = RNG.uniform(0.02, 0.3, (n, 2))
    return np.concatenate([cxcy, wh], -1).astype(np.float32)


def naive_decode(loc, priors, var=(0.1, 0.2)):
    centers = priors[:, :2] + loc[:, :2] * var[0] * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * var[1])
    boxes = np.concatenate([centers, wh], -1)
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def test_decode_matches_naive():
    priors = _priors()
    loc = RNG.normal(0, 1, (64, 4)).astype(np.float32)
    got = np.asarray(decode_boxes(jnp.asarray(loc), jnp.asarray(priors)))
    np.testing.assert_allclose(got, naive_decode(loc, priors), rtol=1e-5, atol=1e-6)


def test_decode_batched():
    priors = _priors()
    loc = RNG.normal(0, 1, (3, 64, 4)).astype(np.float32)
    got = np.asarray(decode_boxes(jnp.asarray(loc), jnp.asarray(priors)))
    for b in range(3):
        np.testing.assert_allclose(got[b], naive_decode(loc[b], priors), rtol=1e-5, atol=1e-6)


def test_decode_landm_matches_naive():
    priors = _priors()
    landm = RNG.normal(0, 1, (2, 64, 10)).astype(np.float32)
    got = np.asarray(decode_landmarks(jnp.asarray(landm), jnp.asarray(priors)))
    var0 = 0.1
    for b in range(2):
        want = np.concatenate(
            [
                priors[:, :2] + landm[b][:, 2 * i : 2 * i + 2] * var0 * priors[:, 2:]
                for i in range(5)
            ],
            axis=-1,
        )
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_vs_naive():
    def naive_iou(b1, b2):
        x1 = np.maximum(b1[0], b2[:, 0]); y1 = np.maximum(b1[1], b2[:, 1])
        x2 = np.minimum(b1[2], b2[:, 2]); y2 = np.minimum(b1[3], b2[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
        a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        return inter / np.maximum(a1 + a2 - inter, 1e-6)

    xy1 = RNG.uniform(0, 0.5, (16, 2)); wh = RNG.uniform(0.05, 0.5, (16, 2))
    boxes = np.concatenate([xy1, xy1 + wh], -1).astype(np.float32)
    got = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(16):
        np.testing.assert_allclose(got[i], naive_iou(boxes[i], boxes), rtol=1e-4, atol=1e-6)


def naive_correct(result, input_shape, image_shape):
    """Per-image re-derivation of reference utils_bbox.py:12-43."""
    input_shape = np.asarray(input_shape, np.float32)
    image_shape = np.asarray(image_shape, np.float32)
    new_shape = image_shape * np.min(input_shape / image_shape)
    offset = (input_shape - new_shape) / 2.0 / input_shape
    scale = input_shape / new_shape
    sb = np.array([scale[1], scale[0], scale[1], scale[0]])
    sl = np.array([scale[1], scale[0]] * 5)
    ob = np.array([offset[1], offset[0], offset[1], offset[0]])
    ol = np.array([offset[1], offset[0]] * 5)
    out = result.copy()
    out[:, :4] = (out[:, :4] - ob) * sb
    out[:, 5:] = (out[:, 5:] - ol) * sl
    return out


def test_letterbox_correction_matches_naive():
    dets = RNG.uniform(0, 1, (2, 8, 15)).astype(np.float32)
    shapes = np.array([[1080, 1920], [720, 406]], np.float32)
    got = np.asarray(
        letterbox_correction(jnp.asarray(dets), (640, 640), jnp.asarray(shapes))
    )
    for b in range(2):
        want = naive_correct(dets[b], [640, 640], shapes[b])
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_scale_to_pixels():
    dets = RNG.uniform(0, 1, (1, 4, 15)).astype(np.float32)
    shapes = np.array([[480, 640]], np.float32)
    got = np.asarray(scale_to_pixels(jnp.asarray(dets), jnp.asarray(shapes)))[0]
    np.testing.assert_allclose(got[:, 0], dets[0][:, 0] * 640, rtol=1e-6)
    np.testing.assert_allclose(got[:, 1], dets[0][:, 1] * 480, rtol=1e-6)
    np.testing.assert_allclose(got[:, 4], dets[0][:, 4], rtol=0)
    np.testing.assert_allclose(got[:, 5], dets[0][:, 5] * 640, rtol=1e-6)
    np.testing.assert_allclose(got[:, 6], dets[0][:, 6] * 480, rtol=1e-6)
