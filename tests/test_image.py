"""Letterbox + mean-subtract preprocessing: host path bit-matches the
reference recipe; device path matches cv2 INTER_LINEAR within tolerance."""

import cv2
import numpy as np
import jax.numpy as jnp

from video_desensitization_tpu.ops.image import (
    BGR_MEAN,
    letterbox_device,
    letterbox_host,
    letterbox_params,
    preprocess_batch_device,
    preprocess_input,
)

RNG = np.random.default_rng(3)


def reference_letterbox(image, size):
    """Re-derivation of reference detect_face/utils/utils.py:8-18."""
    ih, iw, _ = np.shape(image)
    w, h = size
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    image = cv2.resize(image, (nw, nh))
    new_image = np.ones([size[1], size[0], 3]) * 128
    new_image[(h - nh) // 2 : nh + (h - nh) // 2, (w - nw) // 2 : nw + (w - nw) // 2] = image
    return new_image


def test_letterbox_host_exact():
    for hw in [(480, 640), (1080, 1920), (640, 640), (301, 517)]:
        img = RNG.integers(0, 255, (*hw, 3), dtype=np.uint8)
        got = letterbox_host(img, (640, 640))
        want = reference_letterbox(img, (640, 640))
        np.testing.assert_array_equal(got, want)


def test_letterbox_params():
    nh, nw, top, left = letterbox_params((1080, 1920), (640, 640))
    assert (nh, nw) == (360, 640)
    assert (top, left) == (140, 0)


def test_letterbox_device_close_to_cv2():
    img = RNG.integers(0, 255, (1080, 1920, 3), dtype=np.uint8)
    got = np.asarray(letterbox_device(jnp.asarray(img[None]), (640, 640)))[0]
    want = reference_letterbox(img, (640, 640))
    assert got.shape == want.shape
    # Interpolation conventions match (half-pixel centers); small float diffs.
    assert np.mean(np.abs(got - want)) < 1.0
    assert np.max(np.abs(got - want)) < 16.0  # isolated rounding extremes only
    # Pad region must be exactly 128.
    assert np.all(got[:140] == 128.0) and np.all(got[-140:] == 128.0)


def test_preprocess_input():
    x = jnp.asarray(RNG.uniform(0, 255, (4, 4, 3)).astype(np.float32))
    got = np.asarray(preprocess_input(x))
    np.testing.assert_allclose(got, np.asarray(x) - np.array(BGR_MEAN, np.float32), rtol=1e-6)


def test_preprocess_batch_device_shapes_dtype():
    frames = jnp.asarray(RNG.integers(0, 255, (2, 480, 640, 3), dtype=np.uint8))
    out = preprocess_batch_device(frames, (640, 640), dtype=jnp.bfloat16)
    assert out.shape == (2, 640, 640, 3)
    assert out.dtype == jnp.bfloat16


def test_letterbox_geometry_matches_host_for_awkward_shapes():
    """Host f64 geometry vs device f32 floor: 1077-tall at 640 is the known
    divergent case (host nh=639; f32 floor gives 640). letterbox_geometry
    must return the host value — device programs consume it as an input."""
    from video_desensitization_tpu.ops.image import (
        letterbox_geometry,
        letterbox_params,
    )

    shapes = np.array([[1077, 1077], [1080, 1920], [720, 1280], [30, 60]])
    geom = letterbox_geometry(shapes.astype(np.float32), (640, 640))
    for row, (ih, iw) in zip(geom, shapes):
        assert tuple(row.astype(int)) == letterbox_params(
            (int(ih), int(iw)), (640, 640)
        )
    # The divergent case really diverges under f32 arithmetic
    # (1077x1077 source: f64 truncation gives 639, f32 floor gives 640):
    scale32 = np.float32(640.0) / np.float32(1077.0)
    assert int(np.floor(np.float32(1077) * scale32)) == 640  # f32: wrong
    assert int(geom[0, 0]) == 639  # host truth
