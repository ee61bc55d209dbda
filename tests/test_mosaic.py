"""Mosaic remap: device path must be BIT-IDENTICAL to the sequential cv2
reference kernel (combine_detect.py:138-161), including overlapping boxes,
out-of-bounds boxes, and cv2's float64 INTER_NEAREST rounding quirks."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from video_desensitization_tpu.ops.mosaic import (
    build_mosaic_maps,
    composed_mosaic_table,
    gaussian_blur_boxes,
    mosaic_boxes_batch,
    mosaic_host_reference,
)

RNG = np.random.default_rng(12)


def test_composed_table_matches_cv2_resize():
    """table[b] must reproduce cv2 INTER_NEAREST down+up exactly, for every
    extent b: mosaic of a 1-D ramp through cv2 == ramp[table[b, :b]]."""
    table = composed_mosaic_table(8, 512)
    for b in list(range(1, 140)) + [255, 256, 257, 511, 512]:
        s = max(1, b // 8)
        ramp = np.arange(b, dtype=np.float32).reshape(1, b)
        small = cv2.resize(ramp, (s, 1), interpolation=cv2.INTER_NEAREST)
        up = cv2.resize(small, (b, 1), interpolation=cv2.INTER_NEAREST)
        want = up.reshape(-1).astype(np.int64)
        got = table[b, :b].astype(np.int64)
        np.testing.assert_array_equal(got, want, err_msg=f"b={b}")


def test_host_reference_matches_reference_kernel():
    """mosaic_host_reference == literal re-execution of the reference recipe."""
    img = RNG.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    boxes = [(10, 20, 60, 90), (-5, 100, 40, 200), (50, 50, 50, 80)]
    got = mosaic_host_reference(img, boxes)

    want = img.copy()
    h, w = want.shape[:2]
    for x1, y1, x2, y2 in boxes:
        x1, y1, x2, y2 = max(0, x1), max(0, y1), min(w, x2), min(h, y2)
        if x2 <= x1 or y2 <= y1:
            continue
        area = want[y1:y2, x1:x2]
        small = cv2.resize(
            area,
            (max(1, (x2 - x1) // 8), max(1, (y2 - y1) // 8)),
            interpolation=cv2.INTER_NEAREST,
        )
        mosaic = cv2.resize(small, (x2 - x1, y2 - y1), interpolation=cv2.INTER_NEAREST)
        want[y1:y2, x1:x2] = mosaic
    np.testing.assert_array_equal(got, want)


def _random_boxes(k, h, w, rng):
    x1 = rng.integers(-30, w + 10, k)
    y1 = rng.integers(-30, h + 10, k)
    x2 = x1 + rng.integers(1, 120, k)
    y2 = y1 + rng.integers(1, 120, k)
    return np.stack([x1, y1, x2, y2], -1).astype(np.int32)


def test_device_mosaic_bitwise_vs_cv2():
    h, w, k = 240, 320, 6
    for trial in range(8):
        img = RNG.integers(0, 255, (h, w, 3), dtype=np.uint8)
        boxes = _random_boxes(k, h, w, RNG)
        valid = RNG.random(k) > 0.2
        ymap, xmap = jax.jit(
            lambda b, v: build_mosaic_maps(b, v, h, w, 8)
        )(jnp.asarray(boxes), jnp.asarray(valid))
        got = np.asarray(img)[np.asarray(ymap), np.asarray(xmap)]
        want = mosaic_host_reference(img, boxes[valid])
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_device_mosaic_overlapping_boxes_sequential_semantics():
    h, w = 100, 100
    img = RNG.integers(0, 255, (h, w, 3), dtype=np.uint8)
    boxes = np.array(
        [[5, 5, 70, 70], [30, 30, 95, 95], [0, 0, 100, 100]], dtype=np.int32
    )
    valid = np.ones(3, bool)
    out = mosaic_boxes_batch(
        jnp.asarray(img[None]), jnp.asarray(boxes[None]), jnp.asarray(valid[None])
    )
    want = mosaic_host_reference(img, boxes)
    np.testing.assert_array_equal(np.asarray(out)[0], want)


def test_batch_mosaic_shapes_and_identity():
    frames = RNG.integers(0, 255, (3, 64, 80, 3), dtype=np.uint8)
    boxes = np.zeros((3, 4, 4), np.int32)
    valid = np.zeros((3, 4), bool)
    out = np.asarray(
        mosaic_boxes_batch(jnp.asarray(frames), jnp.asarray(boxes), jnp.asarray(valid))
    )
    np.testing.assert_array_equal(out, frames)  # no valid boxes -> identity


def test_mosaic_level_other_than_8():
    h, w = 90, 110
    img = RNG.integers(0, 255, (h, w, 3), dtype=np.uint8)
    boxes = np.array([[10, 10, 80, 70]], np.int32)
    out = np.asarray(
        mosaic_boxes_batch(
            jnp.asarray(img[None]),
            jnp.asarray(boxes[None]),
            jnp.asarray(np.ones((1, 1), bool)),
            level=4,
        )
    )[0]
    want = mosaic_host_reference(img, boxes, level=4)
    np.testing.assert_array_equal(out, want)


def test_gaussian_blur_boxes():
    frames = RNG.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    boxes = np.array([[[8, 8, 40, 40]]], np.int32)
    valid = np.ones((1, 1), bool)
    out = np.asarray(
        gaussian_blur_boxes(jnp.asarray(frames), jnp.asarray(boxes), jnp.asarray(valid))
    )
    assert out.dtype == np.uint8
    # Outside the box: untouched. Inside: smoothed (variance drops).
    np.testing.assert_array_equal(out[0, 50:, 50:], frames[0, 50:, 50:])
    inside_got = out[0, 12:36, 12:36].astype(np.float64)
    inside_src = frames[0, 12:36, 12:36].astype(np.float64)
    assert inside_got.var() < inside_src.var() * 0.5


def test_engine_gaussian_anonymizer():
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    eng = DesensitizationEngine(face, None, anonymizer="gaussian")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8)
    res = eng.process_batch(frames)
    assert res.frames.shape == frames.shape and res.frames.dtype == np.uint8
    if res.num_faces:
        # Blurred regions differ from the source; untouched pixels identical
        # only outside every box (hard to assert directly with random boxes;
        # at minimum the output is not all-equal).
        assert not np.array_equal(res.frames, frames)


def test_engine_odd_geometry_flat_roundtrip():
    """The fused engine's flat (B, H, W*3) tracing must be shape-safe for
    odd widths/heights (no Pallas on CPU — the XLA mosaic fallback path):
    output matches the reference host kernel bitwise."""
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.ops.mosaic import mosaic_host_reference
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    eng = DesensitizationEngine(face, None, mosaic_level=8)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 101, 67, 3), dtype=np.uint8)
    res = eng.process_batch(frames)
    assert res.frames.shape == frames.shape
    for i in range(frames.shape[0]):
        merged = [[int(v) for v in b] for b in res.face_boxes[i]]
        expect = mosaic_host_reference(frames[i], merged, 8)
        np.testing.assert_array_equal(res.frames[i], expect)


def test_i420_host_oracle_pixelates_every_plane():
    """The I420 host oracle applies the cv2 mosaic per plane: Y with the
    full-res boxes, U/V with halved boxes at level//2."""
    from video_desensitization_tpu.ops.mosaic import mosaic_i420_host_inplace

    h, w = 120, 160
    yuv = RNG.integers(0, 255, (h * 3 // 2, w), dtype=np.uint8)
    boxes = [(10, 20, 60, 90), (-5, 100, 40, 200)]
    got = mosaic_i420_host_inplace(yuv.copy(), boxes, 8)

    want = yuv.copy()
    want[:h] = mosaic_host_reference(want[:h], boxes, 8)
    cb = [(x1 // 2, y1 // 2, (x2 + 1) // 2, (y2 + 1) // 2) for x1, y1, x2, y2 in boxes]
    u = want[h : h + h // 4].reshape(h // 2, w // 2)
    u[:] = mosaic_host_reference(u, cb, 4)
    v = want[h + h // 4 :].reshape(h // 2, w // 2)
    v[:] = mosaic_host_reference(v, cb, 4)
    np.testing.assert_array_equal(got, want)


def test_i420_device_mosaic_bitwise_vs_host_oracle():
    from video_desensitization_tpu.ops.mosaic import (
        mosaic_i420_batch,
        mosaic_i420_host_inplace,
    )

    h, w = 120, 160
    yuv = RNG.integers(0, 255, (2, h * 3 // 2, w), dtype=np.uint8)
    bl = [[10, 20, 60, 90], [35, 50, 120, 110], [150, 100, 200, 140]]
    boxes = np.array([bl, bl], np.int32)
    valid = np.array([[True, True, True], [True, False, True]])
    out = np.asarray(mosaic_i420_batch(jnp.asarray(yuv), boxes, valid, 8))
    for i in range(2):
        kept = [b for b, v in zip(bl, valid[i]) if v]
        want = mosaic_i420_host_inplace(yuv[i].copy(), kept, 8)
        np.testing.assert_array_equal(out[i], want)


def test_i420_mosaic_commutes_with_colorspace_on_even_grid():
    """INTER_NEAREST pixelation is a pure gather, so for a box aligned to
    the 2x2 chroma grid with extent divisible by 2*level the yuv-plane
    mosaic selects exactly the pixels whose RGB mosaic would select the
    corresponding full-res sources: converting the mosaicked I420 to RGB
    equals mosaicking the converted RGB frame."""
    import cv2

    from video_desensitization_tpu.ops.mosaic import mosaic_i420_host_inplace

    h, w = 128, 192
    rgb = RNG.integers(0, 255, (h, w, 3), dtype=np.uint8)
    yuv = cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV_I420)
    boxes = [(16, 24, 80, 88)]  # 64x64 extent, even origin: grid-aligned

    blurred_yuv = mosaic_i420_host_inplace(yuv.copy(), boxes, 8)
    a = cv2.cvtColor(blurred_yuv, cv2.COLOR_YUV2RGB_I420)

    b = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
    b = mosaic_host_reference(b, boxes, 8)
    np.testing.assert_array_equal(a, b)


def test_engine_yuv_mode_bitwise():
    """process_batch_yuv: detections must equal the RGB path fed the same
    cv2-roundtripped pixels (the device I420->RGB is bit-exact cv2), and
    the blurred planes must equal the per-plane host oracle applied with
    the program's own boxes."""
    import cv2
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.ops.mosaic import mosaic_i420_host_inplace
    from video_desensitization_tpu.ops.yuv import rgb_to_i420_host
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    eng = DesensitizationEngine(face, None, mosaic_level=8)
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8)
    yuv = np.stack([rgb_to_i420_host(f) for f in frames])
    rgb_rt = np.stack(
        [cv2.cvtColor(y, cv2.COLOR_YUV2RGB_I420) for y in yuv]
    )

    a = eng.process_batch_yuv(yuv)
    b = eng.process_batch(rgb_rt)

    assert a.frames.shape == yuv.shape and a.frames.dtype == np.uint8
    assert a.num_faces == b.num_faces
    for i in range(2):
        np.testing.assert_allclose(a.face_boxes[i], b.face_boxes[i])
        kept = [[int(c) for c in box] for box in a.face_boxes[i]]
        want = mosaic_i420_host_inplace(yuv[i].copy(), kept, 8)
        np.testing.assert_array_equal(a.frames[i], want)
