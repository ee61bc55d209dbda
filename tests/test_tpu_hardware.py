"""Hardware-only validation (skipped on the CPU backend).

The CPU suite forces jax to 8 virtual CPU devices (conftest.py), so these
tests skip there; run them on a real chip with:

    JAX_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q --no-header -p no:cacheprovider

(using a separate invocation so conftest's CPU override can be bypassed via
the env flag below). They pin the two facts that only hardware can check:
the Pallas mosaic kernel is bitwise-identical to the cv2 reference when
COMPILED (interpret mode already passes on CPU — and hid two real Mosaic
lowering bugs during development), and the fused engine produces identical
output through either mosaic backend.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires a real TPU backend (set JAX_TPU_TESTS=1 and run this "
    "file standalone; tests/conftest.py forces CPU otherwise)",
)


def test_pallas_mosaic_bitwise_on_hardware():
    from video_desensitization_tpu.ops.mosaic import mosaic_host_reference
    from video_desensitization_tpu.ops.pallas_mosaic import (
        mosaic_boxes_batch_pallas,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 1080, 1920, 3), dtype=np.uint8)
    k = 16
    bx = rng.integers(0, 1919, (2, k, 1))
    by = rng.integers(0, 1079, (2, k, 1))
    bw = rng.integers(5, 300, (2, k, 1))
    bh = rng.integers(5, 300, (2, k, 1))
    boxes = np.concatenate([bx, by, bx + bw, by + bh], axis=-1).astype(np.int32)
    valid = rng.random((2, k)) < 0.6

    out = np.asarray(mosaic_boxes_batch_pallas(frames, boxes, valid, 8))
    for i in range(2):
        bl = [b.tolist() for b, v in zip(boxes[i], valid[i]) if v]
        np.testing.assert_array_equal(
            out[i], mosaic_host_reference(frames[i], bl, 8)
        )


def test_pallas_mosaic_clamp_geometries_on_hardware():
    """Ownership-grid edge cases compiled on chip: the bottom strip's DMA
    window clamps to H - OUT_ROWS (its write region overlaps the strip
    above — ordering relies on the single-outstanding write-back wait), the
    minimum supported height forces near-total window overlap, and y1 < PAD
    clamps the input window to row 0."""
    from video_desensitization_tpu.ops.mosaic import mosaic_host_reference
    from video_desensitization_tpu.ops.pallas_mosaic import (
        mosaic_boxes_batch_pallas,
    )

    rng = np.random.default_rng(1)
    for h, blist in [
        (1080, [[10, 950, 900, 1080], [40, 1000, 1200, 1070], [5, 3, 800, 130]]),
        (136, [[0, 0, 1920, 136], [20, 5, 1000, 130]]),
        (264, [[0, 0, 1920, 264], [30, 200, 600, 264], [20, 13, 900, 247]]),
    ]:
        frame = rng.integers(0, 255, (h, 1920, 3), dtype=np.uint8)
        k = len(blist)
        boxes = np.array([blist + [[0, 0, 0, 0]] * (8 - k)], np.int32)
        valid = np.array([[True] * k + [False] * (8 - k)])
        out = np.asarray(mosaic_boxes_batch_pallas(frame[None], boxes, valid, 8))[0]
        np.testing.assert_array_equal(out, mosaic_host_reference(frame, blist, 8))


def test_pallas_mosaic_padded_envelope_on_hardware():
    """Geometries outside the native envelope (odd widths, portrait) run
    through the pad-to-envelope path compiled on chip and stay bitwise."""
    from video_desensitization_tpu.ops.mosaic import mosaic_host_reference
    from video_desensitization_tpu.ops.pallas_mosaic import (
        mosaic_boxes_batch_pallas,
        pallas_mosaic_supported,
    )

    rng = np.random.default_rng(2)
    for h, w in [(1080, 1912), (1920, 1080), (480, 720)]:
        assert not pallas_mosaic_supported(h, w, 8)
        frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        bl = [
            [10, 20, min(200, w), min(240, h)],
            [w // 2, h // 2, w + 25, h + 40],  # spills past the true edge
            [0, max(0, h - 133), w // 3, h],
        ]
        boxes = np.array([bl + [[0, 0, 0, 0]] * 5], np.int32)
        valid = np.array([[True] * 3 + [False] * 5])
        out = np.asarray(mosaic_boxes_batch_pallas(frame[None], boxes, valid, 8))[0]
        np.testing.assert_array_equal(out, mosaic_host_reference(frame, bl, 8))


def test_pallas_mosaic_i420_on_hardware():
    """The planar-YUV mosaic (Y full-res, U|V channel-interleaved at
    level//2) compiled on chip is bitwise vs the per-plane cv2 oracle at
    1080p — the fused engine's yuv420 IO path."""
    from video_desensitization_tpu.ops.mosaic import mosaic_i420_host_inplace
    from video_desensitization_tpu.ops.pallas_mosaic import (
        mosaic_i420_batch_pallas,
    )

    rng = np.random.default_rng(3)
    h, w = 1080, 1920
    yuv = rng.integers(0, 255, (2, h * 3 // 2, w), dtype=np.uint8)
    bl = [[100, 200, 400, 500], [1500, 800, 2000, 1200], [33, 1001, 477, 1080]]
    boxes = np.array([bl, bl], np.int32)
    valid = np.array([[True, True, True], [True, False, True]])
    out = np.asarray(mosaic_i420_batch_pallas(yuv, boxes, valid, 8))
    for i in range(2):
        kept = [b for b, v in zip(bl, valid[i]) if v]
        want = mosaic_i420_host_inplace(yuv[i].copy(), kept, 8)
        np.testing.assert_array_equal(out[i], want)


def test_engine_backends_agree_on_hardware():
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[256, 256, 3],
        confidence=0.3,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 512, 896, 3), dtype=np.uint8)
    a = DesensitizationEngine(face, None, mosaic_backend="pallas").process_batch(frames)
    b = DesensitizationEngine(face, None, mosaic_backend="xla").process_batch(frames)
    np.testing.assert_array_equal(a.frames, b.frames)


def test_engine_yuv_mode_on_hardware():
    """process_batch_yuv with the Pallas mosaic backend, compiled on chip:
    blurred planes must equal the per-plane cv2 oracle at the program's own
    detections."""
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.ops.mosaic import mosaic_i420_host_inplace
    from video_desensitization_tpu.ops.yuv import rgb_to_i420_host
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[256, 256, 3],
        confidence=0.3,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.bfloat16,
    )
    eng = DesensitizationEngine(face, None, mosaic_backend="pallas")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 512, 896, 3), dtype=np.uint8)
    yuv = np.stack([rgb_to_i420_host(f) for f in frames])
    res = eng.process_batch_yuv(yuv)
    assert res.frames.shape == yuv.shape
    for i in range(2):
        kept = [[int(c) for c in box] for box in res.face_boxes[i]]
        want = mosaic_i420_host_inplace(yuv[i].copy(), kept, 8)
        np.testing.assert_array_equal(res.frames[i], want)


def test_tiered_yuv420_program_on_hardware():
    """The i420->RGB device conversion + shared-canvas tiered program must
    compile and detect comparably to the rgb-content path on chip (the
    bench's default transfer mode)."""
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8)
    a = TieredPipeline(face, None, mosaic_level=8, transfer="rgb").process_batch(frames)
    b = TieredPipeline(face, None, mosaic_level=8, transfer="yuv420").process_batch(frames)
    assert b.frames.shape == a.frames.shape
    assert abs(b.num_faces - a.num_faces) <= 4
