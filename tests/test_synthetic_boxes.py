"""The shared synthetic production-load detector (benchmarks/synthetic_boxes.py).

bench.py's _RealisticBoxPipeline and record_e2e_bench.py --typical-boxes
splice this in place of TieredPipeline._unpack so host-blur/tracker costs
are measured at realistic box geometry while the device program still runs.
These tests pin the contract that splice depends on: deterministic motion
with a continuous clock, the exact packed-unpack tuple layout, in-bounds
geometry, and a live pipeline actually blurring the synthetic boxes.
"""

import importlib.util
import os

import numpy as np
import pytest


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "synthetic_boxes.py",
    )
    spec = importlib.util.spec_from_file_location("synthetic_boxes", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


sb = _load()

HW = (96, 160)


def test_shapes_and_counts():
    fpx, fkeep, ppx, pkeep = sb.synthesize(5, 0, HW, face_k=8, plate_k=4)
    assert fpx.shape == (5, 8, 15) and fkeep.shape == (5, 8)
    assert ppx.shape == (5, 4, 6) and pkeep.shape == (5, 4)
    # Exactly 3 faces + 1 plate per frame, in the first k slots.
    assert (fkeep.sum(axis=1) == 3).all() and fkeep[:, :3].all()
    assert (pkeep.sum(axis=1) == 1).all() and pkeep[:, 0].all()


def test_small_caps_clamp():
    fpx, fkeep, ppx, pkeep = sb.synthesize(3, 7, HW, face_k=2, plate_k=1)
    assert (fkeep.sum(axis=1) == 2).all()
    assert (pkeep.sum(axis=1) == 1).all()


def test_deterministic_and_clock_continuous():
    a = sb.synthesize(6, 0, HW, 4, 2)
    b = sb.synthesize(6, 0, HW, 4, 2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # Frames 2..5 of a t0=0 window equal frames 0..3 of a t0=2 window:
    # the motion clock is global, not per-call.
    c = sb.synthesize(4, 2, HW, 4, 2)
    np.testing.assert_array_equal(a[0][2:], c[0])
    np.testing.assert_array_equal(a[2][2:], c[2])


def test_boxes_in_bounds_and_moving():
    h, w = HW
    fpx, fkeep, ppx, pkeep = sb.synthesize(200, 0, HW, 4, 2)
    for px, keep, d in ((fpx, fkeep, 15), (ppx, pkeep, 6)):
        boxes = px[keep][:, :4]
        assert (boxes[:, 0] < boxes[:, 2]).all()
        assert (boxes[:, 1] < boxes[:, 3]).all()
        assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
        assert (boxes[:, 2] <= w).all() and (boxes[:, 3] <= h).all()
    # Drift: the first face moves between consecutive frames.
    assert not np.array_equal(fpx[0, 0, :4], fpx[1, 0, :4])


def test_override_unpack_blurs_synthetic_boxes():
    """A live TieredPipeline with the override still runs its device
    program but blurs exactly the synthetic geometry."""
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.detect.plate import PlateDetector
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.5,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    plate = PlateDetector(
        model_path=None,
        variant="n",
        confidence=0.5,
        input_shape=(128, 128),
        max_detections=4,
        dtype=jnp.float32,
    )
    pipe = TieredPipeline(face, plate, mosaic_level=8)
    sb.override_unpack(pipe, HW)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, *HW, 3), dtype=np.uint8)
    res = pipe.process_batch(frames.copy())
    assert all(len(b) == 3 for b in res.face_boxes)
    assert all(len(b) == 1 for b in res.plate_boxes)
    # The blur landed where the synthetic detector said (frame 0, face 0
    # of the NEXT clock window — process_batch above consumed t0=0..1).
    fpx, fkeep, _, _ = sb.synthesize(2, 0, HW, 8, 4)
    x1, y1, x2, y2 = (int(v) for v in fpx[0, 0, :4])
    changed = res.frames[0] != frames[0]
    assert changed[y1:y2, x1:x2].any()
    # Outside every synthetic box the frame is untouched: top-left corner
    # strip (all boxes start >= ~18 px in at this geometry).
    assert not changed[:8, :8].any()


def test_override_clock_advances_across_batches():
    calls = []

    class _Fake:
        class _D:
            max_detections = 4

        face = _D()
        plate = _D()

    pipe = _Fake()
    sb.override_unpack(pipe, HW)
    a = pipe._unpack(np.zeros((3, 1)))
    b = pipe._unpack(np.zeros((3, 1)))
    direct = sb.synthesize(3, 3, HW, 4, 4)
    np.testing.assert_array_equal(b[0], direct[0])
    assert not np.array_equal(a[0], b[0])
