"""Tests for the link-aware tiered pipeline (pipeline/throughput.py).

The tiered path must agree with the device-native programs it re-plumbs:
host letterbox feeding the same fused detectors, boxes-only readback, and
the reference-exact host mosaic.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video_desensitization_tpu.detect.face import Retinaface
from video_desensitization_tpu.detect.plate import PlateDetector
from video_desensitization_tpu.ops.mosaic import mosaic_host_reference
from video_desensitization_tpu.pipeline.throughput import TieredPipeline, letterbox_u8


@pytest.fixture(scope="module")
def face():
    return Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def plate():
    return PlateDetector(
        model_path=None,
        variant="n",
        confidence=0.01,
        input_shape=(128, 128),
        max_detections=4,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def pipe(face, plate):
    return TieredPipeline(face, plate, mosaic_level=8)


def test_letterbox_u8_geometry():
    frame = np.full((30, 60, 3), 200, np.uint8)
    lb = letterbox_u8(frame, (128, 128))
    # scale = 128/60; nh = int(30*scale) = 64, nw = 128; top = 32.
    assert lb.shape == (128, 128, 3)
    assert (lb[:32] == 128).all() and (lb[96:] == 128).all()
    assert (lb[32:96] == 200).all()


def test_plate_letterboxed_matches_native_on_square(plate):
    """On an already-square input the two plate programs see identical
    pixels (no-op letterbox, no repad) and must agree exactly."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8)
    from video_desensitization_tpu.ops.image import letterbox_geometry

    dets_a, keep_a = map(np.asarray, plate.detect_padded(frames))
    shapes = np.full((2, 2), 128.0, np.float32)
    geom = letterbox_geometry(shapes, plate.input_hw)
    dets_b, keep_b = map(
        np.asarray,
        plate._detect_letterboxed_program(
            plate.variables, jnp.asarray(frames), jnp.asarray(shapes),
            jnp.asarray(geom)
        ),
    )
    np.testing.assert_array_equal(keep_a, keep_b)
    np.testing.assert_allclose(dets_a[keep_a], dets_b[keep_b], rtol=1e-4, atol=1e-3)


def test_tiered_gaussian_anonymizer(face):
    """anonymizer='gaussian' must blur inside detected boxes and leave the
    rest of the frame untouched (the tiered analog of the fused engine's
    gaussian option)."""
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8)
    pg = TieredPipeline(face, None, anonymizer="gaussian")
    res = pg.process_batch(frames)
    for i in range(2):
        mask = np.zeros((96, 160), bool)
        for x1, y1, x2, y2 in (
            np.asarray(res.face_boxes[i]).astype(int).reshape(-1, 4)
        ):
            # Clip like the blur helper does; a raw negative x2/y2 would
            # wrap the slice and corrupt the mask.
            mask[max(0, y1):max(0, y2), max(0, x1):max(0, x2)] = True
        np.testing.assert_array_equal(res.frames[i][~mask], frames[i][~mask])
        if mask.any():
            assert not np.array_equal(res.frames[i][mask], frames[i][mask])


def test_stream_equals_batch(pipe):
    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8) for _ in range(3)
    ]
    streamed = list(pipe.process_stream(iter(batches), depth=2))
    for frames, res_s in zip(batches, streamed):
        res_b = pipe.process_batch(frames)
        np.testing.assert_array_equal(res_s.frames, res_b.frames)
        assert res_s.face_boxes == res_b.face_boxes
        assert res_s.plate_boxes == res_b.plate_boxes


@pytest.mark.parametrize(
    "hw",
    [
        (160, 96),  # portrait (taller than wide)
        (101, 67),  # odd dims in both axes
        (64, 200),  # extreme wide
    ],
)
def test_pipeline_handles_awkward_geometries(face, hw):
    """Portrait, odd, and extreme aspect frames through the full tiered
    path (rgb transfer — yuv420 legitimately requires even content dims):
    output shape preserved, mosaic bitwise vs the host reference kernel."""
    pipe = TieredPipeline(face, None, mosaic_level=8, transfer="rgb")
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (2, *hw, 3), dtype=np.uint8)
    res = pipe.process_batch(frames)
    assert res.frames.shape == frames.shape
    for i in range(frames.shape[0]):
        merged = [[int(v) for v in b] for b in res.face_boxes[i]]
        expect = mosaic_host_reference(frames[i], merged, 8)
        np.testing.assert_array_equal(res.frames[i], expect)


def test_stream_transfer_pool_equals_serial(pipe):
    # transfer_workers>0 routes puts through the concurrent transfer pool
    # (off by default — measured slower on the tunneled chip, but supported
    # for PCIe-class hosts); results must be identical either way.
    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8) for _ in range(3)
    ]
    serial = list(pipe.process_stream(iter(batches), depth=2))
    pooled = list(
        pipe.process_stream(iter(batches), depth=2, transfer_workers=2)
    )
    for res_s, res_p in zip(serial, pooled):
        np.testing.assert_array_equal(res_s.frames, res_p.frames)
        assert res_s.face_boxes == res_p.face_boxes
        assert res_s.plate_boxes == res_p.plate_boxes


def test_mosaic_matches_reference_kernel(pipe):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8)
    res = pipe.process_batch(frames)
    for i in range(frames.shape[0]):
        merged = [
            [int(v) for v in b]
            for b in res.face_boxes[i] + res.plate_boxes[i]
        ]
        expect = mosaic_host_reference(frames[i], merged, 8)
        np.testing.assert_array_equal(res.frames[i], expect)
        if not merged:
            np.testing.assert_array_equal(res.frames[i], frames[i])


def test_i420_device_roundtrip_close_to_cv2():
    import cv2

    import jax.numpy as jnp

    from video_desensitization_tpu.pipeline.throughput import (
        i420_to_rgb_device,
        rgb_to_i420,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    yuv = rgb_to_i420(rgb)
    back_cv = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420).astype(np.float32)
    back_dev = np.asarray(i420_to_rgb_device(jnp.asarray(yuv[None]), 64, 96))[0]
    # Chroma subsampling is lossy by design; the two reconstructions must
    # agree closely (coefficient rounding differs by a few counts).
    assert np.mean(np.abs(back_dev - back_cv)) < 2.0
    assert np.max(np.abs(back_dev - back_cv)) < 16.0


def test_yuv420_transfer_detections_close_to_rgb(face, plate):
    pipe_rgb = TieredPipeline(face, plate, mosaic_level=8)
    pipe_yuv = TieredPipeline(face, plate, mosaic_level=8, transfer="yuv420")
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (2, 96, 160, 3), dtype=np.uint8)
    a = pipe_rgb.process_batch(frames)
    b = pipe_yuv.process_batch(frames)
    # Detections need not be identical (chroma subsampling perturbs scores
    # on random weights) but the pipeline must run end to end and detect a
    # comparable population.
    assert b.frames.shape == a.frames.shape
    assert b.num_faces + b.num_plates > 0
    assert abs((b.num_faces + b.num_plates) - (a.num_faces + a.num_plates)) <= 8


def test_yuv420_rejects_odd_content(face):
    pipe = TieredPipeline(face, None, mosaic_level=8, transfer="yuv420")
    # source (129, 128) -> scale = 128/129 -> content nw = int(128*0.99224)
    # = 127: odd, so I420 packing is impossible.
    frames = np.zeros((1, 129, 128, 3), np.uint8)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="yuv420"):
        pipe.process_batch(frames)


def test_dispatch_finalize_split_equals_process_batch(pipe):
    """The async dispatch_batch/finalize_batch split (what TrackingEngine
    and multicam pipeline keyframe batches through) is exactly
    process_batch, including with several batches in flight."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 255, (3, 90, 160, 3), np.uint8)
    b = rng.integers(0, 255, (3, 90, 160, 3), np.uint8)
    want_a = pipe.process_batch(a)
    want_b = pipe.process_batch(b)
    h1 = pipe.dispatch_batch(a)
    h2 = pipe.dispatch_batch(b)  # two in flight
    got_a = pipe.finalize_batch(h1)
    got_b = pipe.finalize_batch(h2)
    for got, want in ((got_a, want_a), (got_b, want_b)):
        np.testing.assert_array_equal(got.frames, want.frames)
        assert got.face_boxes == want.face_boxes
        assert got.plate_boxes == want.plate_boxes


def test_tracking_engine_pipelines_tiered_keyframes(face):
    """TrackingEngine over a real TieredPipeline drives the handle path:
    keyframes equal the tiered process_batch output; gap frames are host
    mosaics of the original under the reported (propagated) boxes."""
    from video_desensitization_tpu.ops.mosaic import mosaic_host_inplace
    from video_desensitization_tpu.pipeline.tracking import TrackingEngine

    # coast=0: random weights produce unmatched tracks whose coast cover
    # would add (correct, but not byte-identical) keyframe blur on top.
    pipe = TieredPipeline(face, None, mosaic_level=8, transfer="rgb")
    teng = TrackingEngine(pipe, interval=3, detect_batch=2, depth=1, coast=0)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (9, 90, 160, 3), np.uint8)
    # copies: the engine blurs gap frames in place (it owns decode batches)
    results = list(
        teng.process_stream(iter([frames[:5].copy(), frames[5:].copy()]))
    )
    assert len(results) == 9
    # Oracle keyframes use the SAME batching the engine dispatched ([0,3],
    # then [6] padded by repetition): XLA float reductions vary with batch
    # size, and at conf 0.01 random weights sit on the threshold.
    kf_a = pipe.process_batch(frames[[0, 3]])
    kf_b = pipe.process_batch(np.stack([frames[6], frames[6]]))
    for i, idx in enumerate((0, 3)):
        np.testing.assert_array_equal(results[idx].frames[0], kf_a.frames[i])
    np.testing.assert_array_equal(results[6].frames[0], kf_b.frames[0])
    for idx in (1, 2, 4, 5, 7, 8):
        exp = np.array(frames[idx])
        mosaic_host_inplace(
            exp, results[idx].face_boxes[0] + results[idx].plate_boxes[0], 8
        )
        np.testing.assert_array_equal(results[idx].frames[0], exp)


def test_engine_shared_letterbox_equals_unshared(face, plate):
    """The fused engine's shared-uint8-canvas letterbox (one resize feeding
    both detectors) must reproduce the per-detector letterbox path: blurred
    frames bitwise, detections to float tolerance (the plate inverse
    transform computes its gain in f32 on device vs a static python float
    — sub-ulp)."""
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (3, 96, 160, 3), dtype=np.uint8)
    shared = DesensitizationEngine(face, plate, mosaic_level=8)
    assert shared.share_letterbox
    unshared = DesensitizationEngine(
        face, plate, mosaic_level=8, share_letterbox=False
    )
    a = shared.process_batch(frames.copy())
    b = unshared.process_batch(frames.copy())
    np.testing.assert_array_equal(a.frames, b.frames)
    assert a.num_faces == b.num_faces and a.num_plates == b.num_plates
    for ba, bb in zip(a.face_boxes + a.plate_boxes, b.face_boxes + b.plate_boxes):
        np.testing.assert_allclose(ba, bb, rtol=1e-5, atol=1e-3)


def test_engine_shared_letterbox_yuv(face, plate):
    """Same equivalence through the planar-I420 program."""
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    rng = np.random.default_rng(8)
    yuv = rng.integers(0, 256, (2, 144, 160), dtype=np.uint8)  # 96x160 I420
    shared = DesensitizationEngine(face, plate, mosaic_level=8)
    unshared = DesensitizationEngine(
        face, plate, mosaic_level=8, share_letterbox=False
    )
    a = shared.process_batch_yuv(yuv.copy())
    b = unshared.process_batch_yuv(yuv.copy())
    np.testing.assert_array_equal(a.frames, b.frames)
    assert a.num_faces == b.num_faces and a.num_plates == b.num_plates
