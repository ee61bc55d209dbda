"""Multi-camera co-batching pipeline: shared device batches, N codecs."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from video_desensitization_tpu.detect.face import Retinaface
from video_desensitization_tpu.pipeline.multicam import process_videos_cobatched
from video_desensitization_tpu.pipeline.throughput import TieredPipeline
from video_desensitization_tpu.video.av import (
    VideoDecoder,
    VideoEncoder,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native av layer unavailable"
)


@needs_native
def test_cobatched_streams_roundtrip(tmp_path):
    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    engine = TieredPipeline(face, None, mosaic_level=8)

    rng = np.random.default_rng(0)
    jobs = {}
    counts = {"front": 11, "rear": 7}
    shapes = {"front": (96, 160), "rear": (64, 128)}  # mixed resolutions
    for cam, n in counts.items():
        src = str(tmp_path / f"{cam}.mp4")
        h, w = shapes[cam]
        with VideoEncoder(src, w, h, fps=10, codec="mpeg4") as e:
            for i in range(n):
                e.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        jobs[cam] = (src, str(tmp_path / f"{cam}_out.mp4"))

    stats = process_videos_cobatched(jobs, engine, batch_size=4)

    for cam, n in counts.items():
        assert stats[cam].frames == n
        out = jobs[cam][1]
        assert os.path.getsize(out) > 500
        with VideoDecoder(out) as dec:
            decoded = sum(1 for _ in dec)
            assert (dec.width, dec.height) == shapes[cam][::-1]
        assert decoded == n


@needs_native
def test_cobatched_encode_kwargs_reach_writer(tmp_path):
    """encode_kwargs (config encode_preset/encode_bitrate) flow into the
    co-batched libx265 writers; the ultrafast output still round-trips."""
    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    engine = TieredPipeline(face, None, mosaic_level=8)
    rng = np.random.default_rng(2)
    src = str(tmp_path / "cam.h265")
    with VideoEncoder(src, 160, 96, fps=10, codec="libx265",
                      bitrate=200000, preset="ultrafast") as e:
        for i in range(6):
            e.write(rng.integers(0, 255, (96, 160, 3), dtype=np.uint8))
    jobs = {"cam": (src, str(tmp_path / "cam_out.h265"))}
    stats = process_videos_cobatched(
        jobs, engine, batch_size=4,
        encode_kwargs={"preset": "ultrafast", "bitrate": 500_000},
    )
    assert stats["cam"].frames == 6 and not stats["cam"].error
    with VideoDecoder(jobs["cam"][1]) as dec:
        assert sum(1 for _ in dec) == 6


@needs_native
def test_cobatched_failed_camera_is_isolated(tmp_path):
    """One dead encoder must not hang the job or kill other cameras:
    the failed stream is marked with .error, the rest complete."""
    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    engine = TieredPipeline(face, None, mosaic_level=8)
    rng = np.random.default_rng(1)
    jobs = {}
    for cam in ("good", "bad"):
        src = str(tmp_path / f"{cam}.mp4")
        with VideoEncoder(src, 128, 64, fps=10, codec="mpeg4") as e:
            for i in range(6):
                e.write(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8))
        jobs[cam] = (src, str(tmp_path / f"{cam}_out.mp4"))
    jobs["bad"] = (jobs["bad"][0], "/nonexistent_dir_zz/out.mp4")

    stats = process_videos_cobatched(jobs, engine, batch_size=4)
    assert stats["bad"].error is not None
    assert stats["good"].error is None
    assert stats["good"].frames == 6
    with VideoDecoder(jobs["good"][1]) as dec:
        assert sum(1 for _ in dec) == 6


@needs_native
def test_cobatched_dead_decoder_is_isolated(tmp_path):
    """A camera whose source can't be decoded fails alone."""
    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    engine = TieredPipeline(face, None, mosaic_level=8)
    rng = np.random.default_rng(3)
    src = str(tmp_path / "good.mp4")
    with VideoEncoder(src, 128, 64, fps=10, codec="mpeg4") as e:
        for i in range(5):
            e.write(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8))
    garbage = str(tmp_path / "bad.mp4")
    with open(garbage, "wb") as f:
        f.write(b"not a video at all")
    jobs = {
        "good": (src, str(tmp_path / "good_out.mp4")),
        "bad": (garbage, str(tmp_path / "bad_out.mp4")),
    }
    stats = process_videos_cobatched(jobs, engine, batch_size=4)
    assert stats["bad"].error is not None
    assert stats["good"].frames == 5


@needs_native
def test_cobatched_with_fused_engine(tmp_path):
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
    engine = DesensitizationEngine(face, None, mosaic_level=8)
    rng = np.random.default_rng(2)
    src = str(tmp_path / "cam.mp4")
    n = 5
    with VideoEncoder(src, 128, 64, fps=10, codec="mpeg4") as e:
        for i in range(n):
            e.write(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8))
    out = str(tmp_path / "out.mp4")
    stats = process_videos_cobatched({"cam": (src, out)}, engine, batch_size=4)
    assert stats["cam"].frames == n
    with VideoDecoder(out) as dec:
        assert sum(1 for _ in dec) == n


@needs_native
def test_cobatched_device_error_aborts_everything(tmp_path):
    """A device-program failure (unlike a per-camera codec failure) must
    poison the whole job: raise to the caller, no hang, threads joined."""

    class FailingEngine:
        def process_batch(self, frames):
            raise RuntimeError("device program exploded")

    rng = np.random.default_rng(4)
    jobs = {}
    for cam in ("a", "b"):
        src = str(tmp_path / f"{cam}.mp4")
        with VideoEncoder(src, 128, 64, fps=10, codec="mpeg4") as e:
            for i in range(6):
                e.write(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8))
        jobs[cam] = (src, str(tmp_path / f"{cam}_out.mp4"))
    with pytest.raises(RuntimeError, match="device program exploded"):
        process_videos_cobatched(jobs, FailingEngine(), batch_size=4)


@needs_native
def test_cobatched_yuv420_transport(tmp_path):
    """transport=yuv420 with a fused engine: every camera's frames travel
    as planar I420 through process_batch_yuv into I420 encoders, mixed
    resolutions co-batched by full shape."""
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.3,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    engine = DesensitizationEngine(face, None, mosaic_level=8)

    rng = np.random.default_rng(2)
    jobs = {}
    counts = {"front": 9, "rear": 5}
    shapes = {"front": (96, 160), "rear": (64, 128)}
    for cam, n in counts.items():
        src = str(tmp_path / f"{cam}.h265")
        h, w = shapes[cam]
        with VideoEncoder(src, w, h, fps=10, codec="libx265",
                          bitrate=300000, preset="ultrafast") as e:
            for i in range(n):
                e.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        jobs[cam] = (src, str(tmp_path / f"{cam}_out.h265"))

    stats = process_videos_cobatched(
        jobs, engine, batch_size=4, transport="yuv420",
        encode_kwargs={"preset": "ultrafast"},
    )

    for cam, n in counts.items():
        assert stats[cam].error is None
        assert stats[cam].frames == n
        with VideoDecoder(jobs[cam][1]) as dec:
            decoded = sum(1 for _ in dec)
            assert (dec.width, dec.height) == shapes[cam][::-1]
        assert decoded == n


@needs_native
def test_cobatched_detect_interval_per_camera_tracking(tmp_path):
    """detect_interval > 1 in the multicam record path: only every Nth
    frame of EACH camera hits the device (co-batched keyframes), every
    frame reaches the output in order, and gap frames carry the camera's
    propagated box (stats count them)."""
    from video_desensitization_tpu.ops.mosaic import mosaic_host_inplace
    from video_desensitization_tpu.pipeline.engine import EngineResult

    class CountingEngine:
        mosaic_level = 8
        anonymizer = "mosaic"

        def __init__(self):
            self.frames_detected = 0

        def process_batch(self, frames):
            self.frames_detected += frames.shape[0]
            out = np.array(frames)
            fb = [[[2.0, 2.0, 30.0, 30.0]]] * len(out)
            for i in range(len(out)):
                mosaic_host_inplace(out[i], fb[i], self.mosaic_level)
            return EngineResult(
                frames=out, face_boxes=fb, plate_boxes=[[] for _ in out],
                num_faces=len(out), num_plates=0,
            )

    engine = CountingEngine()
    rng = np.random.default_rng(0)
    jobs = {}
    counts = {"front": 11, "rear": 7}
    shapes = {"front": (96, 160), "rear": (64, 128)}
    for cam, n in counts.items():
        src = str(tmp_path / f"{cam}.mp4")
        h, w = shapes[cam]
        with VideoEncoder(src, w, h, fps=10, codec="mpeg4") as e:
            for i in range(n):
                e.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        jobs[cam] = (src, str(tmp_path / f"{cam}_out.mp4"))

    stats = process_videos_cobatched(
        jobs, engine, batch_size=4, detect_interval=2
    )

    # keyframes: front 6 (of 11), rear 4 (of 7) = 10; partial batches are
    # padded to batch_size, so the device saw at most 12 frames — far
    # fewer than the 18 per-frame detection would send.
    assert 10 <= engine.frames_detected <= 12
    for cam, n in counts.items():
        assert stats[cam].error is None
        assert stats[cam].frames == n
        # every frame (keyframe AND gap) carries the static box
        assert stats[cam].faces == n
        with VideoDecoder(jobs[cam][1]) as dec:
            decoded = sum(1 for _ in dec)
            assert (dec.width, dec.height) == shapes[cam][::-1]
        assert decoded == n
