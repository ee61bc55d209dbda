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


@needs_native
def test_cobatched_tracking_matches_single_stream(tmp_path, monkeypatch):
    """Per-camera tracking through the REAL multicam routing must give each
    camera exactly the boxes its stream would get running alone.

    The multicam record path co-batches keyframes from many cameras into
    shared device batches and routes results back FIFO
    (pipeline/multicam.py route() -> CameraTracker.push_detection) — a
    cross-camera ordering bug there would silently apply one camera's
    boxes to another, unblurring a subject. Two cameras with DIFFERENT
    known motions (linear vs. sinusoidal) run co-batched, then each runs
    solo; the per-frame face-box sequences captured from the per-camera
    CameraTracker emissions must match bit-for-bit, and every frame's
    boxes must cover that camera's true (content-derived) subject box."""
    from video_desensitization_tpu.ops.mosaic import mosaic_host_inplace
    from video_desensitization_tpu.pipeline import tracking as tr
    from video_desensitization_tpu.pipeline.engine import EngineResult

    H, W, N, INTERVAL = 96, 160, 19, 3
    BW, BH = 36, 28  # subject box (white-on-black, survives codec round trip)

    def truth_box(cam, i):
        if cam == "front":  # linear drift
            x, y = 8 + 4 * i, 10 + 2 * i
        else:  # sinusoidal swerve
            x = int(40 + 30 * np.sin(i / 3.0))
            y = int(30 + 20 * np.cos(i / 4.0))
        return [float(x), float(y), float(x + BW), float(y + BH)]

    class ContentDetector:
        """Deterministic 'perfect' detector: bounding box of bright pixels.

        Detections derive from frame CONTENT only, so a routing bug that
        swaps cameras' results is observable (the cameras move
        differently), unlike a constant-box fake."""

        mosaic_level = 8
        anonymizer = "mosaic"

        def process_batch(self, frames):
            out = np.array(frames)
            fb = []
            for i in range(len(out)):
                ys, xs = np.where(out[i, :, :, 0] > 127)
                box = [
                    float(xs.min()), float(ys.min()),
                    float(xs.max() + 1), float(ys.max() + 1),
                ] if len(xs) else None
                fb.append([box] if box else [])
                if box:
                    mosaic_host_inplace(out[i], [box], self.mosaic_level)
            return EngineResult(
                frames=out, face_boxes=fb, plate_boxes=[[] for _ in out],
                num_faces=sum(len(b) for b in fb), num_plates=0,
            )

    # Spy on the per-camera trackers: record each emitted frame's face
    # boxes, tagging instances in creation order (= jobs dict order).
    created = []
    orig_init = tr.CameraTracker.__init__
    orig_push = tr.CameraTracker.push_detection
    orig_flush = tr.CameraTracker.flush

    def spy_init(self, *a, **k):
        orig_init(self, *a, **k)
        self._rec = []
        created.append(self)

    def spy_push(self, blurred, faces, plates):
        res = orig_push(self, blurred, faces, plates)
        self._rec.extend(r.face_boxes[0] for r in res)
        return res

    def spy_flush(self):
        res = orig_flush(self)
        self._rec.extend(r.face_boxes[0] for r in res)
        return res

    monkeypatch.setattr(tr.CameraTracker, "__init__", spy_init)
    monkeypatch.setattr(tr.CameraTracker, "push_detection", spy_push)
    monkeypatch.setattr(tr.CameraTracker, "flush", spy_flush)

    def write_cam(cam):
        src = str(tmp_path / f"{cam}.h265")
        with VideoEncoder(src, W, H, fps=10, codec="libx265",
                          bitrate=3_000_000, preset="ultrafast") as e:
            for i in range(N):
                f = np.zeros((H, W, 3), np.uint8)
                x1, y1, x2, y2 = (int(v) for v in truth_box(cam, i))
                f[y1:y2, x1:x2] = 255
                e.write(f)
        return src

    def run(cams):
        created.clear()
        jobs = {
            cam: (write_cam(cam), str(tmp_path / f"{cam}_{len(cams)}out.mp4"))
            for cam in cams
        }
        stats = process_videos_cobatched(
            jobs, ContentDetector(), batch_size=4, detect_interval=INTERVAL
        )
        for cam in cams:
            assert stats[cam].error is None and stats[cam].frames == N
        return {cam: created[k]._rec for k, cam in enumerate(cams)}

    both = run(["front", "rear"])
    solo = {**run(["front"]), **run(["rear"])}

    def covered(truth, boxes):
        x1, y1, x2, y2 = (int(v) for v in truth)
        m = np.zeros((y2 - y1, x2 - x1), bool)
        for b in boxes:
            bx1, by1 = max(x1, int(b[0])) - x1, max(y1, int(b[1])) - y1
            bx2, by2 = min(x2, int(np.ceil(b[2]))) - x1, min(y2, int(np.ceil(b[3]))) - y1
            if bx2 > bx1 and by2 > by1:
                m[by1:by2, bx1:bx2] = True
        return m.mean()

    for cam in ("front", "rear"):
        assert len(both[cam]) == N
        # co-batched routing == single-stream result, bit for bit
        assert both[cam] == solo[cam]
        # and the boxes actually cover the moving subject on EVERY frame
        # (codec ringing shifts detected edges by ~1 px; propagation's 20%
        # margin absorbs far more)
        for i in range(N):
            assert covered(truth_box(cam, i), both[cam][i]) > 0.9, (cam, i)
