"""Detection-interval tracking (pipeline/tracking.py).

The reference detects on every frame (combine_detect.py:183-277);
``TrackingEngine`` amortizes the detector over an ordered stream while
keeping every frame covered. These tests pin:

- the propagation math (linear motion covered exactly, one-sided
  appear/disappear covered across the whole gap, clipping),
- stream semantics (order, one result per frame, keyframes byte-identical
  to the base engine, gap blur == host mosaic under the reported boxes),
- the pipelined dispatch_batch path == the synchronous path,
- I420 gap frames blurred with the planar host mosaic,
- interval=1 delegating untouched,
- config plumbing ([TPU] detect_interval).
"""

import numpy as np
import pytest

from video_desensitization_tpu.ops.mosaic import (
    mosaic_host_inplace,
    mosaic_i420_host_inplace,
)
from video_desensitization_tpu.pipeline.engine import EngineResult
from video_desensitization_tpu.pipeline.tracking import (
    TrackingEngine,
    greedy_match,
    iou_matrix,
    propagate_boxes,
)

rng = np.random.default_rng(7)


# --------------------------------------------------------------------------
# Matching / propagation math
# --------------------------------------------------------------------------


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    b = np.array([[0, 0, 10, 10], [5, 0, 15, 10]], float)
    m = iou_matrix(a, b)
    assert m.shape == (2, 2)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(50.0 / 150.0)
    assert m[1, 0] == 0.0
    assert iou_matrix(np.zeros((0, 4)), b).shape == (0, 2)


def test_greedy_match_best_first_and_threshold():
    a = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], float)
    b = np.array([[1, 0, 11, 10], [500, 500, 510, 510]], float)
    pairs, un_a, un_b = greedy_match(a, b, iou_thresh=0.3)
    assert pairs == [(0, 0)]
    assert un_a == [1] and un_b == [1]
    # Each box matched at most once: two a-boxes over one b-box.
    a2 = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float)
    b2 = np.array([[0, 0, 10, 10]], float)
    pairs, un_a, un_b = greedy_match(a2, b2)
    assert len(pairs) == 1 and len(un_a) == 1 and un_b == []


def test_propagate_linear_motion_contains_truth():
    # A box translating linearly: the lerped box equals ground truth, so
    # every gap frame's propagated box must CONTAIN the true box.
    hw = (1080, 1920)
    n_gap = 6
    # Flanking observations must overlap (IoU >= iou_thresh) to be matched
    # and lerped; larger jumps are covered by the one-sided persist path.
    d0 = [[100.0, 200.0, 220.0, 320.0]]
    d1 = [[130.0, 230.0, 250.0, 350.0]]
    per_frame = propagate_boxes(d0, d1, n_gap, hw)
    assert len(per_frame) == n_gap - 1
    for j, boxes in enumerate(per_frame):
        assert len(boxes) == 1
        alpha = (j + 1) / n_gap
        truth = (1 - alpha) * np.array(d0[0]) + alpha * np.array(d1[0])
        x1, y1, x2, y2 = boxes[0]
        assert x1 <= truth[0] and y1 <= truth[1]
        assert x2 >= truth[2] and y2 >= truth[3]


def test_propagate_one_sided_covers_whole_gap():
    hw = (720, 1280)
    d0 = [[50.0, 50.0, 100.0, 100.0]]  # disappears by the next keyframe
    d1 = [[600.0, 300.0, 660.0, 360.0]]  # appears at the next keyframe
    per_frame = propagate_boxes(d0, d1, 5, hw, iou_thresh=0.3)
    for boxes in per_frame:
        # Both one-sided boxes persist across every gap frame...
        assert len(boxes) == 2
        # ...and each contains its keyframe observation.
        covers_d0 = any(
            b[0] <= 50 and b[1] <= 50 and b[2] >= 100 and b[3] >= 100
            for b in boxes
        )
        covers_d1 = any(
            b[0] <= 600 and b[1] <= 300 and b[2] >= 660 and b[3] >= 360
            for b in boxes
        )
        assert covers_d0 and covers_d1


def test_propagate_tail_and_clip():
    # Stream tail (d1=None): d0 boxes persist; clipping keeps boxes in-frame.
    hw = (100, 100)
    d0 = [[90.0, 90.0, 99.0, 99.0]]
    per_frame = propagate_boxes(d0, None, 4, hw, appear_slack=2.0)
    assert len(per_frame) == 3
    for boxes in per_frame:
        assert len(boxes) == 1
        x1, y1, x2, y2 = boxes[0]
        assert 0 <= x1 <= x2 <= 100 and 0 <= y1 <= y2 <= 100
        assert x1 <= 90 and y1 <= 90  # inflated toward the unseen side


def test_propagate_empty_and_degenerate():
    assert propagate_boxes([], None, 4, (100, 100)) == [[], [], []]
    assert propagate_boxes([], [], 1, (100, 100)) == []
    # A box inflated off-frame degenerates to None and is dropped.
    out = propagate_boxes([[0.0, 0.0, 0.4, 0.4]], None, 2, (100, 100))
    assert out == [[]] or len(out[0][0]) == 4


# --------------------------------------------------------------------------
# Stream semantics against a fake base engine
# --------------------------------------------------------------------------


def _truth_box(idx: int):
    """Ground-truth face box for frame idx: linear motion."""
    x = 20.0 + 3.0 * idx
    y = 30.0 + 2.0 * idx
    return [x, y, x + 40.0, y + 32.0]


class FakeBase:
    """Deterministic stand-in engine: 'detects' the ground-truth box encoded
    by the frame's index byte and mosaics it like the real engines."""

    mosaic_level = 8
    anonymizer = "mosaic"

    def __init__(self, i420=False, plates=False):
        self.i420 = i420
        self.plates = plates
        self.batches = []  # dispatch sizes, for pipelining assertions

    @staticmethod
    def frame_idx(frame) -> int:
        return int(frame[0, 0, 0] if frame.ndim == 3 else frame[0, 0])

    def process_batch(self, frames):
        self.batches.append(frames.shape[0])
        out = np.array(frames)
        fb, pb = [], []
        for i in range(out.shape[0]):
            box = _truth_box(self.frame_idx(out[i]))
            plist = [[300.0, 10.0, 360.0, 40.0]] if self.plates else []
            if self.i420:
                mosaic_i420_host_inplace(out[i], [box] + plist, self.mosaic_level)
            else:
                mosaic_host_inplace(out[i], [box] + plist, self.mosaic_level)
            fb.append([box])
            pb.append(plist)
        return EngineResult(
            frames=out,
            face_boxes=fb,
            plate_boxes=pb,
            num_faces=len(fb),
            num_plates=sum(len(p) for p in pb),
        )


class FakePipelinedBase(FakeBase):
    """Adds the fused engine's dispatch/finalize split (deferred compute)."""

    def dispatch_batch(self, frames, image_shapes=None):
        return np.array(frames)

    def finalize_batch(self, handle):
        return self.process_batch(handle)


def _make_frames(n, h=256, w=256, i420=False):
    """Random frames with the frame index stamped at [0,0(,0)]."""
    if i420:
        frames = rng.integers(0, 255, (n, h * 3 // 2, w), np.uint8)
        frames[:, 0, 0] = np.arange(n)
    else:
        frames = rng.integers(0, 255, (n, h, w, 3), np.uint8)
        frames[:, 0, 0, 0] = np.arange(n)
    return frames


def _batches(frames, bs):
    for i in range(0, len(frames), bs):
        yield np.array(frames[i : i + bs])


def _collect(eng, frames, bs=5):
    results = list(eng.process_stream(_batches(frames, bs)))
    assert all(r.frames.shape[0] == 1 for r in results)
    return results


@pytest.mark.parametrize("base_cls", [FakeBase, FakePipelinedBase])
@pytest.mark.parametrize("n", [1, 4, 12, 23])
def test_stream_covers_every_frame_in_order(base_cls, n):
    frames = _make_frames(n)
    eng = TrackingEngine(base_cls(), interval=4, detect_batch=3, depth=1)
    results = _collect(eng, frames)
    assert len(results) == n
    for idx, r in enumerate(results):
        assert FakeBase.frame_idx(r.frames[0]) == idx
        # Ground truth is linear motion, so whether detected (keyframe) or
        # propagated (gap), the reported face region contains the truth.
        tx1, ty1, tx2, ty2 = _truth_box(idx)
        x1, y1, x2, y2 = r.face_boxes[0][0]
        assert x1 <= tx1 and y1 <= ty1 and x2 >= tx2 and y2 >= ty2
        assert r.num_faces == 1


def test_keyframes_byte_identical_and_gap_blur_exact():
    n, interval = 13, 3
    frames = _make_frames(n)
    eng = TrackingEngine(FakeBase(), interval=interval, detect_batch=2)
    results = _collect(eng, frames, bs=4)
    oracle = FakeBase()
    for idx, r in enumerate(results):
        if idx % interval == 0:
            # Keyframes run the full base engine program.
            exp = oracle.process_batch(frames[idx : idx + 1])
            np.testing.assert_array_equal(r.frames, exp.frames)
        else:
            # Gap frames == host mosaic of the ORIGINAL frame under the
            # boxes the result reports.
            exp = np.array(frames[idx])
            mosaic_host_inplace(
                exp, r.face_boxes[0] + r.plate_boxes[0], FakeBase.mosaic_level
            )
            np.testing.assert_array_equal(r.frames[0], exp)
            assert r.num_faces == len(r.face_boxes[0])


def test_stream_i420_gap_blur_planar():
    n, interval = 9, 3
    frames = _make_frames(n, h=64, w=96, i420=True)
    eng = TrackingEngine(FakeBase(i420=True), interval=interval, detect_batch=2)
    results = _collect(eng, frames, bs=4)
    assert len(results) == n
    for idx, r in enumerate(results):
        assert r.frames[0].shape == (96, 96)
        if idx % interval:
            exp = np.array(frames[idx])
            mosaic_i420_host_inplace(
                exp, r.face_boxes[0] + r.plate_boxes[0], FakeBase.mosaic_level
            )
            np.testing.assert_array_equal(r.frames[0], exp)


def test_pipelined_equals_sync():
    frames = _make_frames(17)
    kw = dict(interval=3, detect_batch=2, depth=2)
    res_a = _collect(TrackingEngine(FakeBase(plates=True), **kw), frames)
    res_b = _collect(TrackingEngine(FakePipelinedBase(plates=True), **kw), frames)
    assert len(res_a) == len(res_b) == 17
    for a, b in zip(res_a, res_b):
        np.testing.assert_array_equal(a.frames, b.frames)
        assert a.face_boxes == b.face_boxes
        assert a.plate_boxes == b.plate_boxes


def test_detector_amortization():
    # 24 frames at interval=4 -> 6 keyframes hit the base; the flush-time
    # partial batch (2 keyframes) is PADDED to detect_batch so shape-
    # specialized programs never see a one-off tail shape.
    frames = _make_frames(24)
    base = FakePipelinedBase()
    eng = TrackingEngine(base, interval=4, detect_batch=4, depth=1)
    _collect(eng, frames)
    assert base.batches == [4, 4]


def test_interval_one_is_identity():
    frames = _make_frames(8)
    base = FakeBase()
    eng = TrackingEngine(base, interval=1)
    results = list(eng.process_stream(_batches(frames, 4)))
    # Delegates per batch (FakeBase has no process_stream of its own).
    assert len(results) == 2
    exp = FakeBase().process_batch(frames[:4])
    np.testing.assert_array_equal(results[0].frames, exp.frames)


def test_delegation_and_validation():
    base = FakeBase()
    eng = TrackingEngine(base, interval=4)
    assert eng.mosaic_level == 8  # __getattr__ delegation
    assert not hasattr(eng, "dispatch_batch")
    assert hasattr(TrackingEngine(FakePipelinedBase(), interval=2), "dispatch_batch")
    with pytest.raises(ValueError):
        TrackingEngine(base, interval=0)


def test_config_plumbing(tmp_path):
    from video_desensitization_tpu.api.config import load_config

    ini = tmp_path / "c.ini"
    ini.write_text("[PATHS]\n[TPU]\ndetect_interval = 5\n")
    cfg = load_config(str(ini), strict=False)
    assert cfg.detect_interval == 5
    assert cfg.track_detect_batch == 0  # default: auto (= batch_size)
    ini.write_text("[PATHS]\n[TPU]\ndetect_interval = 0\n")
    with pytest.raises(ValueError, match="detect_interval"):
        load_config(str(ini), strict=False)
    ini.write_text("[PATHS]\n[TPU]\ntrack_detect_batch = 12\n")
    assert load_config(str(ini), strict=False).track_detect_batch == 12
    ini.write_text("[PATHS]\n[TPU]\ntrack_detect_batch = -1\n")
    with pytest.raises(ValueError, match="track_detect_batch"):
        load_config(str(ini), strict=False)


def test_config_large_interval_warns(tmp_path):
    """detect_interval > 4 is outside the verified-complete coverage range
    (benchmarks/tracking_coverage.py: curved motion min ~0.20 at interval
    8) — config validation must say so out loud, not silently accept.

    Captures via a handler on the project logger directly: once
    setup_logger has run (any earlier test), the hierarchy stops
    propagating to root, so pytest's caplog would miss the record."""
    import logging

    from video_desensitization_tpu.api.config import load_config
    from video_desensitization_tpu.utils.logging import get_logger

    records = []
    handler = logging.Handler()
    handler.emit = records.append
    lg = get_logger("config")
    lg.addHandler(handler)
    try:
        ini = tmp_path / "c.ini"
        ini.write_text("[PATHS]\n[TPU]\ndetect_interval = 8\n")
        cfg = load_config(str(ini), strict=False)
        assert cfg.detect_interval == 8
        assert any("detect_interval=8" in r.getMessage() for r in records)
        records.clear()
        ini.write_text("[PATHS]\n[TPU]\ndetect_interval = 4\n")
        load_config(str(ini), strict=False)
        assert not any("detect_interval" in r.getMessage() for r in records)
    finally:
        lg.removeHandler(handler)


def test_build_engine_track_detect_batch(tmp_path):
    """build_engine: detect_batch = track_detect_batch, else batch_size
    (auto — the tracker then drives the same compiled program as the
    non-tracked path instead of triggering a second XLA compile)."""
    from video_desensitization_tpu.api.config import load_config
    from video_desensitization_tpu.cli.main import build_engine

    def cfg_with(tpu_extra):
        ini = tmp_path / "b.ini"
        ini.write_text(
            "[PATHS]\nmodel_path=random\nmodel_weights=random\n"
            "[SETTINGS]\nbatch_size=6\n"
            "[TPU]\ninput_size=128\nmax_detections=4\ndtype=float32\n"
            f"detect_interval = 3\n{tpu_extra}"
        )
        return load_config(str(ini), strict=False)

    eng = build_engine(cfg_with(""), with_plates=False, allow_random=True)
    assert eng.interval == 3 and eng.detect_batch == 6
    eng = build_engine(
        cfg_with("track_detect_batch = 2\n"),
        with_plates=False,
        allow_random=True,
    )
    assert eng.detect_batch == 2


# --------------------------------------------------------------------------
# Coasting: tracks missed at keyframes keep covering (KeyframeTracker)
# --------------------------------------------------------------------------

from video_desensitization_tpu.pipeline.tracking import (  # noqa: E402
    KeyframeTracker,
    coast_boxes,
)


class FlakyBase(FakeBase):
    """FakeBase whose detector BLINKS on keyframes listed in ``miss_at``:
    no boxes reported, frame returned unblurred (like a real miss)."""

    def __init__(self, miss_at=(), **kw):
        super().__init__(**kw)
        self.miss_at = set(miss_at)

    def process_batch(self, frames):
        self.batches.append(frames.shape[0])
        out = np.array(frames)
        fb, pb = [], []
        for i in range(out.shape[0]):
            idx = self.frame_idx(out[i])
            if idx in self.miss_at:
                fb.append([])
            else:
                box = _truth_box(idx)
                mosaic_host_inplace(out[i], [box], self.mosaic_level)
                fb.append([box])
            pb.append([])
        return EngineResult(
            frames=out, face_boxes=fb, plate_boxes=pb,
            num_faces=sum(len(b) for b in fb), num_plates=0,
        )


def test_keyframe_tracker_coast_snapshots():
    kt = KeyframeTracker(coast=2)
    assert kt.observe([[0.0, 0.0, 10.0, 10.0]]) == []
    assert kt.observe([[10.0, 0.0, 20.0, 10.0]]) == []  # matched: vel learned
    c1 = kt.observe([])  # miss 1: extrapolated one keyframe forward
    assert len(c1) == 1 and c1[0]["miss"] == 1
    np.testing.assert_allclose(c1[0]["box"], [20.0, 0.0, 30.0, 10.0])
    c2 = kt.observe([])  # miss 2
    np.testing.assert_allclose(c2[0]["box"], [30.0, 0.0, 40.0, 10.0])
    assert kt.observe([]) == []  # miss 3 > coast: expired
    assert kt.tracks == []


def test_keyframe_tracker_rematch_after_miss():
    # Re-sighted after one miss: matched by distance against the
    # extrapolated position, velocity re-learned over the 2-keyframe span.
    kt = KeyframeTracker(coast=3)
    kt.observe([[0.0, 0.0, 10.0, 10.0]])
    kt.observe([[30.0, 0.0, 40.0, 10.0]])  # vel = 30/keyframe
    assert len(kt.observe([])) == 1
    assert kt.observe([[90.0, 0.0, 100.0, 10.0]]) == []  # rematch, no coast
    assert len(kt.tracks) == 1
    np.testing.assert_allclose(kt.tracks[0]["vel"], [30.0, 0.0, 30.0, 0.0])


def test_keyframe_tracker_fast_motion_matches_without_iou():
    # Displacement larger than the box (IoU 0) still matches by center
    # distance — an IoU-gated tracker would duplicate every fast mover.
    kt = KeyframeTracker(coast=2)
    kt.observe([[0.0, 0.0, 10.0, 10.0]])
    assert kt.observe([[20.0, 0.0, 30.0, 10.0]]) == []
    assert len(kt.tracks) == 1


def test_coast_boxes_extrapolation_contains_linear_truth():
    coasted = [{"box": np.array([100.0, 50.0, 140.0, 90.0]),
                "vel": np.array([8.0, 4.0, 8.0, 4.0]), "miss": 1}]
    kf, per_frame = coast_boxes(coasted, n_gap=4, frame_hw=(512, 512))
    assert len(kf) == 1 and len(per_frame) == 3
    # Keyframe cover contains the snapshot box.
    assert kf[0][0] <= 100 and kf[0][2] >= 140
    for j in range(3):
        alpha = (j + 1) / 4
        tx1 = 100 + 8 * alpha
        ty1 = 50 + 4 * alpha
        b = per_frame[j][0]
        assert b[0] <= tx1 and b[1] <= ty1
        assert b[2] >= tx1 + 40 and b[3] >= ty1 + 40


def test_double_miss_still_covered():
    """A box the detector misses at TWO consecutive keyframes (the round-3
    hole) is still blurred on those keyframes AND across their gaps."""
    n, interval = 19, 3
    frames = _make_frames(n)
    eng = TrackingEngine(
        FlakyBase(miss_at={6, 9}), interval=interval, detect_batch=2, coast=3
    )
    results = _collect(eng, frames, bs=4)
    assert len(results) == n
    for idx in range(n):
        r = results[idx]
        boxes = r.face_boxes[0]
        assert boxes, f"frame {idx} has no cover"
        tx1, ty1, tx2, ty2 = _truth_box(idx)
        assert any(
            b[0] <= tx1 and b[1] <= ty1 and b[2] >= tx2 and b[3] >= ty2
            for b in boxes
        ), f"frame {idx} cover does not contain truth"
    # The missed keyframes were NOT blurred by the base engine; the coast
    # blur is the host mosaic of the original frame under the coast boxes.
    for idx in (6, 9):
        exp = np.array(frames[idx])
        mosaic_host_inplace(exp, results[idx].face_boxes[0], FakeBase.mosaic_level)
        np.testing.assert_array_equal(results[idx].frames[0], exp)


def test_coast_expires_no_stale_boxes():
    """coast=1: a track missed at two consecutive keyframes stops covering
    after the first (no unbounded ghost blur)."""
    n, interval = 16, 3
    frames = _make_frames(n)
    eng = TrackingEngine(
        FlakyBase(miss_at={6, 9, 12}), interval=interval, detect_batch=2,
        coast=1,
    )
    results = _collect(eng, frames, bs=4)
    assert results[6].num_faces == 1  # coasted once
    assert results[9].num_faces == 0  # expired
    assert results[12].num_faces == 0
    # and the expired keyframe frame is untouched (no blur applied)
    np.testing.assert_array_equal(results[9].frames[0], frames[9])


def test_camera_tracker_matches_tracking_engine():
    """The push-style CameraTracker (multicam's per-camera state) emits
    exactly what TrackingEngine emits for the same ordered stream."""
    from concurrent.futures import ThreadPoolExecutor

    from video_desensitization_tpu.pipeline.tracking import CameraTracker

    n, interval = 13, 3
    frames = _make_frames(n)
    eng = TrackingEngine(FakeBase(), interval=interval, detect_batch=1, depth=0)
    res_pull = _collect(eng, frames)

    base = FakeBase()
    pool = ThreadPoolExecutor(max_workers=2)
    ct = CameraTracker(interval, pool)
    res_push = []
    for f in frames:
        f = np.array(f)
        if ct.push_frame(f):
            r = base.process_batch(f[None])
            res_push.extend(
                ct.push_detection(r.frames[0], r.face_boxes[0], r.plate_boxes[0])
            )
    res_push.extend(ct.flush())
    pool.shutdown()

    assert len(res_push) == len(res_pull) == n
    for a, b in zip(res_pull, res_push):
        np.testing.assert_array_equal(a.frames, b.frames)
        assert a.face_boxes == b.face_boxes
        assert a.num_faces == b.num_faces


def test_camera_tracker_flush_guards_pending_detections():
    from concurrent.futures import ThreadPoolExecutor

    from video_desensitization_tpu.pipeline.tracking import CameraTracker

    pool = ThreadPoolExecutor(max_workers=1)
    ct = CameraTracker(2, pool)
    assert ct.push_frame(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(RuntimeError, match="outstanding"):
        ct.flush()
    pool.shutdown()
