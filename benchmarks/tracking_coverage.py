"""Privacy-coverage evaluation of detection-interval tracking.

``[TPU] detect_interval = N`` (pipeline/tracking.py) detects on every Nth
frame and covers the frames in between with IoU-matched, interpolated,
margin-inflated keyframe boxes. The throughput win is measured by bench.py
(tracked_fps_i4); THIS harness quantifies the privacy cost: on synthetic
scenes with known ground-truth motion, what fraction of each true box's
area do the propagated boxes actually cover on the frames the detector
never saw?

Scenarios (per-frame ground-truth tracks, keyframe detections = truth +
corner jitter, optional misses):

- linear:      constant-velocity translation (the model's exact case)
- curved:      sinusoidal lateral swerve on top of forward motion (a lane
               change / turning vehicle; tests the inflation envelope
               against curvature the lerp cannot represent)
- accelerate:  quadratic motion (closing speed changes between keyframes)
- scale:       box grows as the subject approaches the camera
- appear:      subject enters mid-gap (worst case: the earlier keyframe
               never saw it; coverage before the first sighting is
               structurally zero — reported separately as `unseen`)
- jitter_miss: linear motion, 30%% per-keyframe detector miss rate, strong
               corner jitter (detector flicker robustness)

Metrics per (scenario, interval): mean/min coverage over COVERED gap
frames, the fraction of gap frames fully covered (coverage >= 0.999),
`unseen` (gap frames before a track's first keyframe sighting — no
propagation scheme can cover these; the knob's real privacy exposure),
and area_overhead (extra blurred area / true area — what the inflation
envelope costs in over-blur).

Pure numpy, CPU, deterministic. One JSON line per (scenario, interval)
plus a summary line. Reference behavior = interval 1 (every frame
detected); the reference itself exposes frame subsampling as
``convert_video_to_frames(..., interval)`` (combine_detect.py:279) but
simply DROPS the skipped frames, so any coverage here is strictly better
than the reference's own subsampling path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_desensitization_tpu.pipeline.tracking import (
    KeyframeTracker,
    coast_boxes,
    propagate_boxes,
)

H, W = 1080, 1920
BOX_W, BOX_H = 90.0, 110.0  # a near-field face/plate at 1080p


def _clip_box(b):
    return [
        max(0.0, b[0]), max(0.0, b[1]), min(float(W), b[2]), min(float(H), b[3])
    ]


def make_track(scenario: str, n_frames: int, rng) -> list:
    """Ground-truth box per frame (None before the subject appears)."""
    # Velocities are scaled so every track stays fully in-frame over the
    # default 240 frames — otherwise late-track numbers measure frame-edge
    # clipping artifacts instead of propagation quality.
    t = np.arange(n_frames, dtype=np.float64)
    if scenario == "linear":
        x = 200 + 6.5 * t
        y = 400 + 2.2 * t
        w = np.full(n_frames, BOX_W)
        h = np.full(n_frames, BOX_H)
    elif scenario == "curved":
        x = 200 + 5.5 * t + 120.0 * np.sin(t / 9.0)
        y = 350 + 1.5 * t + 60.0 * np.cos(t / 7.0)
        w = np.full(n_frames, BOX_W)
        h = np.full(n_frames, BOX_H)
    elif scenario == "accelerate":
        x = 150 + 2.0 * t + 0.02 * t * t  # velocity 2 -> ~11.6 px/frame
        y = 300 + 0.5 * t + 0.006 * t * t
        w = np.full(n_frames, BOX_W)
        h = np.full(n_frames, BOX_H)
    elif scenario == "scale":
        x = 800 + 3.0 * t
        y = 250 + 1.5 * t
        s = 1.0 + 0.0035 * t  # approaching: ~1.8x by the end
        w = BOX_W * s
        h = BOX_H * s
    elif scenario in ("appear", "jitter_miss"):
        x = 200 + 6.5 * t
        y = 400 + 2.2 * t
        w = np.full(n_frames, BOX_W)
        h = np.full(n_frames, BOX_H)
    else:
        raise ValueError(scenario)
    track = []
    appear_at = n_frames // 3 if scenario == "appear" else 0
    for i in range(n_frames):
        if i < appear_at:
            track.append(None)
        else:
            track.append(_clip_box([x[i], y[i], x[i] + w[i], y[i] + h[i]]))
    return track


def detect_at(track, idx, scenario, rng):
    """Simulated keyframe detection: truth + corner jitter, maybe missed."""
    truth = track[idx]
    if truth is None:
        return []
    jitter = 6.0 if scenario == "jitter_miss" else 2.0
    if scenario == "jitter_miss" and rng.random() < 0.3:
        return []  # detector blinked on this keyframe
    b = np.asarray(truth) + rng.normal(0.0, jitter, 4)
    return [_clip_box(b.tolist())]


def coverage_of(truth, boxes) -> float:
    """Fraction of the truth box's area covered by the union of boxes
    (exact, via a 1-px grid over the truth ROI — truth boxes are small)."""
    x1, y1, x2, y2 = (int(np.floor(truth[0])), int(np.floor(truth[1])),
                      int(np.ceil(truth[2])), int(np.ceil(truth[3])))
    if x2 <= x1 or y2 <= y1:
        return 1.0
    covered = np.zeros((y2 - y1, x2 - x1), bool)
    for b in boxes:
        bx1 = max(x1, int(np.floor(b[0]))) - x1
        by1 = max(y1, int(np.floor(b[1]))) - y1
        bx2 = min(x2, int(np.ceil(b[2]))) - x1
        by2 = min(y2, int(np.ceil(b[3]))) - y1
        if bx2 > bx1 and by2 > by1:
            covered[by1:by2, bx1:bx2] = True
    return float(covered.mean())


def run_scenario(
    scenario: str, interval: int, n_frames: int, seed: int, coast: int = 3
):
    rng = np.random.default_rng(seed)
    track = make_track(scenario, n_frames, rng)
    kf_idx = list(range(0, n_frames, interval))
    dets = {k: detect_at(track, k, scenario, rng) for k in kf_idx}

    covs, unseen, extra_area, true_area = [], 0, 0.0, 0.0
    full = 0
    n_gap_frames = 0
    # The exact per-segment cover the TrackingEngine applies: flanking-
    # keyframe propagation + coasting tracks (TrackingEngine._emit).
    tracker = KeyframeTracker(coast=coast)
    for ki, k in enumerate(kf_idx):
        k_next = kf_idx[ki + 1] if ki + 1 < len(kf_idx) else None
        d0 = dets[k]
        coasted = tracker.observe(d0)
        d1 = dets.get(k_next) if k_next is not None else None
        n_gap = (k_next - k) if k_next is not None else (n_frames - k)
        per_frame = propagate_boxes(d0, d1, n_gap, (H, W))
        _, coast_pf = coast_boxes(coasted, n_gap, (H, W))
        for j in range(len(per_frame)):
            per_frame[j].extend(coast_pf[j])
        for j, boxes in enumerate(per_frame):
            fi = k + 1 + j
            if fi >= n_frames:
                break
            truth = track[fi]
            if truth is None:
                continue  # nothing to protect yet
            if (truth[2] - truth[0]) * (truth[3] - truth[1]) < 4.0:
                continue  # effectively exited the frame
            n_gap_frames += 1
            seen_before = any(
                kk <= fi and track[kk] is not None and dets[kk]
                for kk in kf_idx
            )
            if not boxes or not seen_before:
                # No keyframe has sighted the subject yet: structurally
                # uncoverable by ANY propagation scheme.
                if not seen_before:
                    unseen += 1
                    continue
            c = coverage_of(truth, boxes)
            covs.append(c)
            if c >= 0.999:
                full += 1
            ta = (truth[2] - truth[0]) * (truth[3] - truth[1])
            ba = sum((b[2] - b[0]) * (b[3] - b[1]) for b in boxes)
            true_area += ta
            extra_area += max(0.0, ba - ta)

    return {
        "scenario": scenario,
        "interval": interval,
        "gap_frames": n_gap_frames,
        "coverage_mean": round(float(np.mean(covs)), 4) if covs else None,
        "coverage_min": round(float(np.min(covs)), 4) if covs else None,
        "fully_covered_pct": round(100.0 * full / len(covs), 2) if covs else None,
        "unseen_frames": unseen,
        "area_overhead": (
            round(extra_area / true_area, 2) if true_area else None
        ),
    }


SCENARIOS = ("linear", "curved", "accelerate", "scale", "appear", "jitter_miss")


def multicam_parity(interval: int, n_frames: int, seed: int, coast: int = 3):
    """Co-batched multicam routing == single-stream coverage, exactly.

    The record job's per-camera tracking (pipeline/multicam.py) routes
    shared-batch detection results back FIFO into per-camera
    ``CameraTracker``s — the one place a cross-camera ordering bug would
    silently unblur a stream. This check drives two simulated cameras
    with DIFFERENT motions (linear vs. curved) through interleaved
    co-batch routing (push_frame / FIFO push_detection, batch 4) and
    asserts every emitted frame's boxes equal the direct single-stream
    computation (KeyframeTracker + propagate_boxes + coast_boxes — the
    math run_scenario scores). Returns True on exact parity.
    """
    from concurrent.futures import ThreadPoolExecutor

    from video_desensitization_tpu.pipeline.tracking import CameraTracker

    s = 0.25  # small frames: parity is about routing, not resolution
    hw = (int(H * s), int(W * s))
    cams = {"a": "linear", "b": "curved"}
    kf_idx = list(range(0, n_frames, interval))
    dets = {}
    for cam, scen in cams.items():
        rng = np.random.default_rng(seed)
        track = make_track(scen, n_frames, rng)
        dets[cam] = {
            k: [[v * s for v in b] for b in detect_at(track, k, scen, rng)]
            for k in kf_idx
        }

    # Reference: per-frame boxes from the single-stream math.
    ref = {cam: [] for cam in cams}
    for cam in cams:
        tracker = KeyframeTracker(coast=coast)
        for ki, k in enumerate(kf_idx):
            k_next = kf_idx[ki + 1] if ki + 1 < len(kf_idx) else None
            d0 = dets[cam][k]
            coasted = tracker.observe(d0)
            d1 = dets[cam].get(k_next) if k_next is not None else None
            n_gap = (k_next - k) if k_next is not None else (n_frames - k)
            per_frame = propagate_boxes(d0, d1, n_gap, hw)
            kf_extra, coast_pf = coast_boxes(coasted, n_gap, hw)
            ref[cam].append(list(d0) + kf_extra)
            for j in range(min(len(per_frame), n_frames - k - 1)):
                ref[cam].append(per_frame[j] + coast_pf[j])

    # Multicam-sim: round-robin interleaved frames, batch-of-4 FIFO
    # keyframe dispatch, per-camera push_detection — multicam.py's shape.
    got = {cam: [] for cam in cams}
    with ThreadPoolExecutor(max_workers=2) as pool:
        trackers = {
            cam: CameraTracker(interval, pool, coast=coast) for cam in cams
        }
        pending = []

        def dispatch():
            for cam, k in pending:
                frame = np.zeros((hw[0], hw[1], 3), np.uint8)
                for r in trackers[cam].push_detection(frame, dets[cam][k], []):
                    got[cam].append(r.face_boxes[0])
            pending.clear()

        for i in range(n_frames):
            for cam in cams:
                frame = np.zeros((hw[0], hw[1], 3), np.uint8)
                if trackers[cam].push_frame(frame):
                    pending.append((cam, i))
            if len(pending) >= 4:
                dispatch()
        dispatch()
        for cam in cams:
            for r in trackers[cam].flush():
                got[cam].append(r.face_boxes[0])

    return all(got[cam] == ref[cam] for cam in cams)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--intervals", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--coast", type=int, default=3,
        help="keyframes an unmatched track coasts (TrackingEngine default)",
    )
    ap.add_argument(
        "--gate", type=int, default=0, metavar="N",
        help="exit 1 unless every scenario at interval <= N has "
        "coverage_min == 1.0 AND unseen_total == 0 — the CI privacy gate "
        "backing the README claim that intervals <= 4 are complete "
        "(unseen_total alone let a 0.198-min-coverage frame pass)",
    )
    args = ap.parse_args()

    rows = []
    for scenario in SCENARIOS:
        for interval in args.intervals:
            row = run_scenario(
                scenario, interval, args.frames, args.seed, coast=args.coast
            )
            rows.append(row)
            print(json.dumps(row))
    mc_parity = all(
        multicam_parity(interval, args.frames, args.seed, coast=args.coast)
        for interval in args.intervals
        if interval > 1
    )
    mins = [r["coverage_min"] for r in rows if r["coverage_min"] is not None]
    means = [r["coverage_mean"] for r in rows if r["coverage_mean"] is not None]
    gated = [
        r
        for r in rows
        if args.gate and r["interval"] <= args.gate
        and r["coverage_min"] is not None
    ]
    gate_min = min((r["coverage_min"] for r in gated), default=None)
    unseen_total = sum(r["unseen_frames"] for r in rows)
    print(
        json.dumps(
            {
                "metric": "tracking_coverage_summary",
                "scenarios": len(SCENARIOS),
                "intervals": args.intervals,
                "coverage_mean_overall": round(float(np.mean(means)), 4),
                "coverage_min_overall": round(float(np.min(mins)), 4),
                "unseen_total": unseen_total,
                "multicam_parity": mc_parity,
                "gate": args.gate or None,
                "gate_min_coverage": gate_min,
            }
        )
    )
    if args.gate:
        bad = [r for r in gated if r["coverage_min"] < 1.0]
        if not mc_parity:
            print(
                "GATE FAIL: multicam co-batch routing diverged from the "
                "single-stream coverage result",
                file=sys.stderr,
            )
            raise SystemExit(1)
        if bad or unseen_total > 0:
            for r in bad:
                print(
                    f"GATE FAIL: {r['scenario']} interval {r['interval']} "
                    f"coverage_min {r['coverage_min']} < 1.0",
                    file=sys.stderr,
                )
            if unseen_total:
                print(
                    f"GATE FAIL: unseen_total {unseen_total} > 0",
                    file=sys.stderr,
                )
            raise SystemExit(1)


if __name__ == "__main__":
    main()
