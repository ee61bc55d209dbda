"""Pallas mosaic kernel throughput across box loads (real chip).

The fused-program rate bench.py reports (fused_device_fps) runs under a
WORST-CASE mosaic load: random-init detectors emit max_detections giant
boxes per frame. Real footage carries a handful of small boxes, and the
round-3 kernel gates its MXU work per 128-lane group on box overlap, so the
production mosaic cost is far below the bench number. This harness pins
that claim: it times ``mosaic_boxes_batch_pallas`` alone, pipelined at
batch B on 1080p frames, across box loads from typical (4 x 120x90) to the
bench worst case (24 x full-frame).

Run on the TPU host:

    python benchmarks/mosaic_bench.py [--batch 128] [--iters 8]

Prints one JSON line per load: {"load": ..., "boxes_per_frame": K,
"box_hw": [h, w], "fps": N, "us_per_frame": N}.

Reference kernel being out-performed: the sequential per-box cv2 resize
pair at combine_detect.py:138-161.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdt_jax_cache")


LOADS = [
    # (name, boxes per frame, box (h, w)) — scattered deterministically
    ("typical_faces", 4, (90, 120)),
    ("busy_street", 12, (90, 120)),
    ("large_rois", 4, (360, 480)),
    ("bench_worst_case", 24, (1080, 1920)),
]


def make_boxes(b: int, k: int, hw, frame_hw=(1080, 1920)):
    rng = np.random.default_rng(0)
    bh, bw = hw
    fh, fw = frame_hw
    y1 = rng.integers(0, max(1, fh - bh), (b, k))
    x1 = rng.integers(0, max(1, fw - bw), (b, k))
    boxes = np.stack([x1, y1, x1 + bw, y1 + bh], axis=-1).astype(np.int32)
    return boxes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--profile",
        metavar="DIR",
        help="also capture a jax.profiler trace of the FIRST load into DIR "
        "and print the top ops via profile_device.analyze",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_desensitization_tpu.ops.pallas_mosaic import (
        mosaic_boxes_batch_pallas_flat,
    )

    b = args.batch
    rng = np.random.default_rng(0)
    # Bench the flat (B, H, W*3) entry — the form the fused engine feeds the
    # kernel. Benching the 4D convenience wrapper under its own jit instead
    # measures mostly XLA layout copies at the jit boundary (profiled 66% of
    # self time at typical_faces load: four full-frame copies vs 26% kernel).
    frames = jnp.asarray(
        rng.integers(0, 255, (b, 1080, 1920 * 3), dtype=np.uint8)
    )
    fn = jax.jit(
        lambda fr, bx, va: mosaic_boxes_batch_pallas_flat(fr, bx, va, 1920, 8)
    )

    for name, k, hw in LOADS:
        boxes = jnp.asarray(make_boxes(b, k, hw))
        valid = jnp.ones((b, k), bool)
        out = fn(frames, boxes, valid)
        np.asarray(out[0, :1, :1])  # compile + warm; sync via tiny fetch
        t0 = time.perf_counter()
        outs = [fn(frames, boxes, valid) for _ in range(args.iters)]
        for o in outs:
            np.asarray(o[0, :1, :1])
        dt = time.perf_counter() - t0
        fps = args.iters * b / dt
        print(
            json.dumps(
                {
                    "load": name,
                    "boxes_per_frame": k,
                    "box_hw": list(hw),
                    "fps": round(fps, 1),
                    "us_per_frame": round(1e6 / fps, 1),
                }
            )
        )
        if args.profile and name == LOADS[0][0]:
            with jax.profiler.trace(args.profile):
                outs = [
                    fn(frames, boxes, valid)
                    for _ in range(args.iters)
                ]
                for o in outs:
                    np.asarray(o[0, :1, :1])
            from profile_device import analyze

            cols, rows = analyze(args.profile)
            for r in rows:
                r["_t"] = float(r.get("Total self time (us)") or 0)
            rows.sort(key=lambda r: -r["_t"])
            total = sum(r["_t"] for r in rows) or 1.0
            for r in rows[:15]:
                print(
                    f"{r['_t']:12.0f}us {100 * r['_t'] / total:5.1f}% "
                    f"{r.get('HLO op category')} / "
                    f"{str(r.get('HLO op name'))[:60]}"
                )


if __name__ == "__main__":
    main()
