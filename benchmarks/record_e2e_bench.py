"""Full record-job end-to-end benchmark on real hardware.

The reference's headline workflow is `python combine_detect.py` over an
Apollo `.record` (combine_detect.py:786-990): unpack camera topics to H.265
streams, decode, detect faces+plates, mosaic, re-encode, repack the record.
This harness runs OUR whole equivalent (cli.main's record branch:
`pipeline.video_pipeline.process_record_job` — native libav decode,
co-batched multicam device detection, host/device mosaic, HEVC re-encode,
record repack) against a synthesized multi-camera 1080p record and reports
the end-to-end rate of the FULL job, codecs and container included.

    python benchmarks/record_e2e_bench.py [--cams 4] [--frames 48]
        [--batch 32] [--engine auto|tiered|fused]

Prints one JSON line:
    {"record_e2e_fps": N, "cams": C, "frames": F, "synth_s": S,
     "job_s": J, "unpack_s": U, "engine": "..."}

Random-init weights (no checkpoints ship in this environment) make the box
load worst-case-ish; the number measures the pipeline, not model quality.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdt_jax_cache")


def synthesize_record(root: str, cams: int, frames: int, hw=(1080, 1920)) -> str:
    """Write one .record with ``cams`` camera topics of 1080p H.265."""
    from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
    from video_desensitization_tpu.record.topics import (
        CAMERA_TOPICS,
        COMPRESSED_IMAGE_TYPE,
    )
    from video_desensitization_tpu.record.writer import RecordWriter
    from video_desensitization_tpu.video.av import PacketDemuxer, VideoEncoder

    h, w = hw
    rec_dir = os.path.join(root, "in")
    os.makedirs(rec_dir, exist_ok=True)
    rec = os.path.join(rec_dir, "bench.record")
    rng = np.random.default_rng(0)
    with RecordWriter(rec) as wr:
        for c in range(cams):
            topic = CAMERA_TOPICS[c]
            h265 = os.path.join(root, f"cam{c}.h265")
            with VideoEncoder(
                h265, w, h, fps=30, codec="libx265",
                bitrate=4_000_000, preset="ultrafast",
            ) as e:
                # Moving gradient + noise blocks: compresses like real video
                # (flat frames would make decode artificially cheap).
                base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                for i in range(frames):
                    f = np.roll(base, i * 16, axis=1)
                    f[h // 4 : h // 2, w // 4 : w // 2] = rng.integers(
                        0, 255, (h // 4, w // 4, 3), dtype=np.uint8
                    )
                    e.write(f)
            with PacketDemuxer(h265) as dm:
                pkts = dm.read_packets()
            wr.write_channel(topic, COMPRESSED_IMAGE_TYPE)
            for i, p in enumerate(pkts):
                img = sp.CompressedImage(format="h265", data=p.data)
                img.header.sequence_num = i
                wr.write_message(topic, img, 10**9 + i * 33_000_000)
    return rec_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=4)
    ap.add_argument("--frames", type=int, default=48, help="frames per camera")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--engine", default="auto")
    ap.add_argument(
        "--transfer",
        default="rgb",
        choices=["rgb", "yuv420"],
        help="frame transport ([TPU] transfer): yuv420 + engine=fused runs "
        "the record job decoder->chip->encoder in planar I420",
    )
    ap.add_argument(
        "--preset",
        default="medium",
        help="libx265 preset for the processed-video encode (the record "
        "job's tail on few-core hosts; 'medium' = reference parity)",
    )
    ap.add_argument(
        "--detect-interval",
        type=int,
        default=1,
        help="[TPU] detect_interval: detect every Nth frame per camera; "
        "gap frames are covered by per-camera propagated boxes "
        "(pipeline/multicam.py CameraTracker) — the record job's "
        "throughput knob on link-bound hosts",
    )
    ap.add_argument(
        "--encode-threads",
        type=int,
        default=0,
        help="[SETTINGS] encode_threads: x265 pools/frame-threads for the "
        "processed-video writers (0 = x265 auto)",
    )
    ap.add_argument(
        "--co-batch",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="co-batch frames from all cameras into shared device batches",
    )
    ap.add_argument(
        "--typical-boxes",
        action="store_true",
        help="replace the random-init detections (a worst-case box load: "
        "~24 quarter-frame boxes/frame) with the deterministic "
        "production-realistic synthetic detector (3 face-sized + 1 "
        "plate-sized drifting boxes, benchmarks/synthetic_boxes.py); the "
        "device program still runs in full — only host blur and tracker "
        "load change. Tiered engine only.",
    )
    ap.add_argument("--keep", action="store_true", help="keep the work dir")
    ap.add_argument(
        "--smoke",
        action="store_true",
        help="tiny shapes on the CPU backend: validates the whole harness "
        "(synthesis, config, engine build, record job, repack) without a "
        "TPU; the fps number is meaningless",
    )
    args = ap.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # Shrink sizes, but respect engine/preset the user passed
        # explicitly — a smoke of the fused branch must actually run it.
        def _passed(flag):
            return any(
                a == flag or a.startswith(flag + "=") for a in sys.argv[1:]
            )

        args.cams = min(args.cams, 2)
        args.frames = min(args.frames, 6)
        args.batch = min(args.batch, 4)
        if not _passed("--engine"):
            args.engine = "tiered"
        if not _passed("--preset"):
            args.preset = "ultrafast"

    from video_desensitization_tpu.api.config import load_config
    from video_desensitization_tpu.cli.main import build_engine
    from video_desensitization_tpu.pipeline.video_pipeline import (
        process_record_job,
    )
    from video_desensitization_tpu.record.unpack import read_record2h265_all

    from video_desensitization_tpu.record.topics import CAMERA_TOPICS

    if not 1 <= args.cams <= len(CAMERA_TOPICS):
        ap.error(
            f"--cams must be 1..{len(CAMERA_TOPICS)} (the Apollo camera "
            f"topic registry has {len(CAMERA_TOPICS)} topics)"
        )

    root = tempfile.mkdtemp(prefix="vdt_record_bench_")
    try:
        hw = (96, 160) if args.smoke else (1080, 1920)
        input_size = 128 if args.smoke else 640
        dtype = "float32" if args.smoke else "bfloat16"
        t0 = time.perf_counter()
        rec_dir = synthesize_record(root, args.cams, args.frames, hw=hw)
        synth_s = time.perf_counter() - t0

        ini = os.path.join(root, "config.ini")
        with open(ini, "w") as f:
            f.write(
                "[PATHS]\nmodel_path=random\nmodel_weights=random\n"
                f"record_dir={rec_dir}\n"
                f"output_h265_dir={os.path.join(root, 'h265')}\n"
                f"output_videos_dir={os.path.join(root, 'videos')}\n"
                f"temp_directory_base={os.path.join(root, 'tmp')}\n"
                f"record_output_dir={os.path.join(root, 'out')}\n"
                f"[SETTINGS]\nbatch_size={args.batch}\n"
                f"encode_preset={args.preset}\n"
                f"encode_threads={args.encode_threads}\n"
                f"[TPU]\nengine={args.engine}\ninput_size={input_size}\n"
                f"max_detections=16\ndtype={dtype}\noutput_fps=30\n"
                f"transfer={args.transfer}\n"
                f"detect_interval={args.detect_interval}\n"
                f"co_batch={'true' if args.co_batch else 'false'}\n"
            )
        cfg = load_config(ini)

        # Time the unpack stage separately once (it re-runs inside the job;
        # cheap — container parse + stream writes).
        t0 = time.perf_counter()
        read_record2h265_all(cfg.record_dir, os.path.join(root, "h265_probe"))
        unpack_s = time.perf_counter() - t0

        engine = build_engine(cfg, with_plates=True, allow_random=True)
        if args.typical_boxes:
            from benchmarks.synthetic_boxes import override_unpack
            from video_desensitization_tpu.pipeline.throughput import (
                TieredPipeline,
            )

            base = getattr(engine, "base", engine)  # unwrap TrackingEngine
            if not isinstance(base, TieredPipeline):
                ap.error(
                    "--typical-boxes overrides TieredPipeline._unpack; "
                    f"engine resolved to {type(base).__name__} "
                    "(pass --engine tiered)"
                )
            override_unpack(base, hw)
        t0 = time.perf_counter()
        stats = process_record_job(cfg, engine)
        job_s = time.perf_counter() - t0
        total_frames = args.cams * args.frames
        assert stats.frames == total_frames, (stats.frames, total_frames)
        out_record = os.path.join(root, "out", "bench.record")
        assert os.path.exists(out_record), out_record

        print(
            json.dumps(
                {
                    "record_e2e_fps": round(total_frames / job_s, 2),
                    "cams": args.cams,
                    "frames": total_frames,
                    "synth_s": round(synth_s, 1),
                    "job_s": round(job_s, 1),
                    "unpack_s": round(unpack_s, 2),
                    "engine": type(engine).__name__,
                    "transfer": args.transfer,
                    "detect_interval": args.detect_interval,
                    "typical_boxes": args.typical_boxes,
                    "preset": args.preset,
                    "encode_threads": args.encode_threads,
                    "co_batch": args.co_batch,
                    "videos_processed": stats.videos_processed,
                    "faces": stats.faces,
                    "plates": stats.plates,
                }
            )
        )
    finally:
        if args.keep:
            print(f"work dir kept: {root}", file=sys.stderr)
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
