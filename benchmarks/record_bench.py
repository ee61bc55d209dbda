"""Record-layer throughput benchmark: write / read / unpack MB/s.

The reference handles the record container inside closed-source native
modules (``foreign/recordDeal.so``; reference combine_detect.py:839,958) and
publishes no numbers for them. This harness establishes ours: it synthesizes
a 12-camera record of configurable size with HEVC-shaped payloads (valid
Annex-B access units so keyframe gating runs its real code path), then times

* record WRITE (RecordWriter, per compression mode),
* raw message iteration (RecordReader.read_messages),
* full UNPACK (read_record2h265_all: gating + 12 concurrent topic sinks).

Usage:  python benchmarks/record_bench.py [--mb 128] [--modes none,lz4]
Prints one JSON line per (mode, stage) plus a summary line.

Pure host-path benchmark: no jax, no TPU, safe to run alongside device work.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_desensitization_tpu.record.proto import cyber_record_pb2 as rp
from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
from video_desensitization_tpu.record.reader import RecordReader
from video_desensitization_tpu.record.topics import CAMERA_TOPICS, COMPRESSED_IMAGE_TYPE
from video_desensitization_tpu.record.unpack import read_record2h265_all
from video_desensitization_tpu.record.writer import RecordWriter

MODES = {"none": rp.COMPRESS_NONE, "lz4": rp.COMPRESS_LZ4, "bz2": rp.COMPRESS_BZ2}

# One HEVC-shaped access unit: 4-byte start code + IDR_W_RADL NAL header
# (type 19 -> first byte 19<<1) so video/nal.py's keyframe gate fires on the
# first message of every topic, exactly like a real stream's first IDR.
IDR_HEADER = b"\x00\x00\x00\x01" + bytes([19 << 1, 0x01])
TRAIL_HEADER = b"\x00\x00\x00\x01" + bytes([1 << 1, 0x01])  # TRAIL_R


def _payload(rng, size: int, key: bool) -> bytes:
    head = IDR_HEADER if key else TRAIL_HEADER
    return head + rng.integers(0, 255, size - len(head), dtype=np.uint8).tobytes()


def synthesize(path: str, total_mb: float, mode: int, frame_kb: int = 384) -> float:
    """Write a 12-topic record of ~total_mb payload bytes; returns MB written."""
    rng = np.random.default_rng(0)
    per_msg = frame_kb * 1024
    n_msgs = max(1, round(total_mb * 1e6 / (per_msg * len(CAMERA_TOPICS))))
    written = 0
    with RecordWriter(path, compress=mode) as w:
        for t in CAMERA_TOPICS:
            w.write_channel(t, COMPRESSED_IMAGE_TYPE)
        for i in range(n_msgs):
            for t in CAMERA_TOPICS:
                img = sp.CompressedImage(
                    format="h265/video",
                    data=_payload(rng, per_msg, key=(i % 30 == 0)),
                    measurement_time=i / 30.0,
                )
                img.header.sequence_num = i
                w.write_message(t, img, 1_000_000_000 + i * 33_000_000)
                written += per_msg
    return written / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=128.0, help="payload MB to synthesize")
    ap.add_argument("--modes", default="none,lz4", help="csv of none,lz4,bz2")
    ap.add_argument("--frame-kb", type=int, default=384)
    args = ap.parse_args()

    results = {}
    for mode_name in args.modes.split(","):
        mode = MODES[mode_name.strip()]
        work = tempfile.mkdtemp(prefix=f"record_bench_{mode_name}_")
        try:
            rec_dir = os.path.join(work, "records")
            out_dir = os.path.join(work, "out")
            os.makedirs(rec_dir)
            path = os.path.join(rec_dir, "bench.record")

            t0 = time.perf_counter()
            mb = synthesize(path, args.mb, mode, frame_kb=args.frame_kb)
            write_s = time.perf_counter() - t0
            file_mb = os.path.getsize(path) / 1e6

            # Warm the page cache first: the cold pass measures the disk,
            # not the reader (observed 10x swings right after writing).
            n = sum(1 for _ in RecordReader(path).read_messages())
            t0 = time.perf_counter()
            n = sum(1 for _ in RecordReader(path).read_messages())
            read_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            out = read_record2h265_all(rec_dir, out_dir, use_tmp_copy=False)
            unpack_s = time.perf_counter() - t0
            assert len(out) == len(CAMERA_TOPICS), "unpack lost topics"

            row = {
                "mode": mode_name,
                "payload_mb": round(mb, 1),
                "file_mb": round(file_mb, 1),
                "write_mb_s": round(mb / write_s, 1),
                "read_mb_s": round(mb / read_s, 1),
                "unpack_mb_s": round(mb / unpack_s, 1),
                "messages": n,
            }
            results[mode_name] = row
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "record_layer_mb_s", "results": results}))


if __name__ == "__main__":
    main()
