"""Round-5 record-job hardware matrix -> benchmarks/record_e2e_r5.jsonl.

Drives ``benchmarks/record_e2e_bench.py`` through every round-5 config in
ONE process so the ~7 min TPU backend init is paid once (verify-skill
pattern). Each config appends the harness's JSON line, tagged with a
``config`` label, to the artifact the docs quote.

    python benchmarks/record_matrix_r5.py [--out benchmarks/record_e2e_r5.jsonl]

The matrix (4 cams x 48 frames, 1080p, batch 32):
  - detect-interval 1 vs 4 at reference parity (medium preset, rgb) —
    the headline record-job pair;
  - the same pair at the production-realistic synthetic box load
    (--typical-boxes: 3 face + 1 plate drifting boxes; random-init makes
    everything else a worst-case ~24-giant-box host-blur load);
  - an ultrafast-preset pair (encode tail mostly removed, so the
    detection/tracking knob is visible);
  - a yuv420-transport point and an encode-threads point.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdt_jax_cache")

MATRIX = [
    # (label, extra argv)
    ("i1_medium", ["--detect-interval", "1", "--preset", "medium"]),
    ("i4_medium", ["--detect-interval", "4", "--preset", "medium"]),
    (
        "i1_medium_typical",
        ["--detect-interval", "1", "--preset", "medium", "--typical-boxes",
         "--engine", "tiered"],
    ),
    (
        "i4_medium_typical",
        ["--detect-interval", "4", "--preset", "medium", "--typical-boxes",
         "--engine", "tiered"],
    ),
    ("i1_ultrafast", ["--detect-interval", "1", "--preset", "ultrafast"]),
    (
        "i4_ultrafast_typical",
        ["--detect-interval", "4", "--preset", "ultrafast", "--typical-boxes",
         "--engine", "tiered"],
    ),
    (
        "i1_ultrafast_yuv420",
        ["--detect-interval", "1", "--preset", "ultrafast",
         "--transfer", "yuv420"],
    ),
    (
        "i4_medium_typical_threads2",
        ["--detect-interval", "4", "--preset", "medium", "--typical-boxes",
         "--engine", "tiered", "--encode-threads", "2"],
    ),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "record_e2e_r5.jsonl"))
    ap.add_argument("--smoke", action="store_true",
                    help="run the matrix at CPU smoke shapes (contract check)")
    ap.add_argument("--only", default=None,
                    help="comma-separated config labels to run")
    args = ap.parse_args()

    import benchmarks.record_e2e_bench as bench

    only = set(args.only.split(",")) if args.only else None
    for label, extra in MATRIX:
        if only and label not in only:
            continue
        argv = ["record_e2e_bench.py", "--cams", "4", "--frames", "48",
                "--batch", "32", *extra]
        if args.smoke:
            argv.append("--smoke")
        sys.argv = argv
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with contextlib.redirect_stdout(buf):
                bench.main()
        except SystemExit as e:  # argparse .error inside a config
            print(f"[{label}] FAILED rc={e.code}: {buf.getvalue()!r}",
                  file=sys.stderr)
            continue
        line = buf.getvalue().strip().splitlines()[-1]
        row = json.loads(line)
        row["config"] = label
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[{label}] {json.dumps(row)}", flush=True)


if __name__ == "__main__":
    main()
