"""Face-detector backbone comparison on the chip: resnet50 vs mobilenet0.25.

The reference ships two RetinaFace backbones (`backbone="resnet50"` default,
`"mobilenet"` alternative — detect_face/face.py:35, nets/mobilenet025.py).
Both are implemented and activation-parity-tested here (tests/test_models.py);
this harness gives each a chip-side rate so deployments can pick on numbers:
the full single-detector program (device letterbox -> forward -> decode ->
NMS -> correction), device-resident 1080p frames, pipelined at batch N.

    python benchmarks/backbone_bench.py [--batch 128] [--iters 4]

Prints one JSON line per backbone:
    {"backbone": "...", "device_fps": N, "flops_per_frame": N, "mfu": N}
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(1080, 1920))
    ap.add_argument(
        "--input-size", type=int, default=640, help="detector input (square)"
    )
    ap.add_argument(
        "--cpu", action="store_true", help="smoke-test on the CPU backend"
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from video_desensitization_tpu.detect.face import Retinaface

    fh, fw = args.frame_hw
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (args.batch, fh, fw, 3), dtype=np.uint8)
    )
    shapes = jnp.asarray(
        np.tile(np.array([[float(fh), float(fw)]], np.float32), (args.batch, 1))
    )
    peak = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16

    for backbone in ("resnet50", "mobilenet"):
        face = Retinaface(
            model_path=None,
            backbone=backbone,
            input_shape=[args.input_size, args.input_size, 3],
            confidence=0.5,
            nms_iou=0.4,
            max_detections=16,
            dtype=jnp.float32 if args.cpu else jnp.bfloat16,
        )
        prog = jax.jit(face._detect_program)
        out = prog(face.variables, frames, shapes)
        np.asarray(out[2][:1])  # compile + warm
        t0 = time.perf_counter()
        outs = [prog(face.variables, frames, shapes) for _ in range(args.iters)]
        for o in outs:  # one sync after all dispatches queued
            np.asarray(o[2][:1])
        fps = args.iters * args.batch / (time.perf_counter() - t0)

        flops = mfu = None
        try:
            cost = prog.lower(face.variables, frames, shapes).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost["flops"]) / args.batch
            mfu = fps * flops / peak
        except Exception:  # noqa: BLE001  cost model unavailable off-TPU
            pass
        print(
            json.dumps(
                {
                    "backbone": backbone,
                    "device_fps": round(fps, 2),
                    "batch": args.batch,
                    "flops_per_frame": flops,
                    "mfu": round(mfu, 4) if mfu is not None else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
