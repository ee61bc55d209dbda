"""Tiered-pipeline stage decomposition: where each millisecond of an e2e
batch cycle goes on THIS host/link/chip.

    python benchmarks/stage_breakdown.py          # one JSON line

Measures each stage in isolation at the bench geometry (1080p, batch
BENCH_BATCH=32, yuv420 transfer):

  letterbox_ms  host cv2 resize + I420 pack (threadpooled, per batch)
  h2d_ms        content + aux transfer to HBM (one sync)
  program_ms    the fused two-detector program on device-resident input,
                including the packed-output fetch (one round trip)
  mosaic_ms     host reference mosaic at a representative box count
  cycle_ms      sum — the serial floor; the pipelined e2e overlaps stages,
                so measured e2e should sit between max(stage) and the sum.
                Comparing bench.py's windows against these numbers tells you
                whether the gap is link weather (h2d_ms inflated), host CPU
                (letterbox/mosaic), or scheduling (none inflated, e2e slow).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdt_jax_cache")

import numpy as np


def _best(fn, reps):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000.0, float(np.median(ts)) * 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.detect.plate import PlateDetector
    from video_desensitization_tpu.ops.image import letterbox_geometry
    from video_desensitization_tpu.ops.mosaic import mosaic_host_inplace
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    face = Retinaface(
        model_path=None, backbone="resnet50", input_shape=[640, 640, 3],
        confidence=0.5, nms_iou=0.4, max_detections=16, dtype=jnp.bfloat16,
    )
    plate = PlateDetector(
        model_path=None, variant="n", confidence=0.5, input_shape=(640, 640),
        max_detections=8, dtype=jnp.bfloat16,
    )
    pipe = TieredPipeline(
        face, plate, mosaic_level=8,
        transfer=os.environ.get("BENCH_TRANSFER", "yuv420"),
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, 1080, 1920, 3), dtype=np.uint8)
    shapes = np.tile(np.array([[1080.0, 1920.0]], np.float32), (batch, 1))
    geom = letterbox_geometry(shapes, pipe.input_hw)
    aux_np = np.concatenate([shapes, np.asarray(geom, np.float32)], axis=1)

    lb = pipe.letterbox_batch(frames)
    letterbox_ms = _best(lambda: pipe.letterbox_batch(frames), reps)

    def h2d():
        a = jnp.asarray(lb)
        b = jnp.asarray(aux_np)
        # ONE sync depending on both transfers — two separate fetches would
        # serialize two link round trips and inflate h2d_ms by ~1 RTT.
        joint = a.ravel()[:1].astype(jnp.float32) + b.ravel()[:1]
        np.asarray(joint)

    h2d_ms = _best(h2d, reps)

    lb_dev = jnp.asarray(lb)
    aux_dev = jnp.asarray(aux_np)
    plate_vars = plate.variables

    def program():
        out = pipe._program(face.variables, plate_vars, lb_dev, aux_dev)
        np.asarray(out)  # the real pipeline fetches the full packed output

    program_ms = _best(program, reps)

    boxes = [[100 + 30 * i, 200, 160 + 30 * i, 260] for i in range(8)]
    out_buf = np.empty_like(frames)

    def mosaic_stage():
        def one(i):
            np.copyto(out_buf[i], frames[i])
            mosaic_host_inplace(out_buf[i], boxes, 8)
        list(pipe._pool.map(one, range(batch)))

    mosaic_ms = _best(mosaic_stage, reps)

    cycle = letterbox_ms[1] + h2d_ms[1] + program_ms[1] + mosaic_ms[1]
    print(
        json.dumps(
            {
                "batch": batch,
                "letterbox_ms": round(letterbox_ms[1], 1),
                "h2d_ms": round(h2d_ms[1], 1),
                "program_ms": round(program_ms[1], 1),
                "mosaic_ms": round(mosaic_ms[1], 1),
                "cycle_ms": round(cycle, 1),
                "serial_floor_fps": round(batch / (cycle / 1000.0), 1),
                "best": {
                    "letterbox_ms": round(letterbox_ms[0], 1),
                    "h2d_ms": round(h2d_ms[0], 1),
                    "program_ms": round(program_ms[0], 1),
                    "mosaic_ms": round(mosaic_ms[0], 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
