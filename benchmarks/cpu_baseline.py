"""Reference-equivalent CPU path benchmark (the vs_baseline denominator).

The reference publishes no numbers (BASELINE.md), so we establish the
baseline by measuring its processing structure on CPU. Two engines:

* ``--engine torch`` (DEFAULT, the honest denominator): the reference's own
  stack — per-frame cv2 letterbox, a torch float32 RetinaFace-ResNet50
  forward (the in-env torch oracle reproducing the reference architecture,
  reference detect_face/retinaface.py:53-148), numpy decode + threshold,
  sequential cv2 mosaic — i.e. combine_detect.py's hot loop
  (combine_detect.py:204-263) minus GPU.
* ``--engine jax-cpu``: the same stage layout with the forward on the JAX
  CPU backend (the round-1/2 denominator, kept for comparability).

Run standalone:

    JAX_PLATFORMS=cpu python benchmarks/cpu_baseline.py [n_frames] [--engine torch]

Prints one JSON line {"cpu_fps": ..., "n_frames": N, "per_frame_s": {...}}
with per-frame mean/std/min/max so the denominator's variance is on record.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# This environment may pre-import jax with a TPU plugin before the env var is
# read; force the CPU backend through config (same trick as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")


def _torch_forward():
    """The reference's own forward: torch f32 RetinaFace-ResNet50 (oracle
    re-creation of the reference architecture, single-threaded like the
    reference's default CPU deployment on this 1-core host)."""
    import torch

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
    )
    from torch_oracle import TRetinaFaceOracle

    torch.manual_seed(0)
    net = TRetinaFaceOracle().eval()

    def fwd(x_np):  # (1, 640, 640, 3) float32 -> (loc, conf, landm) numpy
        with torch.no_grad():
            t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
            loc, conf, landm = net(t)
        return loc.numpy(), conf.numpy(), landm.numpy()

    return fwd


def _jax_cpu_forward():
    import jax.numpy as jnp

    from video_desensitization_tpu.models.configs import cfg_re50
    from video_desensitization_tpu.models.retinaface import RetinaFace

    model = RetinaFace(cfg=cfg_re50, mode="eval", dtype=jnp.float32)
    dummy = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy)
    jitted = jax.jit(lambda v, x: model.apply(v, x))
    jax.block_until_ready(jitted(variables, dummy))  # warmup/compile

    def fwd(x_np):
        loc, conf, landm = jax.block_until_ready(
            jitted(variables, jnp.asarray(x_np))
        )
        return np.asarray(loc), np.asarray(conf), np.asarray(landm)

    return fwd


def main(n_frames: int = 20, engine: str = "torch"):
    from video_desensitization_tpu.ops.anchors import generate_anchors
    from video_desensitization_tpu.ops.image import letterbox_host
    from video_desensitization_tpu.ops.mosaic import mosaic_host_reference

    rng = np.random.default_rng(0)
    anchors = generate_anchors((640, 640))
    fwd = _torch_forward() if engine == "torch" else _jax_cpu_forward()

    frames = [
        rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    per_frame = []
    for f in frames:
        t0 = time.time()
        x = letterbox_host(f, (640, 640)).astype(np.float32)
        x -= np.array((104, 117, 123), np.float32)
        loc, conf, landm = fwd(x[None])
        # host postprocess (numpy decode + threshold; random weights -> few dets)
        loc = np.asarray(loc)[0]
        conf = np.asarray(conf)[0]
        centers = anchors[:, :2] + loc[:, :2] * 0.1 * anchors[:, 2:]
        wh = anchors[:, 2:] * np.exp(loc[:, 2:] * 0.2)
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
        keep = conf[:, 1] >= 0.5
        boxes = (boxes[keep] * [1920, 1080, 1920, 1080]).astype(int)[:8]
        mosaic_host_reference(f, boxes.tolist())
        per_frame.append(time.time() - t0)
    per_frame = np.asarray(per_frame)
    return {
        "cpu_fps": round(n_frames / float(per_frame.sum()), 4),
        "engine": engine,
        "n_frames": n_frames,
        "per_frame_s": {
            "mean": round(float(per_frame.mean()), 4),
            "std": round(float(per_frame.std()), 4),
            "min": round(float(per_frame.min()), 4),
            "max": round(float(per_frame.max()), 4),
        },
    }


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("n_frames", nargs="?", type=int, default=20)
    p.add_argument("--engine", choices=("torch", "jax-cpu"), default="torch")
    a = p.parse_args()
    print(json.dumps(main(a.n_frames, a.engine)))
