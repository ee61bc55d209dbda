"""Deterministic production-realistic detection loads for benchmarks.

Random-init weights (no checkpoints ship in this environment) make every
uncapped benchmark a WORST-CASE box load: ~50% of anchors pass conf 0.5,
and the surviving boxes are quarter-frame-sized. Structural top-k caps
(``max_detections``) fix the box COUNT but not the SIZE, so host-blur and
tracker costs still measure mosaic saturation instead of production work.

This module is the shared fix: :func:`synthesize` emits the output a real
detector would — 3 face-sized (90x110 px at 1080p, the near-field face of
``benchmarks/tracking_coverage.py``) + 1 plate-sized (140x45) boxes
drifting a few px per frame — in the packed-unpack layout of
``pipeline/throughput.TieredPipeline._unpack``. Benchmarks OVERRIDE the
unpack step with it (``bench.py`` ``_RealisticBoxPipeline``,
``record_e2e_bench.py --typical-boxes``): the full device program still
runs and is timed; only the boxes the host blurs and the tracker
propagates change. Wrap-around at the frame edge = an exit plus a fresh
entry, so interval trackers see realistic appear/disappear events.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def synthesize(
    b: int,
    t0: int,
    frame_hw: Tuple[int, int],
    face_k: int,
    plate_k: int,
) -> tuple:
    """Boxes for ``b`` consecutive frames starting at motion-clock ``t0``.

    Returns ``(face_px, face_keep, plate_px, plate_keep)`` shaped
    ``(b, face_k, 15) / (b, face_k) / (b, plate_k, 6) / (b, plate_k)`` —
    the exact tuple layout ``TieredPipeline._unpack`` produces.
    """
    h, w = frame_hw
    s = h / 1080.0
    fw, fh = 90.0 * s, 110.0 * s
    pw, ph = 140.0 * s, 45.0 * s
    fpx = np.zeros((b, face_k, 15), np.float32)
    fkeep = np.zeros((b, face_k), bool)
    ppx = np.zeros((b, plate_k, 6), np.float32)
    pkeep = np.zeros((b, plate_k), bool)
    t = t0 + np.arange(b, dtype=np.float64)
    for k in range(min(3, face_k)):
        x = (s * (120.0 + 500.0 * k + 6.5 * t)) % (w - fw)
        y = (s * (80.0 + 260.0 * k + 2.2 * t)) % (h - fh)
        fpx[:, k, 0], fpx[:, k, 1] = x, y
        fpx[:, k, 2], fpx[:, k, 3] = x + fw, y + fh
        fkeep[:, k] = True
    if plate_k >= 1:
        x = (s * (300.0 + 4.0 * t)) % (w - pw)
        y = (s * (700.0 + 1.1 * t)) % (h - ph)
        ppx[:, 0, 0], ppx[:, 0, 1] = x, y
        ppx[:, 0, 2], ppx[:, 0, 3] = x + pw, y + ph
        pkeep[:, 0] = True
    return fpx, fkeep, ppx, pkeep


def override_unpack(pipe, frame_hw: Tuple[int, int]) -> None:
    """Rebind a TieredPipeline's ``_unpack`` to the synthetic detector.

    The device program (and its dispatch/readback) is untouched; only the
    unpacked host-side detections change. One motion clock per pipeline:
    consecutive unpacked frames advance it, so interval trackers see
    coherent motion across keyframes.
    """
    state = {"t": 0}

    def unpack(flat):
        b = flat.shape[0]
        kf = pipe.face.max_detections
        kp = pipe.plate.max_detections if pipe.plate is not None else 1
        out = synthesize(b, state["t"], frame_hw, kf, kp)
        state["t"] += b
        return out

    pipe._unpack = unpack
