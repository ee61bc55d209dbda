"""mAP evaluation harness — the ``get_map_txt`` consumer the reference implies.

The reference exports per-image detection lines for offline mAP tooling
(``Retinaface.get_map_txt``, /root/reference/detect_face/face.py:185-230) but
ships no evaluator. This module completes the loop:

* ``load_wider_annotations`` — parser for the WIDER FACE annotation format
  (``<path>\\n<n>\\n<x y w h ...>*n``), the dataset RetinaFace checkpoints are
  trained/evaluated on, so real weights can be scored the moment they land.
* ``average_precision`` — single-class VOC-style AP at an IoU threshold
  (greedy score-ordered matching, each GT consumed once, continuous AP).
* ``evaluate_detector`` — runs ``detector.get_map_txt(image)`` over a
  labeled set and reports AP/precision/recall. Works for the face detector
  and (``--detector plate``) the YOLOv8 plate detector — both expose
  ``get_map_txt`` returning (M, >=5) [x1, y1, x2, y2, score, ...] rows.

CLI:
    python benchmarks/map_eval.py <wider_val.txt> <images_root> \
        [--ckpt face.msgpack] [--detector face|plate] [--limit N] [--iou 0.5]

Synthetic self-validation (no dataset needed):
    python benchmarks/map_eval.py --selftest
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, List, Sequence, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdt_jax_cache")

import numpy as np


def load_wider_annotations(txt_path: str) -> Dict[str, np.ndarray]:
    """Parse WIDER FACE ground truth: {relative_image_path: (N, 4) xyxy}."""
    gts: Dict[str, np.ndarray] = {}
    with open(txt_path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 0
    while i < len(lines):
        path = lines[i].strip()
        i += 1
        if not path:
            continue
        try:
            n = int(lines[i].strip())
        except (IndexError, ValueError) as e:
            raise ValueError(
                f"{txt_path}:{i + 1}: expected a box count after image "
                f"entry {path!r} (truncated or malformed annotation file)"
            ) from e
        i += 1
        boxes = []
        if n == 0:
            # WIDER quirk: n == 0 entries still carry one all-zero box line
            # (but don't eat the next image path if a writer omitted it).
            if i < len(lines):
                toks = lines[i].split()
                if len(toks) >= 4 and all(
                    t.replace(".", "", 1).replace("-", "", 1).isdigit()
                    for t in toks[:4]
                ):
                    i += 1
        for k in range(n):
            try:
                vals = lines[i].split()
                x, y, w, h = (float(v) for v in vals[:4])
            except (IndexError, ValueError) as e:
                raise ValueError(
                    f"{txt_path}:{i + 1}: expected box {k + 1}/{n} for image "
                    f"{path!r} (truncated or malformed annotation file)"
                ) from e
            i += 1
            if w > 0 and h > 0:
                boxes.append([x, y, x + w, y + h])
        gts[path] = np.asarray(boxes, np.float64).reshape(-1, 4)
    return gts


def _iou_matrix(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """(M, 4) x (N, 4) xyxy -> (M, N) IoU."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a = np.clip(dets[:, 2] - dets[:, 0], 0, None) * np.clip(
        dets[:, 3] - dets[:, 1], 0, None
    )
    b = np.clip(gts[:, 2] - gts[:, 0], 0, None) * np.clip(
        gts[:, 3] - gts[:, 1], 0, None
    )
    return inter / np.maximum(a[:, None] + b[None, :] - inter, 1e-12)


def average_precision(
    detections: Dict[str, np.ndarray],
    ground_truth: Dict[str, np.ndarray],
    iou_threshold: float = 0.5,
) -> Dict[str, float]:
    """Single-class AP: detections {img: (M, 5) [x1,y1,x2,y2,score]} vs
    ground_truth {img: (N, 4)}. Greedy match in global score order; each GT
    matches at most one detection; AP is the area under the exact
    precision-recall curve (continuous, VOC-2010 style)."""
    n_gt = sum(len(g) for g in ground_truth.values())
    # Score-ordered TP/FP assignment.
    order = sorted(
        (
            (float(d[4]), img, tuple(map(float, d[:4])))
            for img, dets in detections.items()
            for d in np.asarray(dets).reshape(-1, 5)
        ),
        key=lambda r: -r[0],
    )
    matched: Dict[str, set] = {img: set() for img in ground_truth}
    tp = np.zeros(len(order))
    fp = np.zeros(len(order))
    for k, (_score, img, box) in enumerate(order):
        gts = ground_truth.get(img, np.zeros((0, 4)))
        if len(gts) == 0:
            fp[k] = 1
            continue
        ious = _iou_matrix(np.asarray(box, np.float64)[None], gts)[0]
        ious[list(matched[img])] = -1.0  # consumed GTs can't re-match
        j = int(np.argmax(ious))
        if ious[j] >= iou_threshold:
            matched[img].add(j)
            tp[k] = 1
        else:
            fp[k] = 1
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / max(n_gt, 1)
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    # Exact area under the (monotonized) PR curve.
    mrec = np.concatenate([[0.0], recall, [recall[-1] if len(recall) else 0.0]])
    mpre = np.concatenate([[1.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    ap = float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
    return {
        "ap": ap,
        "precision": float(precision[-1]) if len(precision) else 0.0,
        "recall": float(recall[-1]) if len(recall) else 0.0,
        "n_gt": n_gt,
        "n_det": len(order),
    }


def evaluate_detector(
    detector,
    image_paths: Sequence[str],
    ground_truth: Dict[str, np.ndarray],
    keys: Sequence[str],
    iou_threshold: float = 0.5,
) -> Dict[str, float]:
    """Run detector.get_map_txt over images and score against ground truth."""
    import cv2

    detections: Dict[str, np.ndarray] = {}
    for path, key in zip(image_paths, keys):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        # (M, 15) for faces (xyxy, score, landmarks); (M, 6) for plates.
        dets = detector.get_map_txt(img)
        detections[key] = dets[:, :5] if len(dets) else np.zeros((0, 5))
    return average_precision(detections, ground_truth, iou_threshold)


def _selftest() -> Dict[str, float]:
    """Validate the AP math on hand-checkable synthetic cases."""
    gt = {
        "a": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
        "b": np.array([[5, 5, 15, 15]], float),
    }
    # Perfect detector -> AP 1.0.
    perfect = {
        k: np.concatenate([v, np.ones((len(v), 1))], 1) for k, v in gt.items()
    }
    r1 = average_precision(perfect, gt)
    assert abs(r1["ap"] - 1.0) < 1e-9, r1
    # One of three GTs missed, one false positive ranked below the TPs:
    # PR points: (1/3,1), (2/3,1), (2/3,2/3) -> AP = 2/3.
    partial = {
        "a": np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.1]]),
        "b": np.array([[5, 5, 15, 15, 0.8]]),
    }
    r2 = average_precision(partial, gt)
    assert abs(r2["ap"] - 2 / 3) < 1e-9, r2
    # Empty detections -> AP 0.
    r3 = average_precision({"a": np.zeros((0, 5)), "b": np.zeros((0, 5))}, gt)
    assert r3["ap"] == 0.0
    out = {"selftest": "ok", "perfect_ap": r1["ap"], "partial_ap": r2["ap"]}
    print(json.dumps(out))
    return out


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="RetinaFace mAP over WIDER-format labels")
    p.add_argument("annotations", nargs="?", help="WIDER-format label txt")
    p.add_argument("images_root", nargs="?", help="image directory root")
    p.add_argument("--ckpt", default=None, help="face checkpoint (.pth/.msgpack)")
    p.add_argument("--limit", type=int, default=0, help="evaluate first N images")
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--confidence", type=float, default=0.02)
    p.add_argument("--detector", choices=["face", "plate"], default="face")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args(argv)

    if args.selftest:
        _selftest()
        return 0
    if not args.annotations or not args.images_root:
        p.error("annotations and images_root required (or --selftest)")

    import jax.numpy as jnp

    gts = load_wider_annotations(args.annotations)
    keys = sorted(gts)
    if args.limit:
        keys = keys[: args.limit]
    paths = [os.path.join(args.images_root, k) for k in keys]
    if args.detector == "face":
        from video_desensitization_tpu.detect.face import Retinaface

        det = Retinaface(
            model_path=args.ckpt,
            backbone="resnet50",
            input_shape=[640, 640, 3],
            confidence=args.confidence,  # low threshold: AP needs the curve
            nms_iou=0.4,
            max_detections=512,
            dtype=jnp.bfloat16,
        )
    else:
        from video_desensitization_tpu.detect.plate import PlateDetector

        det = PlateDetector(
            model_path=args.ckpt,
            confidence=args.confidence,
            input_shape=(640, 640),
            max_detections=512,
            dtype=jnp.bfloat16,
        )
    result = evaluate_detector(
        det, paths, {k: gts[k] for k in keys}, keys, args.iou
    )
    result["metric"] = f"{'retinaface' if args.detector == 'face' else 'plate_yolov8'}_ap@{args.iou}"
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
