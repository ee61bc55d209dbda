"""Checkpoint conversion: torch RetinaFace state_dicts -> Flax variables.

The reference loads ``Retinaface_resnet50.pth`` via ``torch.load`` +
``load_state_dict`` (reference face.py:50-58). This module maps that
state_dict layout (torchvision resnet50 under ``body.``, Sequential-indexed
conv/BN blocks under ``fpn.``/``ssh*.``, ``{Class,Bbox,Landmark}Head.N.conv1x1``)
onto the Flax module tree defined in models/. Conversion is offline/one-time;
the result is saved with ``flax.serialization`` (msgpack) for fast reload.

Accepts either torch tensors or numpy arrays as values, so it runs in
environments without torch.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

import jax


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv_kernel(v) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)."""
    return _to_numpy(v).transpose(2, 3, 1, 0)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# torch key -> (flax module path, kind) resolution
# ---------------------------------------------------------------------------

_SEQ_BN_IDX = {"1": "bn", "4": "bn"}  # Sequential positions that are BN layers
_SEQ_CONV_IDX = {"0": "conv", "3": "conv"}

_PARAM_KIND = {
    "weight": "weight",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
    "num_batches_tracked": None,  # dropped
}


def _resolve(key: str):
    """Map one torch state_dict key to (flax_path, leaf_kind, is_bn).

    Returns None for keys to drop (num_batches_tracked, classifier heads of
    the backbone that RetinaFace never uses: fc/avgpool).
    """
    parts = key.split(".")
    leaf = parts[-1]
    kind = _PARAM_KIND.get(leaf, "weight")
    if kind is None:
        return None

    # Backbone -------------------------------------------------------------
    if parts[0] == "body":
        rest = parts[1:-1]
        if rest and rest[0] in ("fc", "avgpool", "avg"):
            return None
        if rest == ["conv1"]:
            return ("body", "conv1"), kind, False
        if rest == ["bn1"]:
            return ("body", "bn1"), kind, True
        m = re.fullmatch(r"layer(\d)", rest[0]) if rest else None
        if m:
            block = rest[1]
            sub = rest[2]
            base = ("body", f"layer{m.group(1)}_{block}")
            if sub == "downsample":
                idx = rest[3]
                if idx == "0":
                    return base + ("downsample_conv",), kind, False
                return base + ("downsample_bn",), kind, True
            if sub.startswith("bn"):
                return base + (sub,), kind, True
            return base + (sub,), kind, False
        m = re.fullmatch(r"stage(\d)", rest[0]) if rest else None
        if m:
            si, bi, li = m.group(1), rest[1], rest[2]
            is_bn = li in _SEQ_BN_IDX
            if si == "1" and bi == "0":
                # First conv_bn of stage1 is the stem conv.
                return ("body", "stage1_conv", "bn" if is_bn else "conv"), kind, is_bn
            block = int(bi) - 1 if si == "1" else int(bi)
            half = "dw" if li in ("0", "1") else "pw"
            return (
                ("body", f"stage{si}_{block}", half, "bn" if is_bn else "conv"),
                kind,
                is_bn,
            )
        return None

    # FPN / SSH ------------------------------------------------------------
    if parts[0] == "fpn" or parts[0].startswith("ssh"):
        name, idx = parts[1], parts[2]
        is_bn = idx == "1"
        return (parts[0], name, "bn" if is_bn else "conv"), kind, is_bn

    # Heads ------------------------------------------------------------
    m = re.fullmatch(r"(ClassHead|BboxHead|LandmarkHead)", parts[0])
    if m:
        return (f"{m.group(1)}_{parts[1]}", parts[2]), kind, False
    return None


def convert_retinaface_state_dict(
    state_dict: Mapping[str, Any],
) -> Dict[str, Dict]:
    """Convert a torch RetinaFace state_dict to Flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` matching
    ``models.retinaface.RetinaFace`` (both resnet50 and mobilenet layouts).
    """
    params: Dict = {}
    batch_stats: Dict = {}
    unused = []
    for key, value in state_dict.items():
        k = key[len("module.") :] if key.startswith("module.") else key
        resolved = _resolve(k)
        if resolved is None:
            if not k.endswith("num_batches_tracked"):
                unused.append(k)
            continue
        path, kind, is_bn = resolved
        v = _to_numpy(value).astype(np.float32)
        if is_bn:
            if kind == "weight":
                _set(params, path + ("scale",), v)
            elif kind == "bias":
                _set(params, path + ("bias",), v)
            elif kind == "mean":
                _set(batch_stats, path + ("mean",), v)
            elif kind == "var":
                _set(batch_stats, path + ("var",), v)
        else:
            if kind == "weight":
                _set(params, path + ("kernel",), _conv_kernel(v))
            else:
                _set(params, path + ("bias",), v)
    allowed_unused = {"body.fc.weight", "body.fc.bias"}
    leftover = [u for u in unused if u not in allowed_unused]
    if leftover:
        raise ValueError(f"Unmapped checkpoint keys: {leftover[:10]}")
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# YOLOv8 (ultralytics layout) conversion
# ---------------------------------------------------------------------------

_YOLO_CONVBLOCKS = {"0", "1", "3", "5", "7", "16", "19"}
_YOLO_C2F = {"2", "4", "6", "8", "12", "15", "18", "21"}


def _resolve_yolo(key: str):
    """Map one ultralytics DetectionModel state_dict key to the Flax tree."""
    parts = key.split(".")
    if parts[0] != "model":
        return None
    leaf = parts[-1]
    kind = _PARAM_KIND.get(leaf, "weight")
    if kind is None:
        return None
    idx = parts[1]
    base = f"m{idx}"
    rest = parts[2:-1]

    def convbn(prefix: Tuple[str, ...], sub: str):
        # sub in {conv, bn}
        return prefix + (sub,), kind, sub == "bn"

    if idx in _YOLO_CONVBLOCKS:
        return convbn((base,), rest[0])
    if idx in _YOLO_C2F or idx == "9":  # C2f and SPPF share cv1/cv2 naming
        if rest[0] in ("cv1", "cv2"):
            return convbn((base, rest[0]), rest[1])
        if rest[0] == "m":  # bottlenecks: m.{j}.cv{1,2}.{conv,bn}
            return convbn((base, f"m_{rest[1]}", rest[2]), rest[3])
        return None
    if idx == "22":  # Detect head
        branch, scale = rest[0], rest[1]
        if branch == "dfl":
            return None  # fixed arange projection, re-created in the graph
        pos = rest[2]
        name = f"{branch}_{scale}_{pos}"
        if pos == "2":  # final plain Conv2d with bias
            return (base, name), kind, False
        return convbn((base, name), rest[3])
    return None


def convert_yolo_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """Convert an ultralytics YOLOv8 state_dict to Flax variables for
    ``models.yolo.YoloV8`` (same return layout as the RetinaFace converter)."""
    params: Dict = {}
    batch_stats: Dict = {}
    unmapped = []
    for key, value in state_dict.items():
        k = key[len("module.") :] if key.startswith("module.") else key
        resolved = _resolve_yolo(k)
        if resolved is None:
            if not k.endswith("num_batches_tracked") and ".dfl." not in k:
                unmapped.append(k)
            continue
        path, kind, is_bn = resolved
        v = _to_numpy(value).astype(np.float32)
        if is_bn:
            target, leafname = (
                (params, "scale") if kind == "weight" else
                (params, "bias") if kind == "bias" else
                (batch_stats, "mean") if kind == "mean" else
                (batch_stats, "var")
            )
            _set(target, path + (leafname,), v)
        else:
            if kind == "weight":
                _set(params, path + ("kernel",), _conv_kernel(v))
            else:
                _set(params, path + ("bias",), v)
    if unmapped:
        raise ValueError(f"Unmapped YOLO keys: {unmapped[:10]}")
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a .pth file into a numpy state_dict (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def save_variables(variables: Dict, path: str) -> None:
    """Serialize converted variables to msgpack."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_variables(path: str) -> Dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main(argv: Optional[List[str]] = None) -> int:
    """Offline converter CLI:

        python -m video_desensitization_tpu.models.convert \
            Retinaface_resnet50.pth face.msgpack [--arch retinaface|yolo]

    Converts a torch checkpoint to a Flax msgpack variables file that
    ``Retinaface(model_path=...)`` / ``PlateDetector(model_path=...)`` load
    directly (no torch needed at inference time).
    """
    import argparse

    p = argparse.ArgumentParser(description="torch checkpoint -> Flax msgpack")
    p.add_argument("src", help=".pth/.pt torch checkpoint")
    p.add_argument("dst", help="output .msgpack path")
    p.add_argument(
        "--arch", choices=("retinaface", "yolo"), default="retinaface"
    )
    args = p.parse_args(argv)

    state = load_torch_checkpoint(args.src)
    if args.arch == "retinaface":
        variables = convert_retinaface_state_dict(state)
    else:
        variables = convert_yolo_state_dict(state)
    save_variables(variables, args.dst)
    n = sum(v.size for v in jax.tree.leaves(variables))
    print(f"wrote {args.dst}: {n:,} parameters")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main(sys.argv[1:]))
