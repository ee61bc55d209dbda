"""Image preprocessing: letterbox resize and mean subtraction.

Parity targets (``/root/reference/detect_face/utils/utils.py:8-29``):
``letterbox_image`` = aspect-preserving bilinear resize to fit, centered on a
gray-128 canvas; ``preprocess_input`` = subtract mean (104, 117, 123) in the
channel order of the input array (the reference applies this BGR-trained mean
directly to RGB-loaded frames — we reproduce the arithmetic for checkpoint
parity; see combine_detect.py:167-174 + utils.py:27-29).

Two implementations:

* ``letterbox_host`` — numpy + cv2, bit-matching the reference (used for
  golden tests and host-side tooling).
* ``letterbox_device`` — pure JAX, runs inside the jitted detection program on
  uint8 NHWC batches. Uses ``jax.image.resize`` with half-pixel-centered
  linear interpolation (same convention as cv2.INTER_LINEAR), padding with
  128. Resize + pad + mean-sub + dtype cast all fuse into the device program,
  so raw uint8 frames are the only host->HBM traffic.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

BGR_MEAN = (104.0, 117.0, 123.0)
PAD_VALUE = 128.0


def letterbox_params(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    """Static letterbox geometry: (new_h, new_w, top, left).

    scale = min(dst_w/src_w, dst_h/src_h); new dims truncate like the
    reference's int(iw*scale); offsets are the centered integer placement.
    """
    ih, iw = src_hw
    h, w = dst_hw
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    top, left = (h - nh) // 2, (w - nw) // 2
    return nh, nw, top, left


def letterbox_geometry(image_shapes, dst_hw: Tuple[int, int]) -> np.ndarray:
    """Host-exact per-image letterbox geometry for a batch.

    image_shapes: (B, 2) [orig_h, orig_w] -> (B, 4) float32
    [nh, nw, top, left] via ``letterbox_params`` (float64/int arithmetic).
    Device programs take this as an input instead of re-deriving it in
    float32, which can disagree with the host placement by one pixel for
    some source heights (e.g. 1077-tall at 640: host nh=639, f32 floor 640).
    """
    shapes = np.asarray(image_shapes)
    out = np.empty((shapes.shape[0], 4), np.float32)
    for i, (ih, iw) in enumerate(shapes):
        out[i] = letterbox_params((int(ih), int(iw)), dst_hw)
    return out


def letterbox_host(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Reference-exact letterbox. ``size`` is (width, height) like the reference.

    Returns float64 (h, w, 3) canvas (the reference builds np.ones()*128).
    """
    import cv2

    ih, iw = image.shape[:2]
    w, h = size
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    resized = cv2.resize(image, (nw, nh))
    canvas = np.ones([h, w, 3]) * PAD_VALUE
    canvas[top : top + nh, left : left + nw] = resized
    return canvas


def preprocess_input(image: Array) -> Array:
    """Subtract the detector training mean, preserving input channel order."""
    return image - jnp.asarray(BGR_MEAN, dtype=image.dtype)


def letterbox_device(
    frames: Array, dst_hw: Tuple[int, int], pad_value: float = PAD_VALUE
) -> Array:
    """Letterbox an NHWC batch on device.

    frames: (B, H, W, 3) any real dtype (uint8 ok). Returns float32
    (B, dst_h, dst_w, 3). The source spatial shape is static under jit, so the
    scaled geometry is resolved at trace time and XLA sees a fixed
    resize + pad program.
    """
    b, ih, iw, c = frames.shape
    h, w = dst_hw
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    x = frames.astype(jnp.float32)
    resized = jax.image.resize(x, (b, nh, nw, c), method="linear", antialias=False)
    return jnp.pad(
        resized,
        ((0, 0), (top, h - nh - top), (left, w - nw - left), (0, 0)),
        constant_values=pad_value,
    )


def preprocess_batch_device(
    frames: Array, input_hw: Tuple[int, int], dtype=jnp.float32
) -> Array:
    """uint8 NHWC frames -> letterboxed, mean-subtracted model input batch."""
    x = letterbox_device(frames, input_hw)
    x = preprocess_input(x)
    return x.astype(dtype)
