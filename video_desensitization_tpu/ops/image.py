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


# ---------------------------------------------------------------------------
# Bit-exact cv2 INTER_LINEAR resize on device (fixed-point reconstruction)
# ---------------------------------------------------------------------------
#
# cv2.resize(u8, INTER_LINEAR) is NOT float bilinear: coefficients are
# short fixed-point (scaled by 2^11 = 2048, saturate_cast with
# round-half-even), the horizontal pass accumulates u8*short exactly in
# int32, and the vertical pass combines two int32 rows with a single final
# rounding. Reconstructing that integer pipeline on device makes the fused
# path's letterbox bitwise-identical to the host/reference path
# (reference detect_face/utils/utils.py:8-18), closing the 0.7-1.3% recall
# gap recall_parity.py attributes to jax.image.resize.
#
# The vertical rounding has two variants in the wild (OpenCV scalar vs
# universal-intrinsics SIMD kernels); ``cv2_resize_formula`` detects which
# one THIS build of cv2 uses by directly comparing both reconstructions
# against cv2.resize on random images, once per geometry (cached).

_INTER_BITS = 11  # OpenCV INTER_RESIZE_COEF_BITS
_INTER_SCALE = 1 << _INTER_BITS  # 2048


def cv2_linear_axis_tables(src: int, dst: int):
    """Per-axis cv2 INTER_LINEAR sampling tables: (i0, i1, a0, a1).

    Mirrors OpenCV's coefficient computation exactly: the source coordinate
    is computed in double then cast to float32 (``fxx = (float)((dx+0.5)*
    scale - 0.5)``), and the short coefficients are round-half-even of the
    float32 coefficient*2048. Border handling matches resizeGeneric_: cv2
    clamps the tap INDICES into range but keeps the unclamped fractional
    weights — an upscale's first output row reads row 0 twice with split
    weights (e.g. 448 + 1600), which under the SIMD formula's per-tap
    truncation rounds differently than one 2048-weight tap. (Downscale
    geometries never clamp: (0.5*scale - 0.5) >= 0 for scale >= 1.)
    """
    scale = np.float64(src) / np.float64(dst)
    d = np.arange(dst, dtype=np.float64)
    f = ((d + 0.5) * scale - 0.5).astype(np.float32)
    s = np.floor(f).astype(np.int64)
    u = (f - s).astype(np.float32)
    i0 = np.clip(s, 0, src - 1).astype(np.int32)
    i1 = np.clip(s + 1, 0, src - 1).astype(np.int32)
    # saturate_cast<short>(cbuf * 2048): float32 multiply (exact: 2048 is a
    # power of two), then cvRound = round-half-even.
    a1 = np.rint(u * np.float32(_INTER_SCALE)).astype(np.int32)
    a0 = np.rint((np.float32(1.0) - u) * np.float32(_INTER_SCALE)).astype(np.int32)
    return i0, i1, a0, a1


def _resize_linear_fixedpoint_np(
    img: np.ndarray, dst_hw: Tuple[int, int], formula: str = "scalar"
) -> np.ndarray:
    """numpy reconstruction of cv2 INTER_LINEAR for u8 HWC images."""
    dh, dw = dst_hw
    x0, x1, ax0, ax1 = cv2_linear_axis_tables(img.shape[1], dw)
    y0, y1, by0, by1 = cv2_linear_axis_tables(img.shape[0], dh)
    rows = (
        img[:, x0].astype(np.int32) * ax0[None, :, None]
        + img[:, x1].astype(np.int32) * ax1[None, :, None]
    )  # (H, dw, C) int32, exact (max 2048*255 << 2^31)
    r0, r1 = rows[y0], rows[y1]
    b0 = by0[:, None, None]
    b1 = by1[:, None, None]
    if formula == "scalar":
        val = r0 * b0 + r1 * b1  # max ~1.07e9 < 2^31
        out = (val + (1 << (2 * _INTER_BITS - 1))) >> (2 * _INTER_BITS)
    else:  # "simd": universal-intrinsics VResizeLinearVec_32s8u rounding
        out = ((((r0 >> 4) * b0) >> 16) + (((r1 >> 4) * b1) >> 16) + 2) >> 2
    return np.clip(out, 0, 255).astype(np.uint8)


_FORMULA_CACHE: dict = {}


def cv2_resize_formula(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    """Which fixed-point reconstruction matches THIS cv2 build for this
    geometry: "scalar", "simd", or None (no bitwise match — caller should
    fall back to jax.image.resize). Detected by probing cv2.resize itself
    with random images (the impulse-probe idea, taken to its conclusion:
    validate the whole reconstructed pipeline, not just the weights)."""
    key = (tuple(src_hw), tuple(dst_hw))
    if key in _FORMULA_CACHE:
        return _FORMULA_CACHE[key]
    try:
        import cv2
    except ImportError:
        _FORMULA_CACHE[key] = None
        return None
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, (*src_hw, 3), dtype=np.uint8) for _ in range(2)
    ] + [np.full((*src_hw, 3), 128, np.uint8)]
    verdict = None
    # "simd" first: empirically it matches every geometry on this cv2 build
    # — downscale, upscale, and identity (the unclamped border weights in
    # cv2_linear_axis_tables are what make upscales exact); "scalar" matches
    # the subset where the two roundings coincide.
    for formula in ("simd", "scalar"):
        if all(
            np.array_equal(
                _resize_linear_fixedpoint_np(im, dst_hw, formula),
                cv2.resize(im, (dst_hw[1], dst_hw[0]), interpolation=cv2.INTER_LINEAR),
            )
            for im in imgs
        ):
            verdict = formula
            break
    _FORMULA_CACHE[key] = verdict
    return verdict


def _axis_is_select(i0, i1, a0, a1):
    """True when every tap on this axis has zero second-coefficient — the
    "resize" is pure point selection (a0 == 2048 follows: u < 1/4096 rounds
    (1-u)*2048 to 2048). Exact 1/N downscales (1080p -> 360x640 is 3:1) and
    identity geometries land here."""
    return bool(np.all(a1 == 0))


def _select_axis(x: Array, axis: int, i0: np.ndarray) -> Array:
    """Point-select along ``axis``.

    Affine index patterns (exact-ratio scales like 1080p -> 360x640) are
    lowered by RESHAPING the axis into (n, stride) and taking a unit-stride
    slice of the sub-axis — not a strided ``lax.slice``: on TPU a stride-3
    slice of the row-major frame buffer breaks the (8,128) tiling and XLA
    re-lays-out the ENTIRE operand through full-frame copy chains
    (benchmarks/profiles/r4 — two 796 MB copies per batch-128 iteration,
    ~3.2 GB of HBM copy traffic), while the reshape form slices along a
    tiling-compatible sub-axis (hardware A/B: fused nobox 673 -> 702 fps).
    Falls back to a strided slice when the pattern overruns the axis, and
    to a gather for non-affine patterns.
    """
    n = len(i0)
    if n == x.shape[axis] and np.array_equal(i0, np.arange(n)):
        return x  # identity
    if n == 1:
        stride = 1
    else:
        d = np.diff(i0)
        stride = int(d[0]) if np.all(d == d[0]) and d[0] > 0 else None
    if stride is not None:
        start = int(i0[0])
        if stride > 1 and start < stride and stride * n <= x.shape[axis]:
            trail = x.shape[axis] - stride * n
            if trail:
                idx = [slice(None)] * x.ndim
                idx[axis] = slice(0, stride * n)
                x = x[tuple(idx)]
            shp = list(x.shape)
            shp[axis : axis + 1] = [n, stride]
            xr = x.reshape(shp)
            idx = [slice(None)] * xr.ndim
            idx[axis + 1] = slice(start, start + 1)
            out_shape = [s for i, s in enumerate(shp) if i != axis + 1]
            return xr[tuple(idx)].reshape(out_shape)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + stride * (n - 1) + 1, stride)
        return x[tuple(idx)]
    return jnp.take(x, jnp.asarray(i0), axis=axis)


def resize_linear_cv2_exact(
    frames: Array, dst_hw: Tuple[int, int], formula: str = "scalar"
) -> Array:
    """cv2-INTER_LINEAR-exact resize of a uint8 NHWC batch on device.

    Pure integer pipeline (VPU work, fuses under jit); returns uint8
    (B, dh, dw, C). ``formula`` must come from ``cv2_resize_formula`` for
    bitwise parity with the host cv2 build.

    Degenerate axes (all second-coefficients zero — identity and exact-1/N
    geometries like 1080p->(360,640)) are lowered to strided slices with the
    residual rounding algebraically folded out, so the production letterbox
    costs a point-sample instead of an int32 gather/multiply pipeline while
    remaining bitwise-identical to the full formula (test_image.py pins the
    fast paths against the numpy full-formula reconstruction and cv2).
    """
    b, ih, iw, c = frames.shape
    dh, dw = dst_hw
    x0, x1, ax0, ax1 = cv2_linear_axis_tables(iw, dw)
    y0, y1, by0, by1 = cv2_linear_axis_tables(ih, dh)
    h_sel = _axis_is_select(x0, x1, ax0, ax1)
    v_sel = _axis_is_select(y0, y1, by0, by1)

    if h_sel and v_sel:
        # Both passes are *2048 with zero cross-terms; the final rounding
        # cancels exactly in both formula variants -> pure point sample.
        # Row (H) selection first: it keeps the minor W*C dimension
        # contiguous, so XLA lowers it as a cheap slice of full rows and the
        # W-axis selection then runs on the already-shrunk intermediate.
        return _select_axis(_select_axis(frames, 1, y0), 2, x0)

    if h_sel:
        # Horizontal pass selects (rows == v << 11); vertical formula applied
        # to uint8-selected taps with the 2048 factor folded into the shifts.
        xs = _select_axis(frames, 2, x0)
        r0 = _select_axis(xs, 1, y0).astype(jnp.int32)
        r1 = _select_axis(xs, 1, y1).astype(jnp.int32)
        b0 = jnp.asarray(by0)[None, :, None, None]
        b1 = jnp.asarray(by1)[None, :, None, None]
        if formula == "scalar":
            # ((r<<11)*b0 + ... + 2^21) >> 22  ==  (r*b0 + ... + 2^10) >> 11
            out = (r0 * b0 + r1 * b1 + (1 << (_INTER_BITS - 1))) >> _INTER_BITS
        else:
            # ((r<<11)>>4) == r<<7
            out = ((((r0 << 7) * b0) >> 16) + (((r1 << 7) * b1) >> 16) + 2) >> 2
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    src = frames.astype(jnp.int32)
    rows = (
        jnp.take(src, jnp.asarray(x0), axis=2) * jnp.asarray(ax0)[None, None, :, None]
        + jnp.take(src, jnp.asarray(x1), axis=2) * jnp.asarray(ax1)[None, None, :, None]
    )
    if v_sel:
        # Vertical pass is *2048 on the selected row; fold it into the shifts.
        rs = _select_axis(rows, 1, y0)
        if formula == "scalar":
            # (rs*2048 + 2^21) >> 22  ==  (rs + 2^10) >> 11
            out = (rs + (1 << (_INTER_BITS - 1))) >> _INTER_BITS
        else:
            # ((rs>>4)*2048)>>16 == rs>>9 ; the zero-weight tap contributes 0
            out = ((rs >> 9) + 2) >> 2
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    r0 = jnp.take(rows, jnp.asarray(y0), axis=1)
    r1 = jnp.take(rows, jnp.asarray(y1), axis=1)
    b0 = jnp.asarray(by0)[None, :, None, None]
    b1 = jnp.asarray(by1)[None, :, None, None]
    if formula == "scalar":
        val = r0 * b0 + r1 * b1
        out = (val + (1 << (2 * _INTER_BITS - 1))) >> (2 * _INTER_BITS)
    else:
        out = ((((r0 >> 4) * b0) >> 16) + (((r1 >> 4) * b1) >> 16) + 2) >> 2
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def letterbox_device_exact(
    frames: Array,
    dst_hw: Tuple[int, int],
    pad_value: float = PAD_VALUE,
    formula: str = "scalar",
) -> Array:
    """Bit-exact device letterbox: cv2-exact integer resize + gray padding.

    Bitwise-identical to ``letterbox_host`` (and hence the reference
    preprocessing) when ``formula == cv2_resize_formula(...)``. Returns
    float32 like ``letterbox_device``.
    """
    b, ih, iw, c = frames.shape
    h, w = dst_hw
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    resized = resize_linear_cv2_exact(frames, (nh, nw), formula)
    return jnp.pad(
        resized.astype(jnp.float32),
        ((0, 0), (top, h - nh - top), (left, w - nw - left), (0, 0)),
        constant_values=pad_value,
    )


def letterbox_canvas_u8(
    frames: Array,
    dst_hw: Tuple[int, int],
    pad_value: int = int(PAD_VALUE),
    formula: str = "scalar",
) -> Array:
    """Bit-exact device letterbox kept in uint8 (no dtype promotion).

    The fused engine program (pipeline/engine.py) letterboxes ONCE into this
    shared uint8 canvas and hands it to both detectors, which then apply only
    their elementwise input transforms (face: mean-sub; plate: 114-repad +
    /255). Versus per-detector letterboxing this halves the resize work and
    keeps the padded intermediate at 1/4 the bytes of the float32 canvas.
    Bitwise-identical content to ``letterbox_device_exact`` (same integer
    resize; the pad value is just stored as uint8).
    """
    b, ih, iw, c = frames.shape
    h, w = dst_hw
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    resized = resize_linear_cv2_exact(frames, (nh, nw), formula)
    return jnp.pad(
        resized,
        ((0, 0), (top, h - nh - top), (left, w - nw - left), (0, 0)),
        constant_values=np.uint8(pad_value),
    )


def letterbox_canvas_formula(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    """The cv2 rounding formula for the letterbox CONTENT resize of this
    geometry, or None when this cv2 build's rounding is not recognized
    (callers fall back to per-detector float letterboxing)."""
    nh, nw, _, _ = letterbox_params(src_hw, dst_hw)
    return cv2_resize_formula(src_hw, (nh, nw))


def letterbox_device_auto(
    frames: Array,
    dst_hw: Tuple[int, int],
    pad_value: float = PAD_VALUE,
    exact: str = "auto",
) -> Array:
    """Device letterbox with the cv2-bit-exact path auto-selected.

    ``exact``: "auto" uses the cv2-bit-exact integer letterbox whenever this
    build's cv2 rounding is recognized for the static geometry (detected
    once at trace time, host-side), falling back to ``jax.image.resize``;
    "never" forces the float path; "scalar"/"simd" force a formula (for
    environments without cv2 at trace time). The single selection point for
    every detector's preprocessing (face mean-sub path and the plate /255
    path both route through here).
    """
    b, ih, iw, c = frames.shape
    formula = None
    if exact in ("scalar", "simd"):
        formula = exact
    elif exact == "auto":
        nh, nw, _, _ = letterbox_params((ih, iw), dst_hw)
        formula = cv2_resize_formula((ih, iw), (nh, nw))
    if formula is not None:
        return letterbox_device_exact(
            frames, dst_hw, pad_value=pad_value, formula=formula
        )
    return letterbox_device(frames, dst_hw, pad_value=pad_value)


def preprocess_batch_device(
    frames: Array,
    input_hw: Tuple[int, int],
    dtype=jnp.float32,
    exact: str = "auto",
) -> Array:
    """uint8 NHWC frames -> letterboxed, mean-subtracted model input batch.

    ``exact`` is forwarded to ``letterbox_device_auto``.
    """
    x = letterbox_device_auto(frames, input_hw, exact=exact)
    x = preprocess_input(x)
    return x.astype(dtype)
