"""Per-ROI pixelation (mosaic) as a pure index remap on device.

The reference mosaics each detected box by INTER_NEAREST downscale by
``mosaic_level`` then INTER_NEAREST upscale, sequentially per box per frame on
CPU (``/root/reference/combine_detect.py:138-161, 246-249``). Pixelation never
blends pixels — it is a pure gather — so sequentially applying N boxes equals
composing N index remaps and performing ONE gather at the end. That is the
TPU formulation used here: a ``lax.scan`` over padded boxes composes two
int32 index maps (ysrc, xsrc) of shape (H, W), then a single gather produces
the blurred frame. Everything is shape-static and fuses into the jitted
detection program; frames stay uint8 in HBM.

Bitwise parity with OpenCV: cv2's INTER_NEAREST source index is
``min(floor(fl64(x * fl64(1.0 / (fl64(dst)/src)))), src-1)`` with float64
rounding on both the scale and the product. Rather than emulate double
rounding on device, we exploit that the composed down+up remap for a box of
extent ``b`` depends only on ``b`` (and the static mosaic level): a host-
precomputed ``(maxdim+1, maxdim)`` int16 table holds the exact composed source
offset for every extent, and the device program just gathers rows of it
(verified bitwise against cv2 in tests/test_mosaic.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_MOSAIC_LEVEL = 8


def _cv2_nn_map(dsz: int, ssz: int) -> np.ndarray:
    """cv2 INTER_NEAREST source indices, exact float64 semantics."""
    scale = np.float64(1.0) / (np.float64(dsz) / np.float64(ssz))
    idx = np.floor(np.arange(dsz, dtype=np.float64) * scale).astype(np.int64)
    return np.minimum(idx, ssz - 1)


@lru_cache(maxsize=8)
def composed_mosaic_table(
    level: int = DEFAULT_MOSAIC_LEVEL, maxdim: int = 2048
) -> np.ndarray:
    """Exact composed mosaic remap for every box extent up to ``maxdim``.

    table[b, t] = source offset (within the box) of output offset ``t`` after
    INTER_NEAREST downscale to ``max(1, b // level)`` and upscale back —
    i.e. ``down_map[up_map[t]]`` in cv2's float64 arithmetic. Rows are padded
    past ``b`` with the last valid entry (those positions are masked out by
    the caller anyway). int16: extents up to 32k.
    """
    table = np.zeros((maxdim + 1, maxdim), dtype=np.int16)
    for b in range(1, maxdim + 1):
        s = max(1, b // level)
        up = _cv2_nn_map(b, s)
        down = _cv2_nn_map(s, b)
        comp = down[up]
        table[b, :b] = comp
        if b < maxdim:
            table[b, b:] = comp[-1]
    table.setflags(write=False)
    return table


def build_mosaic_maps(
    boxes: Array,
    valid: Array,
    height: int,
    width: int,
    level: int = DEFAULT_MOSAIC_LEVEL,
) -> Tuple[Array, Array]:
    """Compose per-box mosaic remaps into final (ysrc, xsrc) int32 maps.

    boxes: (K, 4) int32 xyxy in pixels (unclipped ok); valid: (K,) bool.
    Returns ymap, xmap each (H, W) int32 such that
    ``out[y, x] = frame[ymap[y, x], xmap[y, x]]`` reproduces sequentially
    mosaicking every valid box in order.
    """
    maxdim = max(height, width)
    table = jnp.asarray(composed_mosaic_table(level, maxdim))

    ys0 = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.int32)[:, None], (height, width)
    )
    xs0 = jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[None, :], (height, width))

    row_idx = jnp.arange(height, dtype=jnp.int32)
    col_idx = jnp.arange(width, dtype=jnp.int32)

    def apply_box(carry, box_and_valid):
        ymap, xmap = carry
        box, ok = box_and_valid
        x1 = jnp.clip(box[0], 0, width)
        y1 = jnp.clip(box[1], 0, height)
        x2 = jnp.clip(box[2], 0, width)
        y2 = jnp.clip(box[3], 0, height)
        bh = y2 - y1
        bw = x2 - x1
        ok = jnp.logical_and(ok, jnp.logical_and(bh > 0, bw > 0))

        ty = jnp.clip(row_idx - y1, 0, maxdim - 1)
        src_y = y1 + table[bh, ty].astype(jnp.int32)
        tx = jnp.clip(col_idx - x1, 0, maxdim - 1)
        src_x = x1 + table[bw, tx].astype(jnp.int32)

        in_y = jnp.logical_and(row_idx >= y1, row_idx < y2)
        in_x = jnp.logical_and(col_idx >= x1, col_idx < x2)
        inside = jnp.logical_and(
            jnp.logical_and(ok, in_y)[:, None], in_x[None, :]
        )

        # Compose with the accumulated map only inside the box:
        # new(y, x) = old(src_y[y], src_x[x]) if inside else old(y, x).
        # The box remap is separable, so the 2-D gather is two cheap takes.
        gy = jnp.take(jnp.take(ymap, src_y, axis=0), src_x, axis=1)
        gx = jnp.take(jnp.take(xmap, src_y, axis=0), src_x, axis=1)
        ymap = jnp.where(inside, gy, ymap)
        xmap = jnp.where(inside, gx, xmap)
        return (ymap, xmap), None

    (ymap, xmap), _ = jax.lax.scan(apply_box, (ys0, xs0), (boxes, valid))
    return ymap, xmap


def apply_remap(frame: Array, ymap: Array, xmap: Array) -> Array:
    """Gather a (H, W, C) frame through (H, W) index maps."""
    return frame[ymap, xmap]


def mosaic_boxes_batch(
    frames: Array,
    boxes: Array,
    valid: Array,
    level: int = DEFAULT_MOSAIC_LEVEL,
) -> Array:
    """Mosaic every valid box on every frame of an NHWC batch (on device).

    frames: (B, H, W, C) any dtype; boxes: (B, K, 4) int32 pixel xyxy;
    valid: (B, K) bool. Returns blurred frames, same shape/dtype.
    """
    _, h, w, _ = frames.shape

    def per_image(frame, bxs, ok):
        ymap, xmap = build_mosaic_maps(bxs, ok, h, w, level)
        return apply_remap(frame, ymap, xmap)

    return jax.vmap(per_image)(frames, boxes, valid)


def chroma_boxes(boxes: Array) -> Array:
    """Half-resolution chroma-plane boxes covering a full-res pixel box.

    Floor the start and ceil the end so every chroma sample whose 2x2 luma
    footprint intersects the box is pixelated (privacy must err outward).
    """
    return jnp.stack(
        [
            boxes[..., 0] // 2,
            boxes[..., 1] // 2,
            (boxes[..., 2] + 1) // 2,
            (boxes[..., 3] + 1) // 2,
        ],
        axis=-1,
    )


def mosaic_i420_batch(
    yuv: Array,
    boxes: Array,
    valid: Array,
    level: int = DEFAULT_MOSAIC_LEVEL,
    plane_fn=None,
) -> Array:
    """Mosaic planar I420 frames directly — no RGB roundtrip.

    yuv: (B, H*3/2, W) uint8 planar I420 (Y plane then U then V, each
    chroma plane H/2 x W/2 packed two rows per buffer row); boxes: (B, K, 4)
    int32 full-resolution pixel xyxy; valid: (B, K) bool.

    INTER_NEAREST pixelation is a pure gather — it copies pixels and never
    blends — so it commutes with any per-pixel colorspace transform:
    mosaicking the decoded YUV planes directly equals decoding to RGB,
    mosaicking there, and converting back, minus the double-conversion
    rounding the reference pipeline incurs (combine_detect.py:138-161 after
    cv2 BGR decode). The Y plane uses the full-res boxes and ``level``; the
    chroma planes use half-res boxes (``chroma_boxes``) at ``level // 2``,
    which preserves the block GRANULARITY (a chroma block covers ~``level``
    full-res pixels, so no finer color detail survives than luma detail).
    The block COUNT can differ from Y's where the integer rounding
    diverges — extents < 2*level get extra chroma blocks (15 px at level 8:
    1 luma block, 2 chroma), and odd levels blur chroma slightly finer —
    so the chroma pattern is not the RGB path's pattern subsampled; exact
    equivalence is impossible anyway because chroma subsampling AVERAGES
    2x2 neighborhoods while pixelation only gathers.
    U and V are INTERLEAVED on the channel axis
    — (B, H/2, W/2, 2) — so one pass with ONE box list covers both planes;
    the Pallas kernel's per-box work is serial, and profiling the earlier
    side-by-side stacking (duplicated boxes) showed the chroma pass costing
    as much as the full-res Y pass purely from the doubled box count
    (benchmarks/profiles/r3yuv).

    plane_fn: the (B, H, W, C)-plane mosaic backend; defaults to the XLA
    ``mosaic_boxes_batch`` (the Pallas twin lives in ops.pallas_mosaic).
    """
    if plane_fn is None:
        plane_fn = mosaic_boxes_batch
    b, h15, w = yuv.shape
    h = (h15 * 2) // 3
    assert h15 * 2 == h * 3 and h % 2 == 0 and w % 2 == 0, (h15, w)
    y = yuv[:, :h, :]
    u = yuv[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
    v = yuv[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)

    y_out = plane_fn(y[..., None], boxes, valid, level)[..., 0]

    cb = chroma_boxes(boxes)
    clevel = max(1, level // 2)
    c_out = plane_fn(jnp.stack([u, v], axis=-1), cb, valid, clevel)

    u_out = c_out[..., 0].reshape(b, h // 4, w)
    v_out = c_out[..., 1].reshape(b, h // 4, w)
    return jnp.concatenate([y_out, u_out, v_out], axis=1)


def mosaic_i420_host_inplace(
    yuv: np.ndarray, boxes, level: int = DEFAULT_MOSAIC_LEVEL
) -> np.ndarray:
    """Host oracle for ``mosaic_i420_batch``: cv2 mosaic per plane on one
    (H*3/2, W) I420 image, full-res boxes on Y, halved boxes at level//2 on
    U and V. Mutates ``yuv``."""
    # The chroma views below reshape row slices; on a non-contiguous array
    # numpy would silently copy and the mutations would be lost.
    assert yuv.flags["C_CONTIGUOUS"], "mosaic_i420_host_inplace needs C-contiguous yuv"
    h15, w = yuv.shape
    h = (h15 * 2) // 3
    mosaic_host_inplace(yuv[:h], boxes, level)
    u = yuv[h : h + h // 4].reshape(h // 2, w // 2)
    v = yuv[h + h // 4 :].reshape(h // 2, w // 2)
    cb = [
        [x1 // 2, y1 // 2, (x2 + 1) // 2, (y2 + 1) // 2]
        for x1, y1, x2, y2 in boxes
    ]
    clevel = max(1, level // 2)
    mosaic_host_inplace(u, cb, clevel)
    mosaic_host_inplace(v, cb, clevel)
    return yuv


def mosaic_host_inplace(
    img: np.ndarray, boxes, level: int = DEFAULT_MOSAIC_LEVEL
) -> np.ndarray:
    """Mutate ``img`` with the reference cv2 mosaic (no defensive copy).

    The hot pipelines own their frame buffers, and a 1080p frame copy costs
    as much as the mosaic itself — callers that need the input preserved use
    ``mosaic_host_reference``.
    """
    import cv2

    h, w = img.shape[:2]
    for x1, y1, x2, y2 in boxes:
        x1, y1 = max(0, int(x1)), max(0, int(y1))
        x2, y2 = min(w, int(x2)), min(h, int(y2))
        if x2 <= x1 or y2 <= y1:
            continue
        area = img[y1:y2, x1:x2]
        sh = max(1, (y2 - y1) // level)
        sw = max(1, (x2 - x1) // level)
        small = cv2.resize(area, (sw, sh), interpolation=cv2.INTER_NEAREST)
        mosaic = cv2.resize(small, (x2 - x1, y2 - y1), interpolation=cv2.INTER_NEAREST)
        img[y1:y2, x1:x2] = mosaic
    return img


def mosaic_host_reference(
    img: np.ndarray, boxes, level: int = DEFAULT_MOSAIC_LEVEL
) -> np.ndarray:
    """Sequential cv2 mosaic, bit-identical to the reference CPU kernel.

    Used as the golden oracle in tests and as the host fallback path.
    """
    return mosaic_host_inplace(img.copy(), boxes, level)


def gaussian_blur_host_inplace(
    img: np.ndarray, boxes, sigma: float = 6.0, kernel_radius: int = 12
) -> np.ndarray:
    """Host analog of ``gaussian_blur_boxes`` (the softer anonymizer): blur
    each clipped box ROI in place with cv2. Same sigma/radius defaults as
    the device kernel; boundary handling differs at ROI edges (cv2 reflects
    within the ROI, the device kernel blurs across it) — the anonymizers are
    alternatives, not bitwise twins."""
    import cv2

    k = 2 * kernel_radius + 1
    h, w = img.shape[:2]
    for x1, y1, x2, y2 in boxes:
        x1, y1 = max(0, int(x1)), max(0, int(y1))
        x2, y2 = min(w, int(x2)), min(h, int(y2))
        if x2 <= x1 or y2 <= y1:
            continue
        img[y1:y2, x1:x2] = cv2.GaussianBlur(img[y1:y2, x1:x2], (k, k), sigma)
    return img


def gaussian_blur_boxes(
    frames: Array,
    boxes: Array,
    valid: Array,
    sigma: float = 6.0,
    kernel_radius: int = 12,
) -> Array:
    """Alternative anonymization: Gaussian-blur box interiors (device).

    Separable depthwise blur over the full frame (VPU-friendly two 1-D
    convolutions) composited into box regions. frames (B, H, W, C) uint8 or
    float; boxes (B, K, 4) int32; valid (B, K) bool.
    """
    b, h, w, c = frames.shape
    x = frames.astype(jnp.float32)
    r = kernel_radius
    k = jnp.exp(-0.5 * (jnp.arange(-r, r + 1, dtype=jnp.float32) / sigma) ** 2)
    k = k / jnp.sum(k)

    # Separable blur via conv over rows then cols (feature dims batched).
    def blur_axis(v, axis):
        moved = jnp.moveaxis(v, axis, -1)  # (..., L)
        flat = moved.reshape(-1, 1, moved.shape[-1])
        out = jax.lax.conv_general_dilated(
            flat,
            k.reshape(1, 1, -1),
            window_strides=(1,),
            padding=[(r, r)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return jnp.moveaxis(out.reshape(moved.shape), -1, axis)

    blurred = blur_axis(blur_axis(x, 1), 2)

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]

    def inside_any(bxs, ok):
        def one(box_ok, box):
            x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
            m = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
            return jnp.logical_and(m, box_ok)

        masks = jax.vmap(one)(ok, bxs)  # (K, H, W)
        return jnp.any(masks, axis=0)

    mask = jax.vmap(inside_any)(boxes, valid)  # (B, H, W)
    out = jnp.where(mask[..., None], blurred, x)
    if jnp.issubdtype(frames.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(frames.dtype)
