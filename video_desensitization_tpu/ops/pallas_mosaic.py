"""Pallas TPU kernel for per-ROI mosaic (pixelation) on NHWC uint8 frames.

The XLA formulation (ops/mosaic.py) composes per-box index remaps over the
full (H, W) frame with a ``lax.scan`` — O(K * H * W) memory traffic per
frame even when boxes cover a tiny fraction of it. This kernel does
box-area-proportional work instead: one grid step per frame, frames stay in
HBM, and each box rewrites only its own rows through small VMEM windows
(DMA in -> two same-shape gathers -> masked merge -> DMA out). Strips live
on an 8-aligned ownership grid and write back only their own OUT_ROWS rows,
so consecutive strips' writes are disjoint: input DMAs double-buffer against
compute and write-backs run one-outstanding, overlapping DMA with MXU work
instead of serializing per strip. The output is input-output aliased with
the frames operand (in-place, like the reference), so there is no
pass-through copy.

Parity: bit-identical to the reference's sequential cv2 INTER_NEAREST
down+upscale (combine_detect.py:138-161). The per-extent composed source
offsets come from the same float64-exact table as ops/mosaic.py
(``composed_mosaic_table``); XLA expands them into absolute per-row/per-
column source maps outside the kernel. Two structural facts make the
in-place strip scheme exact:

* the composed source offset is **monotone-floor**: comp[t] <= t for every
  extent (cv2's resize uses floor rounding in both directions; verified
  numerically for all extents to 2048 and several levels). Sources never
  come from below/right, so processing a box's strips **bottom-up** reads
  only rows this box has not yet rewritten, and the column gather within a
  strip reads the pre-write window;
* comp[t] >= t - (2*level + 1), so a window with ``PAD`` rows of lookback
  above each output strip contains every source row (the wrapper falls back
  to the XLA path when 2*level + 2 > PAD).

Sequential box order over the in-place frame reproduces the reference's
sequential per-box application, including overlapping boxes.

Layout (pallas_guide.md): the channel-interleaved frame is treated as
(H, W*3) uint8 rows — W*3 is a lane multiple of 128 for common widths
(1920*3 = 45*128). Mosaic's ``dynamic_gather`` is avoided entirely (it
silently reads wrong lanes at operand lane offsets >= 256 on v5e), so both
gathers run as exact one-hot matmuls on the MXU (uint8 values in f32):

* **source rows**: a (STRIP, STRIP) one-hot matrix built from the strip's
  source-row indices, contracted against each active lane group;
* **source columns**: the interleaved column displacement is bounded by
  3*(2*level+1) + 2 < 128, so a source lane lives in the output's own
  128-lane group or the one before it — per group, two banded one-hot
  matmuls against the pristine window plus the row one-hot.

All three matmuls are gated per 128-lane group on box overlap (pl.when)
and writes go to a separate accumulator window, so MXU work is
box-width-proportional — a strip of a 100-px face box costs ~3 small
matmuls instead of 45-group full-row passes (profiled 26% of the fused
program before gating, benchmarks/profiles/r3).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_desensitization_tpu.ops.mosaic import (
    DEFAULT_MOSAIC_LEVEL,
    composed_mosaic_table,
    mosaic_boxes_batch,
    mosaic_i420_batch,
)

STRIP = 128  # VMEM window rows per input DMA
PAD = 24  # source-row lookback above the output strip (multiple of 8)
# Output strips live on a fixed 8-aligned grid anchored at base =
# align8_down(y1), so every window start (o - PAD) and write-back offset is
# 8-aligned by construction (DMA tiling constraint) with no per-strip
# alignment slack. Each strip writes back only its own OUT_ROWS rows, so
# consecutive strips' write regions are disjoint — which is what makes the
# double-buffered strip pipeline below legal.
OUT_ROWS = STRIP - PAD


def _mosaic_kernel(
    boxes_ref,  # (1, K, 4) SMEM int32 [x1, y1, x2, y2], clipped
    ysrc_ref,  # (1, H, KPAD) VMEM f32 — absolute source row per output row
    csrc_ref,  # (1, K, W*C) VMEM f32 — interleaved source column per column
    frame_ref,  # (B, H, W*C) ANY (HBM) uint8 — aliased with out_ref
    out_ref,  # (B, H, W*C) ANY (HBM) uint8 — full array
    scratch,  # (2, STRIP, W*C) VMEM uint8 — double-buffered input windows
    ascratch,  # (2, STRIP, W*C) VMEM uint8 — double-buffered accumulators
    yscratch,  # (2, STRIP, KPAD) VMEM f32 — double-buffered source-row windows
    in_sems,  # DMA (2,) — input-window copies
    y_sems,  # DMA (2,) — source-row-window copies
    out_sems,  # DMA (2,) — write-back copies
    *,
    height: int,
    width: int,
    channels: int = 3,
):
    w3 = width * channels
    n_boxes = boxes_ref.shape[1]
    i = pl.program_id(0)  # frame index (HBM refs are unblocked)
    # No pass-through copy: out_ref is input-output aliased with frame_ref
    # (XLA inserts the defensive copy only when the caller did not donate
    # the frames buffer), so out starts holding the frame content and boxes
    # rewrite their regions in place — exactly the reference's in-place
    # semantics (combine_detect.py:138-161).

    colpix = jax.lax.broadcasted_iota(jnp.int32, (1, w3), 1) // channels

    def per_box(k, _):
        x1 = boxes_ref[0, k, 0]
        y1 = boxes_ref[0, k, 1]
        x2 = boxes_ref[0, k, 2]
        y2 = boxes_ref[0, k, 3]

        in_x = jnp.logical_and(colpix >= x1, colpix < x2)  # (1, w3)
        csrc = csrc_ref[0, pl.ds(k, 1), :]  # (1, w3)
        # Output strips on an 8-aligned grid anchored at align8_down(y1):
        # strip s OWNS rows [base + s*OUT_ROWS, base + (s+1)*OUT_ROWS) and
        # writes back exactly those rows, so strips' write regions are
        # disjoint (except the clamped bottom strip, serialized below) and
        # the input window [o - PAD, o - PAD + STRIP) covers lookback + own
        # rows only — strips never read rows another strip of this box
        # writes, which is what legalizes the DMA pipeline.
        base = (y1 // 8) * 8
        n_strips = (y2 - base + OUT_ROWS - 1) // OUT_ROWS

        def strip_geom(s_rev):
            # Bottom-up: comp[t] <= t puts every source row at or above its
            # output row, so writing lower strips first keeps all source
            # rows pristine until they are consumed.
            s = n_strips - 1 - s_rev
            o_nom = base + s * OUT_ROWS  # ownership start (8-aligned)
            o_c = jnp.minimum(o_nom, height - OUT_ROWS)  # DMA write start
            wstart = jnp.maximum(o_c - PAD, 0)  # input window start
            # All three are multiples of 8 by construction, but Mosaic's
            # divisibility prover only accepts the (x // 8) * 8 pattern for
            # dynamic sublane DMA offsets — wrap them (numerically no-ops).
            o_c = (o_c // 8) * 8
            wstart = (wstart // 8) * 8
            return o_nom, o_c, wstart

        def start_in(s_rev, slot):
            _, _, wstart = strip_geom(s_rev)
            pltpu.make_async_copy(
                out_ref.at[i, pl.ds(wstart, STRIP), :],
                scratch.at[slot],
                in_sems.at[slot],
            ).start()
            # Source-row window via DMA (vector loads at dynamic sublane
            # offsets need 8-alignment; DMA lane slices must be whole
            # 128-tiles, so copy ALL boxes' columns and pick box k below).
            pltpu.make_async_copy(
                ysrc_ref.at[0, pl.ds(wstart, STRIP), :],
                yscratch.at[slot],
                y_sems.at[slot],
            ).start()

        def wait_in(s_rev, slot):
            _, _, wstart = strip_geom(s_rev)
            pltpu.make_async_copy(
                out_ref.at[i, pl.ds(wstart, STRIP), :],
                scratch.at[slot],
                in_sems.at[slot],
            ).wait()
            pltpu.make_async_copy(
                ysrc_ref.at[0, pl.ds(wstart, STRIP), :],
                yscratch.at[slot],
                y_sems.at[slot],
            ).wait()

        def out_copy(s_rev, slot):
            _, o_c, wstart = strip_geom(s_rev)
            off = ((o_c - wstart) // 8) * 8  # == o_c - wstart (<= PAD)
            return pltpu.make_async_copy(
                ascratch.at[slot, pl.ds(off, OUT_ROWS), :],
                out_ref.at[i, pl.ds(o_c, OUT_ROWS), :],
                out_sems.at[slot],
            )

        def per_strip(s_rev, _):
            p = s_rev % 2
            o_nom, o_c, wstart = strip_geom(s_rev)
            wait_in(s_rev, p)

            # Prefetch the next (upper) strip's window while computing this
            # one. Its window lies entirely above this strip's write region,
            # so the only rows it can race with are pristine-valued
            # rewrites (clamped bottom strip / sub-PAD top windows), which
            # are never consumed as sources nor written back — benign.
            @pl.when(s_rev + 1 < n_strips)
            def _():
                start_in(s_rev + 1, 1 - p)

            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (STRIP, 1), 0) + wstart
            )  # absolute row per sublane
            writable = jnp.logical_and(
                rows >= jnp.maximum(o_nom, y1),
                jnp.logical_and(rows < o_nom + OUT_ROWS, rows < y2),
            )  # (STRIP, 1)

            # Select box k's column by one-hot contraction on the MXU (a
            # dynamic unaligned lane index cannot be vector-loaded).
            kpad = yscratch.shape[2]
            ksel = (
                jax.lax.broadcasted_iota(jnp.int32, (kpad, 1), 0) == k
            ).astype(jnp.float32)
            # HIGHEST precision: the MXU multiplies in bf16 by default, which
            # corrupts integer values > 256 (row indices reach H).
            ysel = jnp.dot(
                yscratch[p],
                ksel,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (STRIP, 1)
            rel = jnp.clip(ysel.astype(jnp.int32) - wstart, 0, STRIP - 1)

            # Row gather one-hot: onehot[o, s] = 1 iff rel[o] == s.
            src_ids = jax.lax.broadcasted_iota(jnp.int32, (STRIP, STRIP), 1)
            onehot = (src_ids == rel).astype(jnp.float32)

            # Output accumulator starts as the pristine window; only lane
            # groups the box intersects are recomputed. All source reads go
            # through `scratch` (never rewritten within a strip), so the
            # per-group writes below cannot corrupt later groups' sources.
            # Buffer-reuse is safe: the last write-back from ascratch[p]
            # (strip s_rev - 2) was waited at iteration s_rev - 1.
            ascratch[p] = scratch[p]

            # Column gather per 128-lane group (Mosaic: 2D gathers only, one
            # vreg along the gather dim). A source lane lives in the output's
            # own group or the previous one (displacement < 128), so
            # out[:, g] = rows(win[:, g] @ OH_g + win[:, g-1] @ OH_{g-1})
            # with OH_h[a, b] = (csrc[g*128+b] == h*128 + a). The row gather
            # and both column matmuls are gated per group on box overlap
            # (pl.when), so MXU work is box-WIDTH-proportional instead of
            # full-row — the gather-as-matmul cost for a 100-px face box
            # drops ~15x. One-hot matmuls are exact selections of uint8
            # values in f32: row-first vs column-first order is immaterial.
            # (No dynamic_gather anywhere: Mosaic's dynamic_gather silently
            # reads wrong lanes at lane offsets >= 256, verified on v5e.)
            ngroups = w3 // 128
            ones_col = jnp.ones((STRIP, 1), jnp.float32)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (STRIP, 128), 0)
            x1c = x1 * channels
            x2c = x2 * channels
            for g in range(ngroups):
                sl = slice(g * 128, (g + 1) * 128)

                @pl.when(
                    jnp.logical_and(x1c < (g + 1) * 128, x2c > g * 128)
                )
                def _(g=g, sl=sl):
                    # HIGHEST precision: default bf16 MXU passes round the
                    # column indices (up to W*3 > 256); the data matmuls
                    # stay at default precision — uint8 values and 0/1
                    # one-hots are exact in bf16 with f32 accumulation.
                    csl = jnp.dot(
                        ones_col,
                        csrc[:, sl],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    ).astype(jnp.int32)  # (STRIP, 128), row-constant
                    win_g = (
                        scratch[p, :, sl].astype(jnp.int32).astype(jnp.float32)
                    )
                    oh_same = (row_ids + g * 128 == csl).astype(jnp.float32)
                    tmp = jnp.dot(
                        win_g, oh_same, preferred_element_type=jnp.float32
                    )
                    if g > 0:
                        prev_sl = slice((g - 1) * 128, g * 128)
                        win_p = (
                            scratch[p, :, prev_sl]
                            .astype(jnp.int32)
                            .astype(jnp.float32)
                        )
                        oh_prev = (
                            row_ids + (g - 1) * 128 == csl
                        ).astype(jnp.float32)
                        tmp = tmp + jnp.dot(
                            win_p, oh_prev, preferred_element_type=jnp.float32
                        )
                    piece = jnp.dot(
                        onehot, tmp, preferred_element_type=jnp.float32
                    )  # (STRIP, 128)
                    keep = jnp.logical_and(writable, in_x[:, sl])
                    ascratch[p, :, sl] = (
                        jnp.where(keep, piece, win_g)
                        .astype(jnp.int32)
                        .astype(jnp.uint8)
                    )

            # Single-outstanding write-back: wait the previous strip's out
            # before starting ours. This (a) frees ascratch[p] one iteration
            # ahead of its reuse, and (b) orders overlapping write regions
            # (the clamped bottom strip writes pristine rows that the strip
            # above it later rewrites with mosaic content — the wait makes
            # that ordering a guarantee instead of a DMA-engine accident).
            @pl.when(s_rev >= 1)
            def _():
                out_copy(s_rev - 1, 1 - p).wait()

            out_copy(s_rev, p).start()
            return 0

        @pl.when(n_strips > 0)
        def _():
            start_in(0, 0)
            jax.lax.fori_loop(0, n_strips, per_strip, 0)
            # Drain the final strip's write-back before the next box (whose
            # reads may depend on every row this box wrote).
            out_copy(n_strips - 1, (n_strips - 1) % 2).wait()

        return 0

    jax.lax.fori_loop(0, n_boxes, per_box, 0)


def pallas_mosaic_supported(
    height: int,
    width: int,
    level: int = DEFAULT_MOSAIC_LEVEL,
    channels: int = 3,
) -> bool:
    return (
        height >= STRIP
        and height % 8 == 0
        and (width * channels) % 128 == 0
        # PAD bounds the row lookback; the column one-hot scheme needs the
        # interleaved displacement channels*(2*level+1) + channels - 1 to
        # stay under one 128-lane group, which PAD <= 24 already implies
        # for channels <= 3.
        and 2 * level + 2 <= PAD
    )


def mosaic_boxes_batch_pallas(
    frames: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    level: int = DEFAULT_MOSAIC_LEVEL,
    interpret: bool = False,
) -> jax.Array:
    """Pallas mosaic over an NHWC uint8 batch.

    frames: (B, H, W, C) uint8 with C in {1, 2, 3} (C=1 mosaics a bare
    plane, C=2 interleaved U|V chroma — the YUV420 path); boxes: (B, K, 4)
    int32 pixel xyxy (unclipped ok); valid: (B, K) bool. Same semantics as
    ops.mosaic.mosaic_boxes_batch.

    Geometries outside the kernel's native envelope (H not a multiple of 8
    or < 128; W*C not a multiple of 128 — portrait frames, 480/640-class
    widths) are PADDED to it and cropped back: two contiguous frame copies
    instead of the XLA scan fallback's O(K * H * W) per-box remap passes.
    Boxes are clipped to the ORIGINAL frame before padding — the kernel's
    own clip would clip to the padded extent, changing a spilling box's
    extent and with it the composed pixelation table. Only a mosaic level
    beyond the kernel's lookback budget (2*level + 2 > PAD) or a channel
    count outside {1, 2, 3} still falls back to the XLA path.
    """
    b, h, w, c = frames.shape
    if c not in (1, 2, 3) or 2 * level + 2 > PAD:
        return mosaic_boxes_batch(frames, boxes, valid, level)
    if pallas_mosaic_supported(h, w, level, c):
        out = mosaic_boxes_batch_pallas_flat(
            frames.reshape(b, h, w * c), boxes, valid, w, level,
            interpret=interpret, channels=c,
        )
        return out.reshape(b, h, w, c)
    # Pad-to-envelope. Sources of every output pixel lie inside its own box
    # (composed table offsets are in [0, extent)), so once boxes are clipped
    # to the original H x W the padded rows/cols are never read as sources
    # and never written — the crop returns exactly the native result.
    ph = max(STRIP, ((h + 7) // 8) * 8)
    # Smallest W grain g with (g*C) % 128 == 0: 128 / gcd(C, 128).
    lane_w = 128 // math.gcd(c, 128)
    pw = ((w + lane_w - 1) // lane_w) * lane_w
    cboxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )
    padded = jnp.pad(frames, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
    out = mosaic_boxes_batch_pallas_flat(
        padded.reshape(b, ph, pw * c), cboxes, valid, pw, level,
        interpret=interpret, channels=c,
    )
    return out.reshape(b, ph, pw, c)[:, :h, :w, :]


def mosaic_i420_batch_pallas(
    yuv: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    level: int = DEFAULT_MOSAIC_LEVEL,
    interpret: bool = False,
) -> jax.Array:
    """Pallas mosaic on planar I420 frames (B, H*3/2, W) — no RGB roundtrip.

    Same plane decomposition as ops.mosaic.mosaic_i420_batch (Y at full res;
    U and V channel-interleaved at level//2 with halved boxes — one box list,
    not two), with each plane going through the strip kernel: the Y pass
    touches 1 byte/px instead of the interleaved RGB kernel's 3, and the
    chroma pass adds only 1/2.
    """

    def plane_fn(frames, bxs, ok, lvl):
        return mosaic_boxes_batch_pallas(frames, bxs, ok, lvl, interpret)

    return mosaic_i420_batch(yuv, boxes, valid, level, plane_fn=plane_fn)


def mosaic_boxes_batch_pallas_flat(
    flat: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    width: int,
    level: int = DEFAULT_MOSAIC_LEVEL,
    interpret: bool = False,
    channels: int = 3,
) -> jax.Array:
    """Same kernel over channel-interleaved (B, H, W*C) uint8 rows.

    The flat form is the kernel's native operand layout (row-major
    {2,1,0}); keeping the surrounding jitted program in this shape lets
    XLA's layout assignment satisfy the custom call's operand constraint at
    the program entry instead of inserting full-frame layout copies around
    the call (profiled 5 x ~790 MB copies per batch-128 iteration,
    benchmarks/profiles/r3b). ``channels=1`` runs the kernel on a single
    plane (B, H, W) — the YUV420 path mosaics Y/U/V planes directly.
    Callers must ensure ``pallas_mosaic_supported(H, width, level,
    channels)`` themselves.
    """
    b, h, w3 = flat.shape
    w = width
    assert w3 == channels * w, (w3, w, channels)
    k = boxes.shape[1]
    maxdim = max(h, w)
    table = jnp.asarray(composed_mosaic_table(level, maxdim), jnp.int32)

    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    ok = valid & (x2 > x1) & (y2 > y1)
    zeros = jnp.zeros_like(x1)
    cboxes = jnp.stack(
        [
            jnp.where(ok, x1, zeros),
            jnp.where(ok, y1, zeros),
            jnp.where(ok, x2, zeros),
            jnp.where(ok, y2, zeros),
        ],
        axis=-1,
    ).astype(jnp.int32)

    # The per-box offset lookup ``tbl[pos - start]`` is a per-row SHIFT of a
    # table row, not a general gather. Expressed as take_along_axis it
    # lowers to an elementwise (slice_sizes=1) XLA gather that runs at
    # ~1 GiB/s on TPU and dominated the fused program (profiled 47% of self
    # time at batch 128, benchmarks/profiles/r3). A batched dynamic_slice
    # of [zeros | row] at offset (maxdim - start) is the same shift as ONE
    # contiguous slice-gather per (frame, box) row — orders of magnitude
    # fewer indices. Out-of-box positions read zeros/pad garbage, which the
    # kernel masks via the SMEM box coordinates (writable/in_x).
    def _shifted_rows(tbl: jax.Array, starts: jax.Array, out_len: int):
        big = jnp.concatenate([jnp.zeros_like(tbl), tbl], axis=2)
        sl = lambda row, st: jax.lax.dynamic_slice(row, (st,), (out_len,))
        return jax.vmap(jax.vmap(sl))(big, starts)

    # Absolute per-output-row source rows, stored (B, H, K) so the kernel's
    # per-strip DMA reads rows on the sublane axis. Rows outside the box
    # carry garbage — the kernel masks them out.
    ytbl = table[jnp.where(ok, y2 - y1, zeros)]  # (B, K, maxdim)
    yoff = _shifted_rows(ytbl, maxdim - y1, h)  # (B, K, H): ytbl[r - y1]
    ysrc = (y1[..., None] + yoff).astype(jnp.float32)
    ysrc = jnp.swapaxes(ysrc, 1, 2)  # (B, H, K) — f32 for the one-hot matmul
    kpad = ((k + 127) // 128) * 128
    ysrc = jnp.pad(ysrc, ((0, 0), (0, 0), (0, kpad - k)))

    # Absolute per-output-column source pixels at PIXEL resolution (B, K, W),
    # identity outside the box, then channel-interleaved to (B, K, W*3).
    xtbl = table[jnp.where(ok, x2 - x1, zeros)]
    xoff = _shifted_rows(xtbl, maxdim - x1, w)  # (B, K, W): xtbl[c - x1]
    colpix = jnp.arange(w, dtype=jnp.int32)
    in_x = (colpix[None, None, :] >= x1[..., None]) & (
        colpix[None, None, :] < x2[..., None]
    )
    csrc_pix = jnp.where(in_x, x1[..., None] + xoff, colpix[None, None, :])
    chan = jnp.arange(channels, dtype=jnp.int32)
    # float32 on purpose: the kernel broadcasts this row with an MXU outer
    # product (values < 2^24, exact in f32).
    csrc = (
        (csrc_pix[..., None] * channels + chan[None, None, None, :])
        .reshape(b, k, w3)
        .astype(jnp.float32)
    )

    kernel = functools.partial(
        _mosaic_kernel, height=h, width=w, channels=channels
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, kpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full (B, H, W*3) in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, w3), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, STRIP, w3), jnp.uint8),
            pltpu.VMEM((2, STRIP, w3), jnp.uint8),
            pltpu.VMEM((2, STRIP, kpad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # In-place semantics: the output aliases the frames operand, so the
        # kernel needs no pass-through copy (1.9 ms/batch-128 at 1080p). XLA
        # inserts a defensive copy only when the caller keeps the input
        # buffer live (e.g. bench loops re-feeding one device array);
        # callers that donate their frames run truly in place.
        input_output_aliases={3: 0},
        interpret=interpret,
    )(cboxes, ysrc, csrc, flat)
    return out
