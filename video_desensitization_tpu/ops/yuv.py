"""Planar YUV420 (I420) colorspace conversion, bit-exact to cv2, on device.

The fused engine's yuv420 IO mode ships decoded I420 frames to the chip
(half the bytes of RGB24) and mosaics the planes directly; only the
DETECTORS need RGB. This module reproduces cv2's fixed-point ITU-R BT.601
video-range conversion (``cv2.COLOR_YUV2RGB_I420``) exactly in int32
arithmetic, so a detector fed through this path sees bitwise the same
pixels as the reference host pipeline (cv2 decode -> cvtColor -> letterbox,
/root/reference/combine_detect.py:167-174) — the recall-parity story does
not change when the transport does.

cv2's kernel (imgproc color_yuv, ITUR_BT_601 coefficients, SHIFT=20):

    ruv = (1 << 19) + CVR * (V - 128)
    guv = (1 << 19) + CVG * (V - 128) + CUG * (U - 128)
    buv = (1 << 19) + CUB * (U - 128)
    y   = max(0, Y - 16) * CY
    R, G, B = sat_u8((y + {ruv, guv, buv}) >> 20)

with the chroma sample shared across each 2x2 luma block (nearest). All
intermediates fit int32 (|y + guv| < 2^30). Verified exhaustively over all
16.7M (Y, U, V) triples against cv2 in tests/test_yuv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ITU-R BT.601 video-range fixed-point coefficients (cv2 ITUR_BT_601_*).
_CY = 1220542
_CUB = 2116026
_CUG = -409993
_CVG = -852492
_CVR = 1673527
_SHIFT = 20


def split_i420(yuv: Array, height: int, width: int):
    """(B, H*3/2, W) planar I420 -> Y (B, H, W), U, V (B, H/2, W/2)."""
    b = yuv.shape[0]
    h, w = height, width
    y = yuv[:, :h, :]
    u = yuv[:, h : h + h // 4, :].reshape(b, h // 2, w // 2)
    v = yuv[:, h + h // 4 :, :].reshape(b, h // 2, w // 2)
    return y, u, v


def join_i420(y: Array, u: Array, v: Array) -> Array:
    """Inverse of :func:`split_i420`."""
    b, h, w = y.shape
    return jnp.concatenate(
        [y, u.reshape(b, h // 4, w), v.reshape(b, h // 4, w)], axis=1
    )


def _upsample2x(p: Array, h: int, w: int) -> Array:
    """Nearest 2x chroma upsample: each sample covers its 2x2 luma block."""
    b = p.shape[0]
    p = jnp.broadcast_to(
        p[:, :, None, :, None], (b, h // 2, 2, w // 2, 2)
    )
    return p.reshape(b, h, w)


def i420_to_rgb_u8(yuv: Array, height: int, width: int) -> Array:
    """(B, H*3/2, W) uint8 I420 -> (B, H, W, 3) uint8 RGB, bitwise cv2.

    Exact integer re-implementation of ``cv2.cvtColor(_, COLOR_YUV2RGB_I420)``
    — see module docstring. Runs inside jitted device programs.
    """
    y8, u8, v8 = split_i420(yuv, height, width)
    yv = jnp.maximum(y8.astype(jnp.int32) - 16, 0) * _CY
    uu = _upsample2x(u8, height, width).astype(jnp.int32) - 128
    vv = _upsample2x(v8, height, width).astype(jnp.int32) - 128

    half = 1 << (_SHIFT - 1)
    ruv = half + _CVR * vv
    guv = half + _CVG * vv + _CUG * uu
    buv = half + _CUB * uu

    def sat(acc):
        return jnp.clip(acc >> _SHIFT, 0, 255).astype(jnp.uint8)

    return jnp.stack([sat(yv + ruv), sat(yv + guv), sat(yv + buv)], axis=-1)


def rgb_to_i420_host(rgb: np.ndarray) -> np.ndarray:
    """Host RGB -> planar I420 via cv2 (BT.601, 2x2 chroma average)."""
    import cv2

    return cv2.cvtColor(np.ascontiguousarray(rgb, np.uint8), cv2.COLOR_RGB2YUV_I420)
