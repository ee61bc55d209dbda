"""Pallas mosaic kernel parity (interpret mode — no TPU required).

The kernel must be bit-identical to the reference cv2 mosaic
(ops.mosaic.mosaic_host_reference) for every geometry: short/tall/thin
boxes, clipped boxes, overlapping boxes, full-frame boxes, and invalid
(masked) entries.
"""

import numpy as np
import pytest

from video_desensitization_tpu.ops.mosaic import mosaic_host_reference
from video_desensitization_tpu.ops.pallas_mosaic import (
    PAD,
    mosaic_boxes_batch_pallas,
    pallas_mosaic_supported,
)

H, W = 256, 128  # W*3 = 384 = 3*128 lanes


@pytest.fixture(scope="module")
def frame():
    return np.random.default_rng(0).integers(0, 255, (H, W, 3), dtype=np.uint8)


CASES = {
    "short": [[10, 20, 60, 90]],
    "tall_multi_strip": [[50, 70, 100, 200]],
    "clipped_oob": [[-5, 240, 200, 400]],
    "overlapping": [[10, 20, 60, 90], [50, 70, 100, 200]],
    "full_frame": [[0, 0, W, H]],
    "thin": [[30, 30, 34, 37], [100, 10, W, 30]],
    "many": [[i * 7, i * 11 % 200, i * 7 + 20, i * 11 % 200 + 31] for i in range(8)],
    # Ownership-grid edge cases: the bottom strip's DMA window clamps to
    # H - OUT_ROWS (write region overlaps the strip above), and boxes with
    # y1 < PAD clamp the input window to row 0.
    "bottom_edge_single_strip": [[10, 200, 90, H]],
    "top_unaligned": [[5, 3, 80, 130]],
    "bottom_overlap_pair": [[10, 150, 100, H], [40, 180, 120, 250]],
    "tall_unaligned_to_bottom": [[20, 13, 90, 247]],
    "full_frame_then_bottom": [[0, 0, W, H], [30, 200, 60, H]],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_kernel_bitwise_parity(frame, name):
    bl = CASES[name]
    k = max(8, len(bl))
    boxes = np.array([bl + [[0, 0, 0, 0]] * (k - len(bl))], np.int32)
    valid = np.array([[True] * len(bl) + [False] * (k - len(bl))])
    out = np.asarray(
        mosaic_boxes_batch_pallas(frame[None], boxes, valid, 8, interpret=True)
    )[0]
    np.testing.assert_array_equal(out, mosaic_host_reference(frame, bl, 8))


def test_minimum_height_heavy_clamp():
    """H=136 forces near-total window overlap between the two strips of a
    full-height box (the bottom strip's window and write region clamp hard
    against H - OUT_ROWS / H - STRIP)."""
    h = 136
    f = np.random.default_rng(3).integers(0, 255, (h, W, 3), dtype=np.uint8)
    bl = [[0, 0, W, h], [20, 5, 100, 130]]
    boxes = np.array([bl + [[0, 0, 0, 0]] * 6], np.int32)
    valid = np.array([[True, True] + [False] * 6])
    out = np.asarray(
        mosaic_boxes_batch_pallas(f[None], boxes, valid, 8, interpret=True)
    )[0]
    np.testing.assert_array_equal(out, mosaic_host_reference(f, bl, 8))


def test_no_valid_boxes_is_identity(frame):
    boxes = np.zeros((1, 4, 4), np.int32)
    valid = np.zeros((1, 4), bool)
    out = np.asarray(
        mosaic_boxes_batch_pallas(frame[None], boxes, valid, 8, interpret=True)
    )[0]
    np.testing.assert_array_equal(out, frame)


def test_support_envelope():
    assert pallas_mosaic_supported(1080, 1920, 8)
    assert pallas_mosaic_supported(H, W, 8)
    assert not pallas_mosaic_supported(64, W, 8)  # too short for STRIP
    assert not pallas_mosaic_supported(H, 100, 8)  # lanes not 128-aligned
    assert not pallas_mosaic_supported(H, W, PAD)  # level too big for PAD


PADDED_GEOMETRIES = {
    # (h, w): geometries outside the native envelope — the wrapper pads to
    # (max(128, ceil8(h)), ceil128(w)) and crops back.
    "odd_width": (H, 100),
    "odd_both": (250, 91),
    "tiny": (96, 120),
    "portrait_slice": (200, 72),
}


@pytest.mark.parametrize("name", sorted(PADDED_GEOMETRIES))
def test_padded_envelope_bitwise_parity(name):
    h, w = PADDED_GEOMETRIES[name]
    f = np.random.default_rng(7).integers(0, 255, (h, w, 3), dtype=np.uint8)
    bl = [
        [5, 5, min(60, w), min(80, h)],
        [w // 3, h // 2, w - 2, h - 1],
        [0, 0, w, h],
    ]
    boxes = np.array([bl + [[0, 0, 0, 0]] * 5], np.int32)
    valid = np.array([[True] * 3 + [False] * 5])
    out = np.asarray(
        mosaic_boxes_batch_pallas(f[None], boxes, valid, 8, interpret=True)
    )[0]
    np.testing.assert_array_equal(out, mosaic_host_reference(f, bl, 8))


def test_padded_envelope_clips_spilling_boxes_to_original_frame():
    """A box spilling past the ORIGINAL frame edge must be clipped before
    padding: clipping to the padded extent instead would change the box
    extent and with it the composed pixelation table inside the visible
    area."""
    h, w = 250, 91
    f = np.random.default_rng(9).integers(0, 255, (h, w, 3), dtype=np.uint8)
    bl = [[40, 100, w + 30, h + 60], [-10, -5, 50, 40]]
    boxes = np.array([bl + [[0, 0, 0, 0]] * 6], np.int32)
    valid = np.array([[True, True] + [False] * 6])
    out = np.asarray(
        mosaic_boxes_batch_pallas(f[None], boxes, valid, 8, interpret=True)
    )[0]
    np.testing.assert_array_equal(out, mosaic_host_reference(f, bl, 8))


def test_oversized_level_falls_back(frame):
    """A mosaic level beyond the kernel's PAD lookback routes to the XLA
    path with identical results."""
    lvl = PAD  # 2*PAD + 2 > PAD
    bl = [[5, 5, 100, 200]]
    boxes = np.array([bl], np.int32)
    valid = np.array([[True]])
    out = np.asarray(
        mosaic_boxes_batch_pallas(frame[None], boxes, valid, lvl, interpret=True)
    )[0]
    np.testing.assert_array_equal(out, mosaic_host_reference(frame, bl, lvl))


def test_single_plane_kernel_bitwise_parity():
    """channels=1: the kernel mosaics a bare (B, H, W) plane — the YUV420
    path's building block. Same golden oracle, single-channel."""
    f = np.random.default_rng(11).integers(0, 255, (H, W, 1), dtype=np.uint8)
    for name in ("short", "overlapping", "bottom_overlap_pair", "full_frame"):
        bl = CASES[name]
        k = max(8, len(bl))
        boxes = np.array([bl + [[0, 0, 0, 0]] * (k - len(bl))], np.int32)
        valid = np.array([[True] * len(bl) + [False] * (k - len(bl))])
        out = np.asarray(
            mosaic_boxes_batch_pallas(f[None], boxes, valid, 8, interpret=True)
        )[0]
        want = mosaic_host_reference(f[..., 0], bl, 8)[..., None]
        np.testing.assert_array_equal(out, want, err_msg=name)


def test_i420_pallas_bitwise_vs_host_oracle():
    from video_desensitization_tpu.ops.mosaic import mosaic_i420_host_inplace
    from video_desensitization_tpu.ops.pallas_mosaic import (
        mosaic_i420_batch_pallas,
    )

    h, w = 256, 256  # Y natively supported; chroma (128, 256) stacked
    yuv = np.random.default_rng(13).integers(
        0, 255, (2, h * 3 // 2, w), dtype=np.uint8
    )
    bl = [[10, 20, 60, 90], [35, 50, 220, 210], [200, 100, 300, 300]]
    boxes = np.array([bl, bl], np.int32)
    valid = np.array([[True, True, True], [True, False, True]])
    out = np.asarray(mosaic_i420_batch_pallas(yuv, boxes, valid, 8, interpret=True))
    for i in range(2):
        kept = [b for b, v in zip(bl, valid[i]) if v]
        want = mosaic_i420_host_inplace(yuv[i].copy(), kept, 8)
        np.testing.assert_array_equal(out[i], want)


def test_two_channel_interleaved_parity():
    """channels=2: interleaved U|V chroma — one box list mosaics both
    channels; each channel must match the single-channel host oracle."""
    f = np.random.default_rng(17).integers(0, 255, (H, W, 2), dtype=np.uint8)
    bl = CASES["overlapping"]
    boxes = np.array([bl + [[0, 0, 0, 0]] * 6], np.int32)
    valid = np.array([[True] * 2 + [False] * 6])
    out = np.asarray(
        mosaic_boxes_batch_pallas(f[None], boxes, valid, 4, interpret=True)
    )[0]
    for ch in range(2):
        np.testing.assert_array_equal(
            out[..., ch], mosaic_host_reference(f[..., ch], bl, 4)
        )
