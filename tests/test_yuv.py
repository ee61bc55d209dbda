"""Device I420 -> RGB conversion must be bit-exact to cv2 (the reference's
host conversion), verified EXHAUSTIVELY over all 16.7M (Y, U, V) triples."""

import cv2
import numpy as np

from video_desensitization_tpu.ops.yuv import (
    i420_to_rgb_u8,
    join_i420,
    rgb_to_i420_host,
    split_i420,
)


def test_i420_to_rgb_u8_exhaustive_vs_cv2():
    """Every (Y, U, V) combo: 64 images of 512x512 where each 2x2 luma block
    holds one (U, V) pair (65,536 per image = all of them) and four Y values
    (stepped per image)."""
    h = w = 512
    uv_u, uv_v = np.meshgrid(
        np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8)
    )  # (256, 256) -> one sample per chroma position
    u_plane = uv_u.reshape(h // 4, w)  # packed 2 chroma rows per buffer row
    v_plane = uv_v.reshape(h // 4, w)

    base = np.empty((h * 3 // 2, w), np.uint8)
    base[h : h + h // 4] = u_plane
    base[h + h // 4 :] = v_plane

    batch = []
    for step in range(64):
        img = base.copy()
        # 2x2 block Y values: step*4 .. step*4+3
        yblk = np.array(
            [[step * 4, step * 4 + 1], [step * 4 + 2, step * 4 + 3]], np.uint8
        )
        img[:h] = np.tile(yblk, (h // 2, w // 2))
        batch.append(img)
    batch = np.stack(batch)

    got = np.asarray(i420_to_rgb_u8(batch, h, w))
    for i in range(64):
        want = cv2.cvtColor(batch[i], cv2.COLOR_YUV2RGB_I420)
        np.testing.assert_array_equal(got[i], want, err_msg=f"step={i}")


def test_split_join_i420_roundtrip():
    rng = np.random.default_rng(0)
    yuv = rng.integers(0, 255, (3, 96, 64), dtype=np.uint8)
    y, u, v = split_i420(yuv, 64, 64)
    assert y.shape == (3, 64, 64) and u.shape == (3, 32, 32)
    np.testing.assert_array_equal(np.asarray(join_i420(y, u, v)), yuv)


def test_rgb_to_i420_host_matches_cv2():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        rgb_to_i420_host(rgb), cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV_I420)
    )
