"""Padded NMS vs a literal numpy implementation of torchvision.ops.nms's
documented algorithm (greedy by descending score, suppress IoU strictly
greater than threshold) — the reference's NMS, utils_bbox.py:103-130."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_desensitization_tpu.ops.nms import batched_nms_padded, nms_padded

RNG = np.random.default_rng(7)


def random_dets(n, seed=None, w=640, h=640):
    rng = np.random.default_rng(seed)
    xy1 = rng.uniform(0, 0.8, (n, 2)) * [w, h]
    wh = rng.uniform(10, 150, (n, 2))
    boxes = np.concatenate([xy1, xy1 + wh], -1)
    scores = rng.uniform(0, 1, (n, 1))
    extras = rng.normal(size=(n, 10))
    return np.concatenate([boxes, scores, extras], -1).astype(np.float32)


def greedy_nms_numpy(dets, conf, iou_thr):
    dets = dets[dets[:, 4] >= conf]
    if len(dets) == 0:
        return np.zeros((0, 15), np.float32)
    # Stable sort descending by score (ties keep original order, like torch).
    order = np.argsort(-dets[:, 4], kind="stable")
    dets = dets[order]
    keep = []
    suppressed = np.zeros(len(dets), bool)
    boxes = dets[:, :4]
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    for i in range(len(dets)):
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-6)
        suppressed |= iou > iou_thr
        suppressed[i] = True
    return dets[keep]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("conf,iou", [(0.5, 0.45), (0.5, 0.4), (0.02, 0.3)])
def test_nms_matches_torchvision(seed, conf, iou):
    # top_k must cover every above-threshold candidate for exact parity; the
    # production pipeline sizes top_k to the padded detection budget.
    dets = random_dets(300, seed=seed)
    want = greedy_nms_numpy(dets, conf, iou)
    got, keep = nms_padded(jnp.asarray(dets), conf, iou, top_k=300)
    got = np.asarray(got)[np.asarray(keep)]
    assert got.shape == want.shape
    # Both sort by score descending; rows should align.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nms_empty():
    dets = random_dets(100, seed=9)
    dets[:, 4] = 0.0
    got, keep = nms_padded(jnp.asarray(dets), 0.5, 0.45, top_k=64)
    assert not bool(np.asarray(keep).any())
    assert np.asarray(got).sum() == 0.0


def test_nms_identical_boxes_suppressed():
    box = np.array([10.0, 10.0, 50.0, 50.0])
    dets = np.zeros((5, 15), np.float32)
    dets[:, :4] = box
    dets[:, 4] = [0.9, 0.8, 0.7, 0.6, 0.55]
    got, keep = nms_padded(jnp.asarray(dets), 0.5, 0.45, top_k=5)
    assert int(np.asarray(keep).sum()) == 1
    assert float(np.asarray(got)[0, 4]) == pytest.approx(0.9)


def test_batched_matches_single():
    dets = np.stack([random_dets(200, seed=s) for s in range(3)])
    got_b, keep_b = batched_nms_padded(jnp.asarray(dets), 0.5, 0.4, top_k=128)
    for b in range(3):
        got_s, keep_s = nms_padded(jnp.asarray(dets[b]), 0.5, 0.4, top_k=128)
        np.testing.assert_array_equal(np.asarray(keep_b[b]), np.asarray(keep_s))
        np.testing.assert_allclose(np.asarray(got_b[b]), np.asarray(got_s))


def test_nms_jit_compatible():
    import jax

    dets = random_dets(300, seed=11)
    f = jax.jit(lambda d: nms_padded(d, 0.5, 0.45, 300))
    got, keep = f(jnp.asarray(dets))
    want = greedy_nms_numpy(dets, 0.5, 0.45)
    got = np.asarray(got)[np.asarray(keep)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nms_deep_suppression_chain():
    # Adversarial case for the Jacobi-fixpoint formulation: a chain where
    # box i overlaps only box i+1 (IoU ~0.54 > thr; skip-one IoU 0.25 < thr)
    # with scores descending. Greedy keeps the even-indexed boxes; the
    # fixpoint needs ~N/2 rounds (maximum chain depth) to converge, so this
    # pins termination + exactness at the sequential-dependency worst case.
    n = 64
    dets = np.zeros((n, 15), np.float32)
    for i in range(n):
        dets[i, :4] = [i * 30.0, 0.0, i * 30.0 + 100.0, 100.0]
        dets[i, 4] = 1.0 - i * 1e-3
    want = greedy_nms_numpy(dets, 0.5, 0.45)
    got, keep = nms_padded(jnp.asarray(dets), 0.5, 0.45, top_k=n)
    keep = np.asarray(keep)
    assert int(keep.sum()) == n // 2
    assert np.array_equal(np.flatnonzero(keep), np.arange(0, n, 2))
    np.testing.assert_allclose(
        np.asarray(got)[keep], want, rtol=1e-5, atol=1e-5
    )
