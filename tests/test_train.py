"""Training subsystem: multibox loss behavior and the sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_desensitization_tpu.models.configs import cfg_mnet
from video_desensitization_tpu.models.retinaface import RetinaFace
from video_desensitization_tpu.ops.anchors import generate_anchors, num_anchors
from video_desensitization_tpu.parallel.mesh import make_mesh
from video_desensitization_tpu.train.losses import multibox_loss
from video_desensitization_tpu.train.step import create_train_state, make_train_step

HW = (64, 64)


def _batch(b, a, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.normal(0, 1, (b, *HW, 3)).astype(np.float32),
        "loc_t": rng.normal(0, 1, (b, a, 4)).astype(np.float32),
        "landm_t": rng.normal(0, 1, (b, a, 10)).astype(np.float32),
        "labels": rng.integers(-1, 2, (b, a)).astype(np.int32),
    }


def test_multibox_loss_ignores_neutral_anchors():
    a = 16
    rng = np.random.default_rng(1)
    loc = jnp.asarray(rng.normal(0, 1, (2, a, 4)).astype(np.float32))
    cls = jnp.asarray(rng.normal(0, 1, (2, a, 2)).astype(np.float32))
    landm = jnp.asarray(rng.normal(0, 1, (2, a, 10)).astype(np.float32))
    loc_t = jnp.zeros((2, a, 4), jnp.float32)
    landm_t = jnp.zeros((2, a, 10), jnp.float32)

    labels_all_bg = jnp.zeros((2, a), jnp.int32)
    total, metrics = multibox_loss(loc, cls, landm, loc_t, landm_t, labels_all_bg)
    # No positives: localization and landmark terms vanish (label -1 means
    # "face without landmarks" and still counts positive, matching the
    # reference objective).
    assert float(metrics["loss_loc"]) == 0.0
    assert float(metrics["loss_landm"]) == 0.0
    assert np.isfinite(float(total))


def test_train_step_decreases_loss():
    model = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.float32)
    tx = optax.sgd(1e-2)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), HW, tx)
    anchors = generate_anchors(HW, min_sizes=cfg_mnet["min_sizes"], steps=cfg_mnet["steps"])
    a = num_anchors(HW, steps=cfg_mnet["steps"])
    step = make_train_step(model, tx, anchors)
    batch = _batch(4, a)

    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_train_step_bfloat16_compute_keeps_f32_params():
    """Mixed precision: bf16 forward/backward, f32 master weights/loss.
    (cli/train.py --compute-dtype bfloat16 constructs exactly this model.)"""
    model = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.bfloat16)
    tx = optax.sgd(1e-2)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), HW, tx)
    # Flax param_dtype default: parameters stay float32 under bf16 compute.
    assert all(
        p.dtype == jnp.float32 for p in jax.tree.leaves(state.params)
    )
    anchors = generate_anchors(HW, min_sizes=cfg_mnet["min_sizes"],
                               steps=cfg_mnet["steps"])
    a = num_anchors(HW, steps=cfg_mnet["steps"])
    step = make_train_step(model, tx, anchors)
    batch = _batch(4, a)
    before = jax.tree.leaves(state.params)[0].copy()
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # still learns under bf16 compute
    after = jax.tree.leaves(state.params)[0]
    assert after.dtype == jnp.float32
    assert not np.array_equal(np.asarray(before), np.asarray(after))


def test_sharded_step_matches_single_device():
    model = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.float32)
    anchors = generate_anchors(HW, min_sizes=cfg_mnet["min_sizes"], steps=cfg_mnet["steps"])
    a = num_anchors(HW, steps=cfg_mnet["steps"])
    batch = _batch(8, a)

    tx1 = optax.sgd(1e-2)
    s1, tx1 = create_train_state(model, jax.random.PRNGKey(0), HW, tx1)
    step1 = make_train_step(model, tx1, anchors)
    s1, m1 = step1(s1, batch)

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    tx2 = optax.sgd(1e-2)
    s2, tx2 = create_train_state(model, jax.random.PRNGKey(0), HW, tx2, mesh=mesh)
    step2 = make_train_step(model, tx2, anchors, mesh=mesh)
    s2, m2 = step2(s2, batch)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-5
    )
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip_and_mesh_restore(tmp_path):
    """Orbax TrainState round-trip: save after one step, restore bit-exact;
    restore WITH a mesh places leaves in the train-step sharding layout and
    the resumed step continues from the saved step count."""
    from video_desensitization_tpu.train.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    model = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.float32)
    anchors = generate_anchors(HW, min_sizes=cfg_mnet["min_sizes"],
                               steps=cfg_mnet["steps"])
    a = num_anchors(HW, steps=cfg_mnet["steps"])
    batch = _batch(8, a)

    tx = optax.sgd(1e-2, momentum=0.9)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), HW, tx)
    step = make_train_step(model, tx, anchors)
    state, _ = step(state, batch)

    path = str(tmp_path / "ckpt")
    save_train_state(path, state)

    # Plain restore: bit-exact tree equality.
    template, _ = create_train_state(model, jax.random.PRNGKey(1), HW, tx)
    restored = restore_train_state(path, template)
    assert int(restored.step) == 1
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # Mesh restore: sharded placement + a continued step matches the
    # unsharded continuation.
    mesh = make_mesh()
    restored_m = restore_train_state(path, template, mesh=mesh)
    assert len(jax.tree.leaves(restored_m.params)[0].sharding.device_set) >= 1
    step_m = make_train_step(model, tx, anchors, mesh=mesh)
    cont_m, mm = step_m(restored_m, batch)
    cont, m = step(state, batch)
    assert int(cont_m.step) == int(cont.step) == 2
    np.testing.assert_allclose(float(mm["loss"]), float(m["loss"]),
                               rtol=1e-5, atol=1e-5)


def test_retinaface_label_parser(tmp_path):
    from video_desensitization_tpu.train.data import load_retinaface_labels

    txt = tmp_path / "label.txt"
    txt.write_text(
        "# 0--Parade/a.jpg\n"
        "10 20 30 40 1.0 2.0 0.0 3.0 4.0 0.0 5.0 6.0 0.0 7.0 8.0 0.0 9.0 10.0 0.0 0.9\n"
        "50 60 7 8 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 0.8\n"
        "# 1--Other/b.jpg\n"
        "1 2 3 4\n"
        "5 6 0 0\n"  # degenerate box dropped
    )
    labels = load_retinaface_labels(str(txt))
    assert set(labels) == {"0--Parade/a.jpg", "1--Other/b.jpg"}
    a = labels["0--Parade/a.jpg"]
    assert a.shape == (2, 14)
    np.testing.assert_array_equal(a[0, :4], [10, 20, 40, 60])
    np.testing.assert_array_equal(a[0, 4:6], [1.0, 2.0])
    assert (a[1, 4:] == -1).all()  # unannotated landmarks masked
    b = labels["1--Other/b.jpg"]
    assert b.shape == (1, 14)
    np.testing.assert_array_equal(b[0, :4], [1, 2, 4, 6])


def test_letterbox_annotations_preserves_edge_boxes_and_sentinels():
    """Boxes of partially-out-of-frame faces (negative x1/y1 in WIDER) must
    be clipped into the frame — NOT clobbered to the landmark sentinel —
    while unannotated landmarks keep their -1."""
    from video_desensitization_tpu.train.data import _letterbox_annotations

    ann = np.array(
        [[-5.0, 10.0, 25.0, 50.0] + [-1.0] * 10],  # edge face, no landmarks
        np.float64,
    )
    out = _letterbox_annotations(ann, src_hw=(100, 100), dst_hw=(200, 200))
    # x1 clipped to 0 then letterboxed: must be a valid in-canvas coord.
    assert 0.0 <= out[0, 0] < out[0, 2] <= 1.0
    assert 0.0 <= out[0, 1] < out[0, 3] <= 1.0
    assert (out[0, 4:] == -1.0).all()  # sentinel untouched
    # Annotated landmarks transform normally alongside a clipped box.
    ann2 = np.array([[-5.0, 10.0, 25.0, 50.0, 3.0, 12.0] + [-1.0] * 8])
    out2 = _letterbox_annotations(ann2, (100, 100), (200, 200))
    assert 0.0 <= out2[0, 4] <= 1.0 and 0.0 <= out2[0, 5] <= 1.0
    assert (out2[0, 6:] == -1.0).all()


def test_batch_iterator_and_overfit_one_batch(tmp_path):
    """End-to-end training smoke: encode a labeled synthetic set through the
    data pipeline and overfit one batch — the loss must drop hard."""
    import cv2

    from video_desensitization_tpu.train.data import (
        batch_iterator,
        load_retinaface_labels,
        multistep_lr,
    )

    # Synthetic set: white squares on black, box = the square.
    lines = []
    for i in range(4):
        img = np.zeros((80, 96, 3), np.uint8)
        x0, y0 = 12 + 6 * i, 20
        img[y0 : y0 + 24, x0 : x0 + 24] = 255
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"), img)
        lines.append(f"# im{i}.jpg\n{x0} {y0} 24 24\n")
    (tmp_path / "label.txt").write_text("".join(lines))

    labels = load_retinaface_labels(str(tmp_path / "label.txt"))
    anchors = generate_anchors(HW, min_sizes=cfg_mnet["min_sizes"],
                               steps=cfg_mnet["steps"])
    batches = list(
        batch_iterator(labels, str(tmp_path), HW, anchors, batch_size=4,
                       max_gt=8)
    )
    assert len(batches) == 1
    batch = batches[0]
    assert batch["images"].shape == (4, *HW, 3)
    a = num_anchors(HW, steps=cfg_mnet["steps"])
    assert batch["loc_t"].shape == (4, a, 4)
    assert batch["labels"].shape == (4, a)
    # every image has exactly one face; force-matching guarantees >=1
    # positive anchor each (label -1 = positive without landmarks)
    assert (np.abs(batch["labels"]).sum(axis=1) >= 1).all()

    model = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.float32)
    lr = multistep_lr(1e-3, milestones=[1000], warmup_steps=5)
    tx = optax.sgd(lr, momentum=0.9)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), HW, tx)
    step = make_train_step(model, tx, anchors)
    first = None
    for _ in range(30):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
