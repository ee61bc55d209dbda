"""End-to-end trainer driver: cli/train.py over a synthetic labeled set.

Covers the full loop the reference never had: label parsing -> anchor-target
encoding -> sharded train step -> orbax checkpoint -> resume -> msgpack
export that loads straight into the inference wrapper.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_desensitization_tpu.cli.train import main, parse_args, train

HW = 64


@pytest.fixture()
def synthetic_set(tmp_path):
    import cv2

    lines = []
    for i in range(8):
        img = np.zeros((80, 96, 3), np.uint8)
        x0, y0 = 10 + 5 * i, 18
        img[y0 : y0 + 26, x0 : x0 + 26] = 255
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"), img)
        lines.append(f"# im{i}.jpg\n{x0} {y0} 26 26\n")
    (tmp_path / "label.txt").write_text("".join(lines))
    return tmp_path


def _argv(tmp_path, **over):
    base = {
        "--labels": str(tmp_path / "label.txt"),
        "--images": str(tmp_path),
        "--backbone": "mobilenet",
        "--input-size": str(HW),
        "--epochs": "2",
        "--batch-size": "4",
        "--max-gt": "8",
        "--lr": "1e-3",
        "--milestones": "100",
        "--warmup-epochs": "0.5",
        "--log-every": "1",
    }
    base.update(over)
    argv = []
    for k, v in base.items():
        if v is not None:
            argv += [k, v]
    return argv


def test_train_cli_end_to_end(synthetic_set, tmp_path):
    ckpt_dir = tmp_path / "ckpts"
    export = tmp_path / "face.msgpack"
    state = train(
        parse_args(
            _argv(
                synthetic_set,
                **{
                    "--ckpt-dir": str(ckpt_dir),
                    "--save-every": "1",
                    "--export": str(export),
                },
            )
        )
    )
    # 8 images / batch 4 = 2 steps/epoch * 2 epochs.
    assert int(state.step) == 4
    assert sorted(os.listdir(ckpt_dir)) == ["ep0001", "ep0002"]
    assert export.exists()

    # The export loads straight into the inference wrapper and runs.
    from video_desensitization_tpu.detect.face import Retinaface

    face = Retinaface(
        model_path=str(export),
        backbone="mobilenet",
        input_shape=[HW, HW, 3],
        confidence=0.01,
        max_detections=8,
        dtype=jnp.float32,
    )
    img = np.zeros((80, 96, 3), np.uint8)
    img[18:44, 10:36] = 255
    results = face.detect_images([img])
    assert len(results) == 1  # runs end to end; boxes may or may not pass conf

    # Exported weights equal the final state bit-for-bit.
    leaf = jax.tree.leaves(face.variables["params"])[0]
    leaf_t = jax.tree.leaves(jax.device_get(state.params))[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf_t))


def test_train_cli_resume_continues_step_count(synthetic_set, tmp_path):
    ckpt_dir = tmp_path / "ck"
    train(
        parse_args(
            _argv(synthetic_set, **{"--epochs": "1", "--ckpt-dir": str(ckpt_dir)})
        )
    )
    state = train(
        parse_args(
            _argv(
                synthetic_set,
                **{
                    "--epochs": "2",
                    "--ckpt-dir": str(ckpt_dir),
                    "--resume": str(ckpt_dir / "ep0001"),
                },
            )
        )
    )
    assert int(state.step) == 4  # resumed at 2, ran epoch 2 only


def test_train_cli_sharded_runs_on_mesh(synthetic_set):
    state = train(
        parse_args(
            _argv(
                synthetic_set,
                **{"--mesh-data": "4", "--epochs": "1"},
            )
        )
    )
    assert int(state.step) == 2
    assert len(jax.tree.leaves(state.params)[0].sharding.device_set) >= 1


def test_train_cli_rejects_empty_labels(tmp_path):
    (tmp_path / "label.txt").write_text("")
    with pytest.raises(ValueError, match="no annotations"):
        train(parse_args(_argv(tmp_path)))


def test_train_cli_main_smoke(synthetic_set):
    assert main(_argv(synthetic_set, **{"--epochs": "1"})) == 0


def test_train_cli_validation_split(synthetic_set):
    # The package logger sets propagate=False (orbax/absl double-emission),
    # so capture with a handler on the logger itself, not caplog/root.
    import logging

    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    logger = logging.getLogger("VideoProcessor.train")
    logger.addHandler(handler)
    old_level = logger.level
    logger.setLevel(logging.INFO)  # effective level is WARNING if the CLI's
    try:                           # setup_logger never ran in this process
        state = train(
            parse_args(
                _argv(synthetic_set, **{"--epochs": "1", "--val-frac": "0.5"})
            )
        )
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)
    # 8 images, half held out -> 1 train step; validation ran and logged.
    assert int(state.step) == 1
    assert any("validation: loss" in m for m in records), records


def test_train_cli_val_frac_rejects_degenerate_split(synthetic_set):
    with pytest.raises(ValueError, match="leaves no train data"):
        train(parse_args(_argv(synthetic_set, **{"--val-frac": "1.0"})))
