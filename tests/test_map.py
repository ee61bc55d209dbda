"""mAP harness (benchmarks/map_eval.py): AP math, WIDER parsing, and the
get_map_txt-consuming end-to-end path (VERDICT r1 item 10; reference
face.py:185-230 exports detections for exactly this kind of evaluator)."""

import importlib.util
import os

import numpy as np
import pytest


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "map_eval.py",
    )
    spec = importlib.util.spec_from_file_location("map_eval", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


me = _load()


def test_ap_perfect_detector_is_one():
    gt = {
        "a": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
        "b": np.array([[5, 5, 15, 15]], float),
    }
    dets = {k: np.concatenate([v, np.ones((len(v), 1))], 1) for k, v in gt.items()}
    r = me.average_precision(dets, gt)
    assert r["ap"] == pytest.approx(1.0)
    assert r["recall"] == pytest.approx(1.0)
    assert r["precision"] == pytest.approx(1.0)


def test_ap_partial_hand_computed():
    """2 TPs over 3 GTs plus a low-ranked FP: AP = 2/3 exactly."""
    gt = {
        "a": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
        "b": np.array([[5, 5, 15, 15]], float),
    }
    dets = {
        "a": np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.1]]),
        "b": np.array([[5, 5, 15, 15, 0.8]]),
    }
    r = me.average_precision(dets, gt)
    assert r["ap"] == pytest.approx(2 / 3)
    # Same boxes but the FP ranked FIRST: precision at each TP drops.
    # PR points: (1/3, 1/2), (2/3, 2/3) -> AP = 1/3*1/2... monotonized:
    # mpre >= right-max -> p(1/3)=2/3, p(2/3)=2/3 -> AP = 2/3 * 2/3 = 4/9.
    dets2 = {
        "a": np.array([[0, 0, 10, 10, 0.5], [100, 100, 110, 110, 0.95]]),
        "b": np.array([[5, 5, 15, 15, 0.4]]),
    }
    r2 = me.average_precision(dets2, gt)
    assert r2["ap"] == pytest.approx(4 / 9)


def test_ap_duplicate_detections_count_as_fp():
    gt = {"a": np.array([[0, 0, 10, 10]], float)}
    dets = {
        "a": np.array([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8]])
    }
    r = me.average_precision(dets, gt)
    assert r["recall"] == pytest.approx(1.0)
    assert r["precision"] == pytest.approx(0.5)
    assert r["ap"] == pytest.approx(1.0)  # TP ranked above the duplicate


def test_wider_annotation_parser(tmp_path):
    txt = tmp_path / "wider.txt"
    txt.write_text(
        "0--Parade/0_Parade_1.jpg\n"
        "2\n"
        "10 20 30 40 0 0 0 0 0 0\n"
        "50 60 7 8 0 0 0 0 0 0\n"
        "1--Other/1_Other_1.jpg\n"
        "0\n"
        "0 0 0 0 0 0 0 0 0 0\n"
        "2--More/2_More_1.jpg\n"
        "1\n"
        "1 2 3 4 0 0 0 0 0 0\n"
    )
    gts = me.load_wider_annotations(str(txt))
    assert len(gts) == 3
    np.testing.assert_array_equal(
        gts["0--Parade/0_Parade_1.jpg"],
        [[10, 20, 40, 60], [50, 60, 57, 68]],
    )
    assert gts["1--Other/1_Other_1.jpg"].shape == (0, 4)
    np.testing.assert_array_equal(gts["2--More/2_More_1.jpg"], [[1, 2, 4, 6]])


def test_wider_parser_truncated_file_reports_location(tmp_path):
    from benchmarks.map_eval import load_wider_annotations

    bad = tmp_path / "trunc.txt"
    bad.write_text("img/a.jpg\n3\n1 2 3 4\n")  # declares 3 boxes, has 1
    with pytest.raises(ValueError, match="trunc.txt:4.*box 2/3"):
        load_wider_annotations(str(bad))
    bad2 = tmp_path / "nocount.txt"
    bad2.write_text("img/a.jpg\n")
    with pytest.raises(ValueError, match="expected a box count"):
        load_wider_annotations(str(bad2))


def test_evaluate_detector_end_to_end(tmp_path):
    """Full get_map_txt loop over a labeled synthetic set: a stub whose
    detections equal the ground truth must score AP 1.0 through the same
    code path real checkpoints will use."""
    import cv2

    rng = np.random.default_rng(0)
    keys, paths, gts = [], [], {}
    for i in range(3):
        key = f"img_{i}.jpg"
        path = str(tmp_path / key)
        cv2.imwrite(path, rng.integers(0, 255, (60, 80, 3), dtype=np.uint8))
        keys.append(key)
        paths.append(path)
        gts[key] = np.array([[5.0 + i, 6.0, 25.0 + i, 30.0]])

    class PerfectFace:
        def __init__(self):
            self._i = 0

        def get_map_txt(self, image):
            box = gts[keys[self._i]][0]
            self._i += 1
            return np.concatenate([box, [0.99] + [0.0] * 10])[None]

    r = me.evaluate_detector(PerfectFace(), paths, gts, keys)
    assert r["ap"] == pytest.approx(1.0)
    assert r["n_gt"] == 3 and r["n_det"] == 3


def test_selftest_cli():
    assert me._selftest()["selftest"] == "ok"


def test_plate_get_map_txt_shape_and_eval_path():
    """PlateDetector.get_map_txt returns (M, 6) rows usable by
    evaluate_detector (random weights: plumbing, not accuracy)."""
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.plate import PlateDetector

    plate = PlateDetector(
        model_path=None,
        confidence=0.0,  # random weights: keep whatever scores appear
        input_shape=(64, 64),
        max_detections=8,
        dtype=jnp.float32,
    )
    img = np.zeros((48, 64, 3), np.uint8)
    dets = plate.get_map_txt(img)
    assert dets.ndim == 2 and dets.shape[1] == 6
    # Rows slice cleanly into the (M, 5) the AP scorer consumes.
    five = dets[:, :5] if len(dets) else np.zeros((0, 5))
    r = me.average_precision(
        {"a": five}, {"a": np.array([[0, 0, 10, 10]], float)}
    )
    assert 0.0 <= r["ap"] <= 1.0
