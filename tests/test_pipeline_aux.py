"""Tests for pipeline auxiliaries: resume manifest, engine config switch."""

import json
import os

import numpy as np

from video_desensitization_tpu.api.config import PipelineConfig, load_config
from video_desensitization_tpu.pipeline.video_pipeline import JobManifest


def test_manifest_roundtrip(tmp_path):
    out = str(tmp_path)
    m = JobManifest(out)
    assert not m.is_done("/x/topic_rear.h265")

    produced = tmp_path / "topic_rear_processed.h265"
    produced.write_bytes(b"x")
    m.mark("/x/topic_rear.h265", str(produced), frames=10, faces=2, plates=1)
    assert m.is_done("/x/topic_rear.h265")

    # Reload from disk (fresh process).
    m2 = JobManifest(out)
    assert m2.is_done("/x/topic_rear.h265")
    assert m2.done["/x/topic_rear.h265"]["frames"] == 10

    # Output deleted -> not done (forces reprocessing).
    produced.unlink()
    m3 = JobManifest(out)
    assert not m3.is_done("/x/topic_rear.h265")


def test_manifest_same_basename_different_dirs(tmp_path):
    """Two streams with the same filename in different subdirs must not
    collide in the manifest (keys are root-relative paths)."""
    root = str(tmp_path / "hevcs")
    os.makedirs(os.path.join(root, "a"))
    os.makedirs(os.path.join(root, "b"))
    out = str(tmp_path / "out")
    os.makedirs(out)
    m = JobManifest(out, root=root)

    produced = tmp_path / "out" / "cam_processed.h265"
    produced.write_bytes(b"x")
    m.mark(os.path.join(root, "a", "cam.h265"), str(produced), frames=5)
    assert m.is_done(os.path.join(root, "a", "cam.h265"))
    assert not m.is_done(os.path.join(root, "b", "cam.h265"))
    assert set(m.done) == {os.path.join("a", "cam.h265")}


def test_manifest_corrupt_file_ignored(tmp_path):
    (tmp_path / JobManifest.NAME).write_text("{not json")
    m = JobManifest(str(tmp_path))
    assert m.done == {}


def test_config_engine_and_resume_keys(tmp_path):
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=a\nmodel_weights=b\nrecord_dir=c\n"
        "output_h265_dir=d\noutput_videos_dir=e\ntemp_directory_base=f\n"
        "record_output_dir=g\n"
        "[TPU]\nengine=fused\nresume=false\ntransfer=yuv420\nco_batch=true\n"
    )
    cfg = load_config(str(ini))
    assert cfg.engine == "fused"
    assert cfg.resume is False
    assert cfg.transfer == "yuv420"
    assert cfg.co_batch is True

    # Defaults
    assert PipelineConfig().engine == "tiered"
    assert PipelineConfig().resume is True
    assert PipelineConfig().transfer == "rgb"


def test_config_encode_settings(tmp_path):
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=a\nmodel_weights=b\nrecord_dir=c\n"
        "output_h265_dir=d\noutput_videos_dir=e\ntemp_directory_base=f\n"
        "record_output_dir=g\n"
        "[SETTINGS]\nencode_preset=ultrafast\nencode_bitrate=2000000\n"
    )
    cfg = load_config(str(ini))
    assert cfg.encode_preset == "ultrafast"
    assert cfg.encode_bitrate == 2_000_000
    assert cfg.encode_kwargs == {"preset": "ultrafast", "bitrate": 2_000_000}
    # Defaults are the reference repack parameters (SURVEY C2).
    assert PipelineConfig().encode_kwargs == {
        "preset": "medium",
        "bitrate": 10_000_000,
    }


def test_stage_timer_accumulates_and_reports():
    import time

    from video_desensitization_tpu.utils.timers import StageTimer

    t = StageTimer()
    for _ in range(3):
        with t.stage("work"):
            time.sleep(0.01)
    with t.stage("other"):
        pass
    rep = t.report()
    assert rep["work"] >= 0.03 and t.counts["work"] == 3
    assert t.counts["other"] == 1
    s = t.summary()
    assert "work" in s and "(x3)" in s
    # A raising stage still records its time.
    try:
        with t.stage("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert t.counts["boom"] == 1


def test_logger_hierarchy_and_file_sink(tmp_path):
    import logging

    from video_desensitization_tpu.utils.logging import get_logger, setup_logger

    logf = tmp_path / "proc.log"
    root = setup_logger(log_file=str(logf))
    assert root.name == "VideoProcessor"
    child = get_logger("unit_test_child")
    assert child.name == "VideoProcessor.unit_test_child"
    child.debug("debug-level message lands in the file sink")
    for h in root.handlers:
        h.flush()
    if logf.exists():  # file handler may be from an earlier setup call
        assert "debug-level message" in logf.read_text()
