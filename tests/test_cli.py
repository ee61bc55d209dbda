"""CLI entrypoint end-to-end: --video and --images modes (reference L6)."""

import os

import numpy as np
import pytest

from video_desensitization_tpu.cli.main import main
from video_desensitization_tpu.video.av import (
    VideoDecoder,
    VideoEncoder,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native av layer unavailable"
)


def _tiny_config(tmp_path, model_path="random", model_weights="random"):
    # Minimal config so build_engine uses small models (fast CPU compile).
    # 'random' is the explicit random-weights opt-in (tests have no ckpts).
    ini = tmp_path / "config.ini"
    ini.write_text(
        f"[PATHS]\nmodel_path={model_path}\nmodel_weights={model_weights}\n"
        "record_dir=\n"
        "output_h265_dir=\noutput_videos_dir=\ntemp_directory_base=\n"
        "record_output_dir=\n"
        "[SETTINGS]\nbatch_size=4\n"
        "[TPU]\ninput_size=128\nmax_detections=8\ndtype=float32\n"
        "confidence=0.01\n"
    )
    return str(ini)


def test_cli_refuses_random_weights_without_optin(tmp_path):
    """Empty model paths must error out, not silently run un-desensitized."""
    from video_desensitization_tpu.api.config import load_config
    from video_desensitization_tpu.cli.main import build_engine

    cfg = load_config(_tiny_config(tmp_path, model_path="", model_weights=""),
                      strict=False)
    with pytest.raises(ValueError, match="RANDOM weights"):
        build_engine(cfg, with_plates=False)
    # Explicit opt-in paths still construct.
    cfg2 = load_config(_tiny_config(tmp_path), strict=False)
    assert build_engine(cfg2, with_plates=False) is not None


@needs_native
def test_cli_video_mode(tmp_path):
    rng = np.random.default_rng(0)
    src = str(tmp_path / "in.mp4")
    with VideoEncoder(src, 160, 96, fps=10, codec="mpeg4") as e:
        for i in range(8):
            e.write(rng.integers(0, 255, (96, 160, 3), dtype=np.uint8))
    out = str(tmp_path / "out.mp4")
    rc = main([
        _tiny_config(tmp_path), "--video", src, "--out", out, "--no-plates",
    ])
    assert rc == 0
    with VideoDecoder(out) as dec:
        assert sum(1 for _ in dec) == 8


@needs_native
def test_stream_encode_kwargs_override(tmp_path):
    """encode_kwargs (config encode_preset/encode_bitrate) reach the libx265
    writer: the ultrafast output still round-trips with every frame."""
    from video_desensitization_tpu.api.config import load_config
    from video_desensitization_tpu.cli.main import build_engine
    from video_desensitization_tpu.pipeline.streaming import (
        process_video_stream,
    )

    cfg = load_config(_tiny_config(tmp_path), strict=False)
    engine = build_engine(cfg, with_plates=False)
    rng = np.random.default_rng(3)
    src = str(tmp_path / "in.h265")
    with VideoEncoder(src, 160, 96, fps=10, codec="libx265",
                      bitrate=200000, preset="ultrafast") as e:
        for i in range(6):
            e.write(rng.integers(0, 255, (96, 160, 3), dtype=np.uint8))
    out = str(tmp_path / "out.h265")
    stats = process_video_stream(
        src, out, engine, batch_size=4,
        encode_kwargs={"preset": "ultrafast", "bitrate": 500_000},
    )
    assert stats.frames == 6
    with VideoDecoder(out) as dec:
        assert sum(1 for _ in dec) == 6


def test_cli_images_mode(tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    for i in range(3):
        cv2.imwrite(
            str(imgdir / f"f{i}.jpg"),
            rng.integers(0, 255, (96, 160, 3), dtype=np.uint8),
        )
    outdir = str(tmp_path / "out")
    rc = main([
        _tiny_config(tmp_path), "--images", str(imgdir), "--out", outdir,
        "--no-plates",
    ])
    assert rc == 0
    outs = sorted(os.listdir(outdir))
    assert len(outs) == 3
    assert all(f.startswith("processed_") for f in outs)


def test_doctor_report(capsys):
    import json

    from video_desensitization_tpu.cli.doctor import main as doctor_main
    from video_desensitization_tpu.video.av import native_available

    rc = doctor_main(["--link"])
    report = json.loads(capsys.readouterr().out)
    # Without the native layer the report is degraded-but-valid (rc 1).
    assert (rc == 0) == report["ok"] == native_available()
    assert report["n_devices"] >= 1
    assert "link_h2d_gib_s" in report
    assert report["recommended_engine"] in ("tiered", "fused")


def test_engine_auto_probes_link_and_picks(tmp_path):
    from video_desensitization_tpu.api.config import load_config
    from video_desensitization_tpu.cli.main import (
        build_engine,
        pick_engine,
        probe_link_gib_s,
    )
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    assert probe_link_gib_s(size_mb=1, reps=1) > 0
    assert pick_engine(10.0) == "fused" and pick_engine(1.0) == "tiered"
    # yuv420 transport halves fused's link traffic -> lower crossover
    assert pick_engine(4.0) == "tiered"
    assert pick_engine(4.0, "yuv420") == "fused"
    assert pick_engine(1.0, "yuv420") == "tiered"
    ini = tmp_path / "auto.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=random\nmodel_weights=random\n"
        "record_dir=\noutput_h265_dir=\noutput_videos_dir=\n"
        "temp_directory_base=\nrecord_output_dir=\n"
        "[TPU]\nengine=auto\ninput_size=128\nmax_detections=8\ndtype=float32\n"
    )
    cfg = load_config(str(ini), strict=False)
    assert cfg.engine == "auto"
    engine = build_engine(cfg, with_plates=False)
    assert isinstance(engine, (TieredPipeline, DesensitizationEngine))
    assert cfg.engine == "auto"  # config is NOT mutated; each build re-probes


def test_cli_profile_flag_writes_trace(tmp_path):
    import cv2

    rng = np.random.default_rng(2)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    cv2.imwrite(
        str(imgdir / "f0.jpg"),
        rng.integers(0, 255, (96, 160, 3), dtype=np.uint8),
    )
    trace_dir = tmp_path / "trace"
    rc = main([
        _tiny_config(tmp_path), "--images", str(imgdir),
        "--out", str(tmp_path / "out"), "--no-plates",
        "--profile", str(trace_dir),
    ])
    assert rc == 0
    # jax.profiler writes plugins/profile/<ts>/*.xplane.pb under the dir.
    found = [f for _, _, fs in os.walk(trace_dir) for f in fs]
    assert any(f.endswith(".xplane.pb") for f in found)


@needs_native
def test_cli_record_job_end_to_end(tmp_path):
    """The config-driven record-job branch of the CLI: unpack -> detect ->
    mosaic -> repack through main([config.ini]) (reference __main__ flow)."""
    from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
    from video_desensitization_tpu.record.reader import RecordReader
    from video_desensitization_tpu.record.topics import (
        CAMERA_TOPICS,
        COMPRESSED_IMAGE_TYPE,
    )
    from video_desensitization_tpu.record.writer import RecordWriter
    from video_desensitization_tpu.video.av import PacketDemuxer

    h265 = str(tmp_path / "src.h265")
    with VideoEncoder(h265, 64, 64, fps=30, codec="libx265",
                      bitrate=200000, preset="ultrafast") as e:
        for i in range(6):
            e.write(np.full((64, 64, 3), i * 30, np.uint8))
    with PacketDemuxer(h265) as dm:
        pkts = dm.read_packets()
    (tmp_path / "in").mkdir()
    rec = str(tmp_path / "in" / "job.record")
    topic = CAMERA_TOPICS[0]
    with RecordWriter(rec) as w:
        w.write_channel(topic, COMPRESSED_IMAGE_TYPE)
        for i, p in enumerate(pkts):
            img = sp.CompressedImage(format="h265", data=p.data)
            img.header.sequence_num = i
            w.write_message(topic, img, 10**9 + i * 33_000_000)

    ini = tmp_path / "config.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=random\nmodel_weights=random\n"
        f"record_dir={tmp_path / 'in'}\n"
        f"output_h265_dir={tmp_path / 'h265'}\n"
        f"output_videos_dir={tmp_path / 'videos'}\n"
        f"temp_directory_base={tmp_path / 'tmp'}\n"
        f"record_output_dir={tmp_path / 'out'}\n"
        "[SETTINGS]\nbatch_size=4\n"
        "[TPU]\ninput_size=128\nmax_detections=8\ndtype=float32\n"
        "confidence=0.01\noutput_fps=30\n"
    )
    rc = main([str(ini), "--no-plates"])
    assert rc == 0
    final = tmp_path / "out" / "job.record"
    assert final.exists()
    msgs = list(RecordReader(str(final)).read_messages(topic))
    assert len(msgs) == len(pkts)


@needs_native
def test_stream_yuv420_transport_end_to_end(tmp_path):
    """transport=yuv420 with a fused engine: decoder I420 ->
    process_batch_yuv -> encoder I420, no RGB pass anywhere. The output
    must carry every frame at the source geometry; transport=rgb on the
    same input must count identical frames (content differs only by the
    colorspace roundtrip the rgb path performs)."""
    import jax.numpy as jnp

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine
    from video_desensitization_tpu.pipeline.streaming import (
        process_video_stream,
    )

    face = Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.3,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )
    engine = DesensitizationEngine(face, None, mosaic_level=8)
    rng = np.random.default_rng(6)
    src = str(tmp_path / "in.h265")
    with VideoEncoder(src, 160, 96, fps=10, codec="libx265",
                      bitrate=300000, preset="ultrafast") as e:
        for i in range(6):
            e.write(rng.integers(0, 255, (96, 160, 3), dtype=np.uint8))

    out_yuv = str(tmp_path / "out_yuv.h265")
    stats = process_video_stream(
        src, out_yuv, engine, batch_size=4, transport="yuv420",
        encode_kwargs={"preset": "ultrafast"},
    )
    assert stats.frames == 6
    with VideoDecoder(out_yuv) as dec:
        got = list(dec)
    assert len(got) == 6 and got[0].shape == (96, 160, 3)

    # transport=auto resolves to yuv420 for a fused engine
    out_auto = str(tmp_path / "out_auto.h265")
    stats2 = process_video_stream(
        src, out_auto, engine, batch_size=4, transport="auto",
        encode_kwargs={"preset": "ultrafast"},
    )
    assert stats2.frames == 6


def test_decoder_pending_rgb_stash(tmp_path):
    """The frame-retained contract of read_i420's fallback: a stashed RGB
    frame is returned by the next __next__ before any new decode."""
    rng = np.random.default_rng(7)
    src = str(tmp_path / "in.mp4")
    with VideoEncoder(src, 64, 64, fps=10, codec="libx264") as e:
        for i in range(2):
            e.write(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    with VideoDecoder(src) as dec:
        sentinel = np.full((64, 64, 3), 7, np.uint8)
        dec._pending_rgb = sentinel
        first = next(dec)
        np.testing.assert_array_equal(first, sentinel)
        rest = list(dec)
    assert len(rest) == 2
