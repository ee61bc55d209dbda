"""Native video layer: encode/decode/demux roundtrips, NAL parsing,
frame extraction and assembly parity APIs."""

import os

import numpy as np
import pytest

from video_desensitization_tpu.video.av import (
    PacketDemuxer,
    VideoDecoder,
    VideoEncoder,
    native_available,
)
from video_desensitization_tpu.video.frames import (
    convert_video_to_frames,
    create_video,
    iter_frames,
)
from video_desensitization_tpu.video.nal import (
    is_hevc_keyframe,
    iter_nal_units,
    hevc_nal_type,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native av layer unavailable"
)


def _gradient_frames(n=8, h=96, w=128):
    out = []
    for i in range(n):
        y = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        x = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        f = np.stack([np.full((h, w), i * 25, np.uint8),
                      np.broadcast_to(y, (h, w)),
                      np.broadcast_to(x, (h, w))], -1)
        out.append(f)
    return out


@needs_native
@pytest.mark.parametrize("ext,codec", [("mp4", "libx264"), ("h265", "libx265"), ("avi", "mjpeg")])
def test_encode_decode_roundtrip(tmp_path, ext, codec):
    frames = _gradient_frames()
    p = str(tmp_path / f"t.{ext}")
    with VideoEncoder(p, 128, 96, fps=30, codec=codec) as e:
        for f in frames:
            e.write(f)
    assert os.path.getsize(p) > 0
    with VideoDecoder(p) as dec:
        got = list(dec)
    assert len(got) == len(frames)
    assert got[0].shape == (96, 128, 3)
    # lossy codecs: channel means should track closely
    for a, b in zip(got, frames):
        assert abs(float(a.mean()) - float(b.mean())) < 8.0


@needs_native
def test_demux_keyframes_and_timebase(tmp_path):
    p = str(tmp_path / "t.mp4")
    with VideoEncoder(p, 64, 64, fps=30, codec="libx264") as e:
        for f in _gradient_frames(12, 64, 64):
            e.write(f)
    with PacketDemuxer(p) as dm:
        pkts = dm.read_packets()
        assert dm.time_base[1] > 0
    assert len(pkts) == 12
    assert pkts[0].is_key
    assert all(isinstance(p.data, bytes) and len(p.data) > 0 for p in pkts)


@needs_native
def test_hevc_nal_keyframe_detection(tmp_path):
    p = str(tmp_path / "t.h265")
    with VideoEncoder(p, 64, 64, fps=30, codec="libx265") as e:
        for f in _gradient_frames(10, 64, 64):
            e.write(f)
    with PacketDemuxer(p) as dm:
        pkts = dm.read_packets()
    # NAL-based keyframe detection must agree with the demuxer's key flag.
    for pkt in pkts:
        assert is_hevc_keyframe(pkt.data) == pkt.is_key
    nals = list(iter_nal_units(pkts[0].data))
    assert len(nals) >= 1
    types = {hevc_nal_type(pkts[0].data, s) for s, _ in nals}
    assert types & {32, 33, 34, 19, 20, 21}  # VPS/SPS/PPS/IDR/CRA present


@needs_native
def test_frames_extract_assemble_roundtrip(tmp_path):
    src = str(tmp_path / "in.mp4")
    with VideoEncoder(src, 128, 96, fps=30, codec="libx264") as e:
        for f in _gradient_frames(6):
            e.write(f)
    framedir = str(tmp_path / "frames")
    n = convert_video_to_frames(src, framedir)
    assert n == 6
    assert len(os.listdir(framedir)) == 6
    out = str(tmp_path / "out.mp4")
    assert create_video(framedir, out, fps=30)
    with VideoDecoder(out) as dec:
        assert sum(1 for _ in dec) == 6


@needs_native
def test_iter_frames_batching(tmp_path):
    src = str(tmp_path / "in.mp4")
    with VideoEncoder(src, 64, 64, fps=30, codec="libx264") as e:
        for f in _gradient_frames(10, 64, 64):
            e.write(f)
    batches = list(iter_frames(src, batch_size=4))
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    assert batches[0].shape == (4, 64, 64, 3)
    assert batches[0].dtype == np.uint8


@needs_native
def test_decoder_buffer_capacity_contract(tmp_path):
    """A raw stream larger than the initial buffer guess must grow-and-retry
    cleanly (vdt_decoder_next capacity arg) — never write out of bounds."""
    rng = np.random.default_rng(9)
    src = str(tmp_path / "big.h265")
    frames = [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8) for _ in range(3)]
    with VideoEncoder(src, 96, 64, fps=10, codec="libx265",
                      preset="ultrafast", bitrate=200000) as e:
        for f in frames:
            e.write(f)
    # Force the undersized-first-buffer path: pretend we expected 16x16.
    with VideoDecoder(src, initial_guess_hw=(16, 16)) as dec:
        got = list(dec)
    assert len(got) == 3
    assert got[0].shape == (64, 96, 3)
    # And the normal oversized guess still works.
    with VideoDecoder(src) as dec:
        assert sum(1 for _ in dec) == 3


@needs_native
def test_batch_convert_videos_and_codec_probe(tmp_path):
    from video_desensitization_tpu.video.frames import (
        batch_convert_videos,
        check_available_codecs,
        check_h265_support,
    )

    rng = np.random.default_rng(2)
    indir = tmp_path / "vids"
    indir.mkdir()
    for name, n in (("a.mp4", 4), ("b.mp4", 3)):
        with VideoEncoder(str(indir / name), 64, 48, fps=10, codec="mpeg4") as e:
            for i in range(n):
                e.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    (indir / "notes.txt").write_text("skip me")
    outdir = tmp_path / "frames"
    videos, frames = batch_convert_videos(str(indir), str(outdir))
    assert (videos, frames) == (2, 7)
    assert sorted(os.listdir(outdir / "a")) == [
        f"frame_{i:06d}.jpg" for i in range(1, 5)
    ]
    probe = check_available_codecs()
    assert probe["mpeg4"] is True
    assert isinstance(check_h265_support(), bool)


@needs_native
def test_i420_encode_decode_roundtrip(tmp_path):
    """write_i420 -> read_i420: the zero-RGB-pass transport for the fused
    engine's yuv420 mode. Planes must come back close (lossy codec) and
    shaped (H*3/2, W)."""
    rng = np.random.default_rng(5)
    h, w, n = 96, 128, 6
    # Smooth frames so x265's loss stays small.
    base = np.linspace(40, 200, h * 3 // 2, dtype=np.uint8)[:, None]
    frames = [
        np.clip(np.broadcast_to(base, (h * 3 // 2, w)) + i * 5, 0, 255).astype(
            np.uint8
        )
        for i in range(n)
    ]
    p = str(tmp_path / "t_i420.h265")
    with VideoEncoder(p, w, h, fps=30, codec="libx265") as e:
        for f in frames:
            e.write_i420(f)
    with VideoDecoder(p) as dec:
        got = []
        while True:
            f = dec.read_i420()
            if f is None:
                break
            got.append(f)
    assert len(got) == n
    assert got[0].shape == (h * 3 // 2, w)
    for a, b in zip(got, frames):
        assert float(np.abs(a.astype(np.int16) - b.astype(np.int16)).mean()) < 4.0


@needs_native
def test_read_i420_matches_rgb_iterator(tmp_path):
    """Decoding the same stream as I420 vs RGB must agree up to colorspace
    rounding (sws RGB24 conversion vs cv2's — both video-range BT.601)."""
    import cv2

    frames = _gradient_frames()
    p = str(tmp_path / "t_cmp.mp4")
    with VideoEncoder(p, 128, 96, fps=30, codec="libx264") as e:
        for f in frames:
            e.write(f)
    with VideoDecoder(p) as d1:
        rgbs = list(d1)
    with VideoDecoder(p) as d2:
        yuvs = []
        while True:
            f = d2.read_i420()
            if f is None:
                break
            yuvs.append(f)
    assert len(rgbs) == len(yuvs)
    for rgb, yuv in zip(rgbs, yuvs):
        back = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
        diff = np.abs(back.astype(np.int16) - rgb.astype(np.int16))
        assert float(diff.mean()) < 2.0 and int(diff.max()) <= 12


@needs_native
def test_read_i420_rejects_non_yuv420p_and_retains_frame(tmp_path):
    """MJPEG decodes as full-range yuvj420p: pass-through would mislabel the
    range, so read_i420 must raise the TYPED error with the probed frame
    retained — the RGB iterator then yields every frame."""
    from video_desensitization_tpu.video.av import I420UnsupportedError

    frames = _gradient_frames(n=4)
    p = str(tmp_path / "t.avi")
    with VideoEncoder(p, 128, 96, fps=10, codec="mjpeg") as e:
        for f in frames:
            e.write(f)
    with VideoDecoder(p) as dec:
        with pytest.raises(I420UnsupportedError):
            dec.read_i420()
        got = list(dec)
    assert len(got) == 4  # probe retained the first frame


@needs_native
def test_x265_params_reach_encoder(tmp_path):
    """The x265_params knob ([SETTINGS] encode_threads) demonstrably
    reaches libx265: 'lossless=1' flips rate control to lossless, so the
    I420 roundtrip is BIT-EXACT — impossible if the string were dropped
    (the default lossy encode at this bitrate differs on >10% of pixels).
    Also covers the pools/frame-threads form the config builds."""
    rng = np.random.default_rng(5)
    yuv = [
        rng.integers(0, 255, (96, 128), np.uint8) for _ in range(4)
    ]  # (64*3/2, 128) planar I420

    def roundtrip(path, **kw):
        with VideoEncoder(path, 128, 64, fps=10, codec="libx265",
                          preset="ultrafast", **kw) as e:
            for f in yuv:
                e.write_i420(f)
        out = []
        with VideoDecoder(path) as d:
            while True:
                f = d.read_i420()
                if f is None:
                    break
                out.append(f.copy())
        return out

    exact = roundtrip(
        str(tmp_path / "ll.mp4"),
        x265_params="lossless=1:pools=1:frame-threads=1",
    )
    lossy = roundtrip(str(tmp_path / "ab.mp4"), bitrate=100_000)
    assert len(exact) == len(lossy) == 4
    for a, b, src in zip(exact, lossy, yuv):
        np.testing.assert_array_equal(a, src)
        assert (b != src).mean() > 0.05


def test_encode_threads_builds_x265_params():
    from video_desensitization_tpu.api.config import PipelineConfig

    cfg = PipelineConfig()
    assert "x265_params" not in cfg.encode_kwargs  # 0 = x265 auto
    cfg.encode_threads = 4
    assert cfg.encode_kwargs["x265_params"] == "pools=4:frame-threads=4"
