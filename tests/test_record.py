"""Record container I/O: writer<->reader roundtrip, keyframe-gated unpack,
packet repair, and full repack with synthetic HEVC streams."""

import os

import numpy as np
import pytest

from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
from video_desensitization_tpu.record.reader import RecordReader
from video_desensitization_tpu.record.writer import RecordWriter
from video_desensitization_tpu.record.topics import (
    CAMERA_TOPICS,
    COMPRESSED_IMAGE_TYPE,
    camera_name_from_topic,
    hevc_filename_for_topic,
    topic_from_filename,
)
from video_desensitization_tpu.record.packets import FramePacket, ReadPacket
from video_desensitization_tpu.record.unpack import (
    get_tmp_record_path,
    read_record2h265_all,
)
from video_desensitization_tpu.record.repack import (
    match_topics_and_hevcs,
    write_allH265_record_all,
)
from video_desensitization_tpu.video.av import (
    PacketDemuxer,
    VideoDecoder,
    VideoEncoder,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native av layer unavailable"
)


@pytest.fixture(scope="module")
def hevc_packets(tmp_path_factory):
    if not native_available():
        pytest.skip("native av layer unavailable")
    d = tmp_path_factory.mktemp("hevc")
    src = os.path.join(d, "src.h265")
    with VideoEncoder(src, 64, 64, fps=30, codec="libx265", bitrate=200000,
                      preset="ultrafast") as e:
        for i in range(10):
            e.write(np.full((64, 64, 3), i * 20, np.uint8))
    with PacketDemuxer(src) as dm:
        return dm.read_packets()


def _write_record(path, packets, topics, extra_channel=True):
    with RecordWriter(path) as w:
        for t in topics:
            w.write_channel(t, COMPRESSED_IMAGE_TYPE)
        if extra_channel:
            w.write_channel("/misc/chatter", "some.Type")
        for i, p in enumerate(packets):
            for t in topics:
                img = sp.CompressedImage(
                    format="h265", data=p.data, measurement_time=i / 30
                )
                img.header.sequence_num = i
                w.write_message(t, img, 1_000_000_000 + i * 33_000_000)
            if extra_channel:
                w.write_message(
                    "/misc/chatter", b"hello%d" % i, 1_000_000_000 + i * 33_000_000
                )


def test_topics_registry():
    assert len(CAMERA_TOPICS) == 12
    assert camera_name_from_topic("/drivers/camera/front_wide/compressed/image") == "front_wide"
    assert hevc_filename_for_topic(CAMERA_TOPICS[0]) == "topic_front_narrow.h265"
    assert topic_from_filename("topic_front_wide.h265") == "/drivers/camera/front_wide/compressed/image"
    assert topic_from_filename("topic_front_wide_processed.mp4") == "/drivers/camera/front_wide/compressed/image"
    assert topic_from_filename("random.mp4") is None


def test_tmp_record_path():
    assert get_tmp_record_path("/a/b/x.record") == "/a/b/x.tmp_record"


@needs_native
def test_writer_reader_roundtrip(tmp_path, hevc_packets):
    rec = str(tmp_path / "t.record")
    topics = CAMERA_TOPICS[:2]
    _write_record(rec, hevc_packets, topics)
    r = RecordReader(rec)
    assert len(r.channels) == 3
    assert r.header.is_complete
    assert r.header.message_number == len(hevc_packets) * 3
    msgs = list(r.read_messages(topics[0]))
    assert len(msgs) == len(hevc_packets)
    topic, img, t = msgs[0]
    assert topic == topics[0]
    assert img.format == "h265"
    assert bytes(img.data) == bytes(hevc_packets[0].data)
    assert t == 1_000_000_000
    # other channel stays raw bytes
    other = list(r.read_messages("/misc/chatter"))
    assert other[0][1] == b"hello0"


@needs_native
def test_unpack_keyframe_gating(tmp_path, hevc_packets):
    rec = str(tmp_path / "t.record")
    topics = CAMERA_TOPICS[:2]
    # Prepend a non-key packet to test gating: rotate so stream starts mid-GOP
    rotated = hevc_packets[1:] + hevc_packets[:1]
    _write_record(rec, rotated, topics)
    out = read_record2h265_all(rec, str(tmp_path))
    assert set(out) == set(topics)
    for topic, path in out.items():
        assert os.path.basename(path) == hevc_filename_for_topic(topic)
        with VideoDecoder(path) as dec:
            n = sum(1 for _ in dec)
        # gated stream = frames from the first keyframe onward
        assert n >= 1
        data = open(path, "rb").read()
        # first NAL must start at a keyframe access unit: stream decodable
        assert len(data) > 0


@needs_native
def test_read_packet_and_fix_pts(tmp_path, hevc_packets):
    src = str(tmp_path / "x.h265")
    with open(src, "wb") as f:
        for p in hevc_packets:
            f.write(p.data)
    rp = ReadPacket()
    pkts = rp.read_packet(src)
    assert len(pkts) == len(hevc_packets)
    assert pkts[0].is_key_frame
    fixed = rp.fix_missing_pts(pkts)
    pts = [p.pts for p in fixed]
    assert pts == sorted(pts)
    assert rp.read_packet(str(tmp_path / "missing.h265")) == []


def test_fix_missing_pts_interpolation():
    rp = ReadPacket()
    pkts = [
        FramePacket(b"a", pts=0, duration=2),
        FramePacket(b"b", pts=None, duration=2),
        FramePacket(b"c", pts=None, duration=2),
        FramePacket(b"d", pts=2, duration=2),
    ]
    fixed = rp.fix_missing_pts(pkts)
    assert [p.pts for p in fixed] == [0, 2, 2, 4]


@needs_native
def test_full_repack_roundtrip(tmp_path, hevc_packets):
    rec = str(tmp_path / "t.record")
    topics = CAMERA_TOPICS[:2]
    _write_record(rec, hevc_packets, topics)
    out = read_record2h265_all(rec, str(tmp_path))
    processed = tmp_path / "processed"
    processed.mkdir()
    for topic, path in out.items():
        base = os.path.basename(path).replace(".h265", "_processed.h265")
        (processed / base).write_bytes(open(path, "rb").read())

    matches = match_topics_and_hevcs(str(processed))
    assert set(matches) == set(topics)

    outdir = tmp_path / "out"
    final = write_allH265_record_all(rec, str(processed), str(outdir))
    assert final and os.path.exists(final)
    r = RecordReader(final)
    assert len(r.channels) == 3
    # every camera message's payload was replaced with a demuxed packet
    msgs = list(r.read_messages(topics[0]))
    assert len(msgs) == len(hevc_packets)
    # non-camera channel is preserved verbatim
    other = list(r.read_messages("/misc/chatter"))
    assert [m[1] for m in other] == [b"hello%d" % i for i in range(10)]
    # repacked stream must decode
    stream = b"".join(bytes(m[1].data) for m in msgs)
    tmp_stream = tmp_path / "repacked.h265"
    tmp_stream.write_bytes(stream)
    with VideoDecoder(str(tmp_stream)) as dec:
        n = sum(1 for _ in dec)
    assert n == len(hevc_packets)


@needs_native
def test_repack_never_leaks_unmatched_camera_topics(tmp_path, hevc_packets):
    """A camera topic whose video failed to process (no matched output) must
    be DROPPED from the repacked record, never copied raw — copying would
    write un-blurred frames into the 'desensitized' record."""
    rec = str(tmp_path / "t.record")
    topics = CAMERA_TOPICS[:2]
    _write_record(rec, hevc_packets, topics)
    out = read_record2h265_all(rec, str(tmp_path))
    processed = tmp_path / "processed"
    processed.mkdir()
    # Only camera 0 gets a processed video; camera 1's pipeline "failed".
    path = out[topics[0]]
    base = os.path.basename(path).replace(".h265", "_processed.h265")
    (processed / base).write_bytes(open(path, "rb").read())

    # caplog can't see VideoProcessor.* (propagate=False once setup_logger
    # ran in any earlier test) — attach a handler directly.
    import logging

    messages = []
    handler = logging.Handler()
    handler.emit = lambda r: messages.append(r.getMessage())
    log = logging.getLogger("VideoProcessor.recordDeal")
    log.addHandler(handler)
    try:
        final = write_allH265_record_all(rec, str(processed), str(tmp_path / "o"))
    finally:
        log.removeHandler(handler)
    r = RecordReader(final)
    assert len(list(r.read_messages(topics[0]))) == len(hevc_packets)
    assert list(r.read_messages(topics[1])) == []  # raw frames NOT copied
    # non-camera channel still passes through
    assert len(list(r.read_messages("/misc/chatter"))) == 10
    assert any("NO desensitized video matched" in m for m in messages)


def _varied_frames(n, h=96, w=160):
    """Moving-gradient frames: enough temporal structure for x265 at preset
    medium to emit B-frames (flat gray fixtures never trigger reordering)."""
    ys, xs = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        f = ((xs * 2 + ys + i * 17) % 256).astype(np.uint8)
        frames.append(np.stack([f, np.roll(f, i, axis=1), f[::-1]], axis=-1))
    return frames


@needs_native
def test_repack_is_bframe_safe(tmp_path):
    """Repack must write packets in DECODE order: with B-frames present
    (decode order != presentation order), the repacked record's payload
    stream must decode frame-accurately, identical to a direct re-encode."""
    from video_desensitization_tpu.video.av import HEVC_DEFAULTS

    n = 24
    frames = _varied_frames(n)

    # Prove these frames at the repack settings (libx265 preset medium)
    # really produce B-frames: in a container (where pts/dts survive) the
    # encoder must emit at least one reordered packet. Raw Annex-B streams
    # carry no timestamps, so this probe is the B-frame evidence.
    probe = str(tmp_path / "probe.mp4")
    with VideoEncoder(probe, 160, 96, fps=30, **HEVC_DEFAULTS) as e:
        for f in frames:
            e.write(f)
    with PacketDemuxer(probe) as dm:
        probe_pkts = dm.read_packets()
    assert any(
        p.dts is not None and p.pts is not None and p.dts != p.pts
        for p in probe_pkts
    ), "fixture has no B-frames"

    # Source record: n messages per topic (payload content is irrelevant to
    # the pairing logic; use a tiny valid HEVC stream split per message).
    src_h265 = str(tmp_path / "src.h265")
    with VideoEncoder(src_h265, 160, 96, fps=30, **HEVC_DEFAULTS) as e:
        for f in frames:
            e.write(f)
    with PacketDemuxer(src_h265) as dm:
        src_pkts = dm.read_packets()
    assert len(src_pkts) == n

    topics = CAMERA_TOPICS[:1]
    rec = str(tmp_path / "t.record")
    _write_record(rec, src_pkts, topics, extra_channel=False)

    # "Processed" output video (mp4) with the same frame count.
    processed = tmp_path / "processed"
    processed.mkdir()
    out_mp4 = str(processed / "topic_front_narrow_processed.mp4")
    with VideoEncoder(out_mp4, 160, 96, fps=30, codec="mpeg4",
                      bitrate=4_000_000) as e:
        for f in frames:
            e.write(f)

    outdir = tmp_path / "out"
    final = write_allH265_record_all(rec, str(processed), str(outdir))
    assert final

    # Reassemble the repacked payload stream and decode it.
    msgs = list(RecordReader(final).read_messages(topics[0]))
    assert len(msgs) == n
    stream = b"".join(bytes(m[1].data) for m in msgs)
    repacked = tmp_path / "repacked.h265"
    repacked.write_bytes(stream)
    with VideoDecoder(str(repacked)) as dec:
        got = list(dec)
    assert len(got) == n

    # Reference result: decode the mp4 and re-encode with the same repack
    # settings ourselves (x265 is deterministic) — frame-accurate match.
    ref_h265 = str(tmp_path / "ref.h265")
    with VideoDecoder(out_mp4) as dec:
        decoded_mp4 = list(dec)
    with VideoEncoder(ref_h265, 160, 96, fps=30, **HEVC_DEFAULTS) as e:
        for f in decoded_mp4:
            e.write(f)
    with VideoDecoder(ref_h265) as dec:
        expect = list(dec)
    assert len(expect) == n
    for a, b in zip(got, expect):
        np.testing.assert_array_equal(a, b)


def test_reconcile_with_timeline_counts_and_truncation(caplog):
    rp_ = ReadPacket()
    pkts = [FramePacket(b"a"), FramePacket(b"b"), FramePacket(b"c")]
    out = rp_.reconcile_with_timeline(pkts, [(100, 1), (200, 2)])
    assert len(out) == 2
    assert (out[0].time, out[0].sequence_num) == (100, 1)
    assert (out[1].time, out[1].sequence_num) == (200, 2)
    out2 = rp_.reconcile_with_timeline(pkts[:1], [(5, 9)])
    assert len(out2) == 1 and out2[0].time == 5


@needs_native
def test_repack_midgop_record_stays_aligned(tmp_path, hevc_packets):
    """A record that starts mid-GOP: unpack gates out the k leading non-key
    frames, so repack must pair packet i with the i-th SURVIVING message and
    drop the pre-keyframe originals — pairing from message 0 would shift
    every payload k frames early and leak k raw frames (review finding)."""
    topics = CAMERA_TOPICS[:1]
    rotated = hevc_packets[1:] + hevc_packets[:1]  # starts mid-GOP
    key_idx = next(i for i, p in enumerate(rotated) if p.is_key)
    assert key_idx > 0, "fixture must start with a non-keyframe"

    rec = str(tmp_path / "t.record")
    _write_record(rec, rotated, topics, extra_channel=False)
    out = read_record2h265_all(rec, str(tmp_path))
    gated_stream = open(out[topics[0]], "rb").read()

    processed = tmp_path / "processed"
    processed.mkdir()
    # Identity "processing": copy the gated stream through.
    (processed / "topic_front_narrow_processed.h265").write_bytes(gated_stream)

    outdir = tmp_path / "out"
    final = write_allH265_record_all(rec, str(processed), str(outdir))
    msgs = list(RecordReader(final).read_messages(topics[0]))
    surviving = rotated[key_idx:]
    # Pre-keyframe originals are dropped from the output (never processed).
    assert len(msgs) == len(surviving)
    # And every surviving message's payload is the aligned packet.
    for m, p in zip(msgs, surviving):
        assert bytes(m[1].data) == bytes(p.data)


def test_process_frames_write_pairs_and_truncates():
    rp_ = ReadPacket()

    class Img:
        def __init__(self, data=b""):
            self.data = data

        def CopyFrom(self, other):
            self.data = other.data

    msgs = [(Img(b"orig0"), 100), (Img(b"orig1"), 200), (Img(b"orig2"), 300)]
    pkts = [FramePacket(b"new0"), FramePacket(b"new1")]
    out = rp_.process_frames_write(msgs, pkts)
    assert [bytes(m.data) for m, _ in out] == [b"new0", b"new1"]
    assert [t for _, t in out] == [100, 200]
