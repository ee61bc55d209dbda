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
