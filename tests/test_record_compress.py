"""Compressed (BZ2/LZ4) and multi-segment record support.

The reference reads real Apollo logs through cyber_record (via
foreign/recordDeal.so), which handles chunk-body compression and segmented
.record.0000N sets; these tests cover our equivalents (VERDICT r1 item 4).
"""

import os

import numpy as np
import pytest

from video_desensitization_tpu.record import lz4block
from video_desensitization_tpu.record.proto import cyber_record_pb2 as rp
from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
from video_desensitization_tpu.record.reader import RecordReader
from video_desensitization_tpu.record.topics import (
    CAMERA_TOPICS,
    COMPRESSED_IMAGE_TYPE,
)
from video_desensitization_tpu.record.unpack import (
    _list_records,
    _segment_sort_key,
    read_record2h265_all,
)
from video_desensitization_tpu.record.writer import RecordWriter
from video_desensitization_tpu.video.av import (
    PacketDemuxer,
    VideoDecoder,
    VideoEncoder,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native av layer unavailable"
)


# -- lz4 block codec ----------------------------------------------------------


def _lz4_cases():
    rng = np.random.default_rng(0)
    return [
        b"",
        b"x",
        b"abcd" * 2000,
        bytes(rng.integers(0, 256, 50000, dtype=np.uint8)),  # incompressible
        b"\x00" * 70000,  # long matches + extended lengths
        bytes(rng.integers(0, 4, 100000, dtype=np.uint8)),
        bytes(range(256)) * 100,
    ]


def test_lz4_roundtrip_native_and_python():
    for data in _lz4_cases():
        c = lz4block.compress(data)
        assert lz4block.decompress(c) == data
        assert lz4block.decompress(c, size_hint=len(data)) == data
        # pure-Python decoder agrees with the native one
        assert lz4block._decompress_py(c) == data
        # literal-only Python encoding is valid LZ4
        assert lz4block.decompress(lz4block._compress_literal_py(data)) == data


def test_lz4_compresses_redundant_data():
    data = b"abcdefgh" * 10000
    c = lz4block.compress(data)
    if lz4block.native_available():
        assert len(c) < len(data) // 10


def test_lz4_malformed_raises():
    # token promises 200 literal bytes, provides 3
    bad = bytes([200 >> 4 << 4]) + b"abc" + bytes([15 << 4, 255])
    with pytest.raises(ValueError):
        lz4block.decompress(bytes([0xF0, 255, 255]))  # truncated ext length
    with pytest.raises(ValueError):
        lz4block._decompress_py(bytes([0xF0, 255, 255]))
    del bad


# -- compressed record roundtrip ----------------------------------------------


def _write_bytes_record(path, n=40, compress=rp.COMPRESS_NONE, payload=None):
    with RecordWriter(path, chunk_message_limit=16, compress=compress) as w:
        w.write_channel("/misc/blob", "some.Type")
        for i in range(n):
            data = payload or (b"payload-%04d-" % i + b"Z" * 3000)
            w.write_message("/misc/blob", data, 1_000_000 + i)


@pytest.mark.parametrize("compress", [rp.COMPRESS_BZ2, rp.COMPRESS_LZ4])
def test_compressed_record_roundtrip(tmp_path, compress):
    rec = str(tmp_path / "c.record")
    _write_bytes_record(rec, compress=compress)
    r = RecordReader(rec)
    assert r.header.compress == compress
    msgs = list(r.read_messages("/misc/blob"))
    assert len(msgs) == 40
    assert msgs[7][1] == b"payload-0007-" + b"Z" * 3000
    assert msgs[7][2] == 1_000_007
    # The redundant payloads must actually shrink on disk vs uncompressed.
    plain = str(tmp_path / "p.record")
    _write_bytes_record(plain, compress=rp.COMPRESS_NONE)
    if compress == rp.COMPRESS_BZ2 or lz4block.native_available():
        assert os.path.getsize(rec) < os.path.getsize(plain) // 2


def test_compressed_record_roundtrip_camera_payload(tmp_path):
    rec = str(tmp_path / "cam.record")
    rng = np.random.default_rng(1)
    blob = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))
    with RecordWriter(rec, compress=rp.COMPRESS_LZ4) as w:
        w.write_channel(CAMERA_TOPICS[0], COMPRESSED_IMAGE_TYPE)
        img = sp.CompressedImage(format="h265", data=blob)
        w.write_message(CAMERA_TOPICS[0], img, 42)
    msgs = list(RecordReader(rec).read_messages(CAMERA_TOPICS[0]))
    assert bytes(msgs[0][1].data) == blob


# -- multi-segment sets ---------------------------------------------------------


def test_segment_sort_order():
    names = [
        "a.record.00010",
        "a.record.00002",
        "a.record.2",
        "a.record.10",
        "b.record",
    ]
    ordered = sorted(names, key=_segment_sort_key)
    # numeric segment order (zero-padded and not), ties keep input order
    assert [_segment_sort_key(n)[2] for n in ordered[:4]] == [2, 2, 10, 10]
    assert ordered[4] == "b.record"


def test_list_records_skips_tmp(tmp_path):
    for n in ("x.record.00000", "x.record.00001", "x.tmp_record", "y.txt"):
        (tmp_path / n).write_bytes(b"")
    assert [os.path.basename(p) for p in _list_records(str(tmp_path))] == [
        "x.record.00000",
        "x.record.00001",
    ]


@pytest.fixture(scope="module")
def hevc_packets(tmp_path_factory):
    if not native_available():
        pytest.skip("native av layer unavailable")
    d = tmp_path_factory.mktemp("hevc_seg")
    src = os.path.join(d, "src.h265")
    with VideoEncoder(src, 64, 64, fps=30, codec="libx265", bitrate=200000,
                      preset="ultrafast") as e:
        for i in range(10):
            e.write(np.full((64, 64, 3), i * 20, np.uint8))
    with PacketDemuxer(src) as dm:
        return dm.read_packets()


@needs_native
def test_multisegment_compressed_unpack(tmp_path, hevc_packets):
    """A 2-segment LZ4-compressed set unpacks into one continuous stream,
    with keyframe gating state spanning the segment boundary."""
    topics = CAMERA_TOPICS[:2]
    recdir = tmp_path / "recs"
    recdir.mkdir()
    # Rotate so the set starts mid-GOP: gating must skip the leading
    # non-key packet(s) in segment 0.
    rotated = hevc_packets[1:] + hevc_packets[:1]
    halves = [rotated[:5], rotated[5:]]
    for seg, pkts in enumerate(halves):
        path = str(recdir / f"s.record.{seg:05d}")
        with RecordWriter(path, compress=rp.COMPRESS_LZ4) as w:
            for t in topics:
                w.write_channel(t, COMPRESSED_IMAGE_TYPE)
            for i, p in enumerate(pkts):
                for t in topics:
                    img = sp.CompressedImage(format="h265", data=p.data)
                    img.header.sequence_num = seg * 5 + i
                    w.write_message(t, img, 10**9 + (seg * 5 + i) * 33_000_000)
    out = read_record2h265_all(str(recdir), str(tmp_path))
    assert set(out) == set(topics)
    # The keyframe starts the gated stream; every later frame (including all
    # of segment 1) must be present and decodable.
    key_idx = next(i for i, p in enumerate(rotated) if p.is_key)
    expect = b"".join(bytes(p.data) for p in rotated[key_idx:])
    for topic, path in out.items():
        assert open(path, "rb").read() == expect
        with VideoDecoder(path) as dec:
            assert sum(1 for _ in dec) >= len(rotated) - key_idx - 2
