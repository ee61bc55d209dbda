"""Multi-device inference sharding on the virtual 8-device CPU mesh.

The TPU analog of multi-node testing without a cluster (SURVEY.md §4): the
fused engine shards the frame batch over the ``data`` mesh axis; results must
be identical to the single-device run (frames are independent — zero
cross-chip collectives at inference).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_desensitization_tpu.detect.face import Retinaface
from video_desensitization_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    shard_batch,
)
from video_desensitization_tpu.pipeline.engine import DesensitizationEngine


@pytest.fixture(scope="module")
def face():
    return Retinaface(
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
    )


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=3)


def test_pad_batch_to_devices():
    x = np.arange(5 * 2).reshape(5, 2)
    padded, n = pad_batch_to_devices(x, 8)
    assert padded.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(padded[5:], np.tile(x[-1:], (3, 1)))


def test_shard_batch_places_on_all_devices(face):
    mesh = make_mesh()
    batch = np.zeros((8, 16, 16, 3), np.uint8)
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding == batch_sharding(mesh, 4)
    assert len(sharded.sharding.device_set) == len(jax.devices())


def test_engine_mesh_matches_single_device(face):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 96, 160, 3), dtype=np.uint8)  # non-multiple

    solo = DesensitizationEngine(face, None, mosaic_level=8)
    mesh = make_mesh()
    sharded = DesensitizationEngine(face, None, mosaic_level=8, mesh=mesh)

    a = solo.process_batch(frames)
    b = sharded.process_batch(frames)
    np.testing.assert_array_equal(a.frames, b.frames)
    assert a.num_faces == b.num_faces
    # Box floats may differ in the last ulp between the sharded and
    # unsharded compilations (different fusion/layout choices).
    for ba, bb in zip(a.face_boxes, b.face_boxes):
        np.testing.assert_allclose(np.array(ba), np.array(bb), rtol=1e-5, atol=1e-3)


def test_record_job_cobatched_on_mesh(face, tmp_path):
    """The FULL record job (unpack -> co-batched fused engine sharded over
    the 8-device mesh -> repack) on the virtual mesh — the multi-chip
    deployment shape of the reference pipeline (VERDICT r1 item 9)."""
    import os

    from video_desensitization_tpu.api.config import PipelineConfig
    from video_desensitization_tpu.pipeline.video_pipeline import (
        process_record_job,
    )
    from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
    from video_desensitization_tpu.record.reader import RecordReader
    from video_desensitization_tpu.record.topics import (
        CAMERA_TOPICS,
        COMPRESSED_IMAGE_TYPE,
    )
    from video_desensitization_tpu.record.writer import RecordWriter
    from video_desensitization_tpu.video.av import (
        PacketDemuxer,
        VideoDecoder,
        VideoEncoder,
        native_available,
    )

    if not native_available():
        pytest.skip("native av layer unavailable")

    # Synthetic 2-camera record.
    src = str(tmp_path / "in" / "job.record")
    (tmp_path / "in").mkdir()
    h265 = str(tmp_path / "src.h265")
    with VideoEncoder(h265, 64, 64, fps=30, codec="libx265",
                      bitrate=200000, preset="ultrafast") as e:
        for i in range(8):
            e.write(np.full((64, 64, 3), i * 25, np.uint8))
    with PacketDemuxer(h265) as dm:
        pkts = dm.read_packets()
    topics = CAMERA_TOPICS[:2]
    with RecordWriter(src) as w:
        for t in topics:
            w.write_channel(t, COMPRESSED_IMAGE_TYPE)
        for i, p in enumerate(pkts):
            for t in topics:
                img = sp.CompressedImage(format="h265", data=p.data)
                img.header.sequence_num = i
                w.write_message(t, img, 10**9 + i * 33_000_000)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    engine = DesensitizationEngine(face, None, mosaic_level=8, mesh=mesh)

    cfg = PipelineConfig(
        record_dir=str(tmp_path / "in"),
        output_h265_dir=str(tmp_path / "h265"),
        output_videos_dir=str(tmp_path / "videos"),
        temp_directory_base=str(tmp_path / "tmp"),
        record_output_dir=str(tmp_path / "out"),
        batch_size=4,
        co_batch=True,
        output_fps=30.0,
    )
    stats = process_record_job(cfg, engine)

    assert stats.videos_processed == 2
    assert stats.videos_failed == 0
    assert stats.frames == 2 * len(pkts)
    assert stats.record_path and os.path.exists(stats.record_path)
    # Repacked record: every camera message replaced, stream decodable.
    r = RecordReader(stats.record_path)
    for t in topics:
        msgs = list(r.read_messages(t))
        assert len(msgs) == len(pkts)
        stream = tmp_path / "check.h265"
        stream.write_bytes(b"".join(bytes(m[1].data) for m in msgs))
        with VideoDecoder(str(stream)) as dec:
            assert sum(1 for _ in dec) == len(pkts)


def test_plate_detector_on_mesh_matches_single_device():
    from video_desensitization_tpu.detect.plate import PlateDetector

    mesh = make_mesh()
    solo = PlateDetector(
        model_path=None, variant="n", confidence=0.01,
        input_shape=(128, 128), max_detections=4, dtype=jnp.float32,
    )
    sharded = PlateDetector(
        variables=solo.variables, confidence=0.01, variant="n",
        input_shape=(128, 128), max_detections=4, dtype=jnp.float32,
        mesh=mesh,
    )
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (len(jax.devices()) + 2, 96, 128, 3),
                        dtype=np.uint8)
    d0, k0 = (np.asarray(x) for x in solo.detect_padded(imgs))
    d1, k1 = (np.asarray(x) for x in sharded.detect_padded(imgs))
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-3)


def test_shard_batch_multihost_single_process_equivalence(face):
    """shard_batch_multihost must equal shard_batch when process_count == 1
    (the degenerate case of the per-host local-feed path; on a pod each host
    passes only its chips' frames and no cross-host transfer happens)."""
    from video_desensitization_tpu.parallel.mesh import shard_batch_multihost

    mesh = make_mesh()
    rng = np.random.default_rng(7)
    batch = {
        "frames": rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8),
        "shapes": rng.normal(size=(8, 2)).astype(np.float32),
    }
    a = shard_batch(mesh, batch)
    b = shard_batch_multihost(mesh, batch)
    for k in batch:
        assert b[k].sharding == a[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_hlo_collective_structure(face):
    """Inspect compiled HLO: inference over the data axis must insert ZERO
    collectives (frames are independent — the scaling-book sanity check);
    the sharded train step must all-reduce gradients."""
    import optax

    from video_desensitization_tpu.models.configs import cfg_mnet
    from video_desensitization_tpu.models.retinaface import RetinaFace
    from video_desensitization_tpu.ops.anchors import generate_anchors, num_anchors
    from video_desensitization_tpu.train.step import create_train_state, make_train_step

    mesh = make_mesh()
    n = len(jax.devices())

    # Inference: batch shard_mapped over data, params replicated. Under plain
    # GSPMD propagation the TopK custom-call has no batch partitioning rule
    # and the partitioner gathers the batch around it; the shard_map path
    # (detect/face.py, mesh.data_parallel_program) must stay collective-free.
    from video_desensitization_tpu.parallel.mesh import data_parallel_program

    frames = np.zeros((n * 2, 96, 128, 3), np.uint8)
    shapes = np.tile(np.array([[96.0, 128.0]], np.float32), (n * 2, 1))
    fr = jax.device_put(jnp.asarray(frames), batch_sharding(mesh))
    sh = jax.device_put(jnp.asarray(shapes), batch_sharding(mesh, ndim=2))
    prog = data_parallel_program(
        mesh, face._detect_program, n_params=1, n_batch_args=2, n_out=3
    )
    hlo = jax.jit(prog).lower(face.variables, fr, sh).compile().as_text()
    for coll in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute"):
        assert coll not in hlo, f"inference HLO unexpectedly contains {coll}"

    # The mesh-aware detector wrapper must produce results identical to the
    # unsharded program (and pad/slice a non-multiple batch transparently).
    face_mesh = Retinaface(
        variables=face.variables,
        model_path=None,
        backbone="mobilenet",
        input_shape=[128, 128, 3],
        confidence=0.01,
        nms_iou=0.4,
        max_detections=8,
        dtype=jnp.float32,
        mesh=mesh,
    )
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (n + 3, 96, 128, 3), dtype=np.uint8)
    d0, p0, k0 = (np.asarray(x) for x in face.detect_padded(imgs))
    d1, p1, k1 = (np.asarray(x) for x in face_mesh.detect_padded(imgs))
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-3)
    # The reference-parity microbenchmark must survive a mesh too (it feeds
    # a batch of 1 through the shard_mapped program via the pad path).
    assert face_mesh.get_FPS(imgs[0], test_interval=1) > 0

    # Training: gradient all-reduce over data must appear.
    hw = (64, 64)
    model = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.float32)
    tx = optax.sgd(1e-2)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), hw, tx, mesh=mesh)
    anchors = generate_anchors(hw, min_sizes=cfg_mnet["min_sizes"],
                               steps=cfg_mnet["steps"])
    a = num_anchors(hw, steps=cfg_mnet["steps"])
    batch = {
        "images": np.zeros((n, *hw, 3), np.float32),
        "loc_t": np.zeros((n, a, 4), np.float32),
        "landm_t": np.zeros((n, a, 10), np.float32),
        "labels": np.zeros((n, a), np.int32),
    }
    batch = shard_batch(mesh, batch)
    step = make_train_step(model, tx, anchors, mesh=mesh)
    hlo_train = jax.jit(lambda s, b: step(s, b)).lower(state, batch).compile().as_text()
    assert "all-reduce" in hlo_train, "sharded train step lost its gradient all-reduce"


def test_engine_yuv_mesh_matches_single_device(face):
    """process_batch_yuv sharded over the 8-device mesh must equal the
    single-device result (rank-3 I420 batches shard over `data` like RGB)."""
    from video_desensitization_tpu.ops.yuv import rgb_to_i420_host

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (5, 96, 160, 3), dtype=np.uint8)
    yuv = np.stack([rgb_to_i420_host(f) for f in frames])

    solo = DesensitizationEngine(face, None, mosaic_level=8)
    sharded = DesensitizationEngine(
        face, None, mosaic_level=8, mesh=make_mesh()
    )
    a = solo.process_batch_yuv(yuv)
    b = sharded.process_batch_yuv(yuv)
    assert a.frames.shape == yuv.shape
    np.testing.assert_array_equal(a.frames, b.frames)
    assert a.num_faces == b.num_faces
