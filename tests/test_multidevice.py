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
