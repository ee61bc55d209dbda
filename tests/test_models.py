"""RetinaFace Flax network vs an independently-written torch oracle.

The oracle re-creates the reference architecture (public RetinaFace design:
resnet50 layer2/3/4 -> FPN -> SSH -> 1x1 heads) in torch with the same
state_dict naming as the reference checkpoints, so this validates BOTH the
checkpoint converter (models/convert.py) and the NHWC Flax semantics
(padding, strides, BN eval stats, nearest upsample, head reshape ordering).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_desensitization_tpu.models.configs import cfg_mnet, cfg_re50
from video_desensitization_tpu.models.retinaface import RetinaFace
from video_desensitization_tpu.models.convert import convert_retinaface_state_dict

torch = pytest.importorskip("torch")

from torch_oracle import TRetinaFaceOracle, _randomize_bn_stats  # noqa: E402


@pytest.fixture(scope="module")
def oracle_and_flax():
    gen = torch.Generator().manual_seed(0)
    oracle = TRetinaFaceOracle()
    with torch.no_grad():
        _randomize_bn_stats(oracle, gen)
    oracle.eval()
    variables = convert_retinaface_state_dict(oracle.state_dict())
    net = RetinaFace(cfg=cfg_re50, mode="eval", dtype=jnp.float32)
    return oracle, net, variables


def test_resnet50_full_network_parity(oracle_and_flax):
    oracle, net, variables = oracle_and_flax
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_bbox, t_cls, t_landm = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_bbox, f_cls, f_landm = net.apply(variables, jnp.asarray(x))
    a = (16**2 + 8**2 + 4**2) * 2
    assert f_bbox.shape == (1, a, 4)
    assert f_cls.shape == (1, a, 2)
    assert f_landm.shape == (1, a, 10)
    np.testing.assert_allclose(np.asarray(f_bbox), t_bbox.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_cls), t_cls.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_landm), t_landm.numpy(), rtol=1e-3, atol=2e-4)


def test_converted_tree_matches_init_tree(oracle_and_flax):
    _, net, variables = oracle_and_flax
    init_vars = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    want = jax.tree.structure(jax.tree.map(lambda x: x.shape, dict(init_vars)))
    got = jax.tree.structure(jax.tree.map(lambda x: x.shape, variables))
    assert got == want
    mism = jax.tree.map(
        lambda a, b: a.shape == b.shape, variables, dict(init_vars)
    )
    assert all(jax.tree.leaves(mism))


@pytest.fixture(scope="module")
def mnet_oracle_and_flax():
    from torch_oracle import TRetinaFaceOracle as _O

    gen = torch.Generator().manual_seed(7)
    oracle = _O(backbone="mobilenet")
    with torch.no_grad():
        _randomize_bn_stats(oracle, gen)
    oracle.eval()
    variables = convert_retinaface_state_dict(oracle.state_dict())
    net = RetinaFace(cfg=cfg_mnet, mode="eval", dtype=jnp.float32)
    return oracle, net, variables


def test_mobilenet_full_network_parity(mnet_oracle_and_flax):
    """cfg_mnet analog of the resnet50 parity test: validates the converter
    stage mapping (models/convert.py:92-105) AND the Flax depthwise/NHWC
    semantics against the reference layout (mobilenet025.py:21-53)."""
    oracle, net, variables = mnet_oracle_and_flax
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_bbox, t_cls, t_landm = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_bbox, f_cls, f_landm = net.apply(variables, jnp.asarray(x))
    a = (16**2 + 8**2 + 4**2) * 2
    assert f_bbox.shape == (2, a, 4)
    np.testing.assert_allclose(np.asarray(f_bbox), t_bbox.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_cls), t_cls.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_landm), t_landm.numpy(), rtol=1e-3, atol=2e-4)


def test_mobilenet_converted_tree_matches_init_tree(mnet_oracle_and_flax):
    _, net, variables = mnet_oracle_and_flax
    init_vars = net.init(
        {"params": jax.random.PRNGKey(3)}, jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    want = jax.tree.structure(jax.tree.map(lambda x: x.shape, dict(init_vars)))
    got = jax.tree.structure(jax.tree.map(lambda x: x.shape, variables))
    assert got == want
    mism = jax.tree.map(lambda a, b: a.shape == b.shape, variables, dict(init_vars))
    assert all(jax.tree.leaves(mism))


def test_mobilenet_shapes():
    net = RetinaFace(cfg=cfg_mnet, mode="eval", dtype=jnp.float32)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(1)}, x)
    bbox, cls, landm = net.apply(variables, x)
    a = (16**2 + 8**2 + 4**2) * 2
    assert bbox.shape == (2, a, 4)
    assert cls.shape == (2, a, 2)
    assert landm.shape == (2, a, 10)
    np.testing.assert_allclose(np.asarray(cls).sum(-1), 1.0, rtol=1e-5)


def test_train_mode_returns_logits():
    net = RetinaFace(cfg=cfg_mnet, mode="train", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(2)}, x)
    _, cls, _ = net.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )[0]
    # raw logits, not softmax
    assert not np.allclose(np.asarray(cls).sum(-1), 1.0)


def test_save_load_variables_roundtrip_and_cli(tmp_path, oracle_and_flax):
    from video_desensitization_tpu.models import convert as C

    oracle, net, variables = oracle_and_flax
    # msgpack round trip preserves the tree bit-exactly
    p = str(tmp_path / "face.msgpack")
    C.save_variables(variables, p)
    back = C.load_variables(p)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # converter CLI: .pth -> msgpack
    pth = str(tmp_path / "oracle.pth")
    torch.save(oracle.state_dict(), pth)
    out = str(tmp_path / "converted.msgpack")
    rc = C.main([pth, out, "--arch", "retinaface"])
    assert rc == 0
    conv = C.load_variables(out)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(conv)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
