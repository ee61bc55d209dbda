"""YOLOv8 plate detector: block-level torch oracles (ultralytics naming +
semantics re-derived from the public architecture), full-net shape checks,
and decode sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_desensitization_tpu.models.convert import convert_yolo_state_dict
from video_desensitization_tpu.models.yolo import C2f, ConvBlock, SPPF, YoloV8

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F


class TConv(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, cin, cout, n=1, shortcut=False):
        super().__init__()
        self.c = cout // 2
        self.cv1 = TConv(cin, cout, 1)
        self.cv2 = TConv((2 + n) * self.c, cout, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        half = cin // 2
        self.cv1 = TConv(cin, half, 1)
        self.cv2 = TConv(half * 4, cout, 1)
        self.mp = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.mp(x)
        y2 = self.mp(y1)
        return self.cv2(torch.cat([x, y1, y2, self.mp(y2)], 1))


def _randomize(model, gen):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
                m.weight.copy_(torch.rand(m.weight.shape, generator=gen) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)
            elif isinstance(m, tnn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen) * 0.05)


def _convert_block(tmodel, prefix="model.4"):
    sd = {f"{prefix}.{k}": v for k, v in tmodel.state_dict().items()}
    return convert_yolo_state_dict(sd)


def _extract(variables, name):
    return {
        "params": variables["params"][name],
        "batch_stats": variables["batch_stats"][name],
    }


def test_c2f_block_parity():
    gen = torch.Generator().manual_seed(0)
    t = TC2f(32, 32, n=2, shortcut=True).eval()
    _randomize(t, gen)
    variables = _extract(_convert_block(t, "model.4"), "m4")
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 32)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        C2f(32, n=2, shortcut=True, dtype=jnp.float32).apply(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sppf_block_parity():
    gen = torch.Generator().manual_seed(1)
    t = TSPPF(64, 64).eval()
    _randomize(t, gen)
    variables = _extract(_convert_block(t, "model.9"), "m9")
    x = np.random.default_rng(1).normal(size=(1, 8, 8, 64)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(SPPF(64, dtype=jnp.float32).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convblock_stride2_parity():
    gen = torch.Generator().manual_seed(2)
    t = TConv(3, 16, 3, 2).eval()
    _randomize(t, gen)
    variables = _extract(_convert_block(t, "model.0"), "m0")
    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        ConvBlock(16, 3, 2, dtype=jnp.float32).apply(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_full_net_shapes_and_decode():
    net = YoloV8(num_classes=2, variant="n", dtype=jnp.float32)
    x = jnp.zeros((1, 192, 192, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, x)
    boxes, probs = net.apply(variables, x)
    a = (24**2 + 12**2 + 6**2)
    assert boxes.shape == (1, a, 4)
    assert probs.shape == (1, a, 2)
    b = np.asarray(boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
    p = np.asarray(probs)
    assert (p >= 0).all() and (p <= 1).all()
    # Box centers must track anchor grid positions (DFL distances are
    # bounded by REG_MAX-1=15 grid cells).
    cx = (b[0, :, 0] + b[0, :, 2]) / 2
    assert cx.min() >= -15 * 32 and cx.max() <= 192 + 15 * 32


def test_yolo_full_network_parity_vs_ultralytics_layout():
    """Converter + Flax graph vs a torch oracle in the real ultralytics
    state_dict layout (model.{i}.*, C2f chunk splits, SPPF, Detect cv2/cv3,
    DFL) — the YOLO analog of test_resnet50_full_network_parity
    (VERDICT r1 item 7)."""
    import torch

    from tests.torch_oracle import TYoloV8Oracle, _randomize_bn_stats
    from video_desensitization_tpu.models.convert import convert_yolo_state_dict
    from video_desensitization_tpu.models.yolo import YoloV8

    gen = torch.Generator().manual_seed(7)
    oracle = TYoloV8Oracle(nc=1)
    with torch.no_grad():
        for p in oracle.parameters():
            if p.requires_grad:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(oracle, gen)
        # keep the DFL projection fixed to arange (ultralytics semantics)
        oracle.model[22].dfl.conv.weight.copy_(
            torch.arange(16, dtype=torch.float).view(1, 16, 1, 1)
        )
    oracle.eval()

    rng = np.random.default_rng(11)
    x = rng.random((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_boxes, t_probs = oracle(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )

    variables = convert_yolo_state_dict(oracle.state_dict())
    net = YoloV8(num_classes=1, variant="n", dtype=jnp.float32)
    j_boxes, j_probs = net.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(j_probs), t_probs.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_boxes), t_boxes.numpy(), rtol=1e-3, atol=2e-3
    )
