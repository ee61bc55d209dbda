"""Torch oracle of the reference RetinaFace architecture (test/validation-only).

Re-creates the reference network (public RetinaFace design: resnet50
layer2/3/4 -> FPN -> SSH -> 1x1 heads) in torch with the same state_dict
naming as the reference checkpoints, so converter + Flax semantics can be
validated end to end without reference weights. Imported by
tests/test_models.py and benchmarks/recall_parity.py.
"""

import torch
import torch.nn as tnn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# torch oracle (test-only; written from the public architecture description)
# --------------------------------------------------------------------------


class TBottleneck(tnn.Module):
    def __init__(self, cin, width, stride, downsample):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.downsample = (
            tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4),
            )
            if downsample
            else None
        )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class TResNet50Body(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (n, w, s) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512), (1, 2, 2, 2)), start=1
        ):
            blocks = []
            for bi in range(n):
                blocks.append(TBottleneck(cin, w, s if bi == 0 else 1, bi == 0))
                cin = w * 4
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def t_conv_bn(cin, cout, k=3, s=1, p=1, leaky=None):
    layers = [tnn.Conv2d(cin, cout, k, s, p, bias=False), tnn.BatchNorm2d(cout)]
    if leaky is not None:
        layers.append(tnn.LeakyReLU(leaky))
    return tnn.Sequential(*layers)


class TFPN(tnn.Module):
    def __init__(self, cins, cout, leaky):
        super().__init__()
        self.output1 = t_conv_bn(cins[0], cout, 1, 1, 0, leaky)
        self.output2 = t_conv_bn(cins[1], cout, 1, 1, 0, leaky)
        self.output3 = t_conv_bn(cins[2], cout, 1, 1, 0, leaky)
        self.merge1 = t_conv_bn(cout, cout, 3, 1, 1, leaky)
        self.merge2 = t_conv_bn(cout, cout, 3, 1, 1, leaky)

    def forward(self, c3, c4, c5):
        o1, o2, o3 = self.output1(c3), self.output2(c4), self.output3(c5)
        o2 = self.merge2(o2 + F.interpolate(o3, size=o2.shape[2:], mode="nearest"))
        o1 = self.merge1(o1 + F.interpolate(o2, size=o1.shape[2:], mode="nearest"))
        return o1, o2, o3


class TSSH(tnn.Module):
    def __init__(self, cin, cout, leaky):
        super().__init__()
        self.conv3X3 = t_conv_bn(cin, cout // 2, 3, 1, 1, None)
        self.conv5X5_1 = t_conv_bn(cin, cout // 4, 3, 1, 1, leaky)
        self.conv5X5_2 = t_conv_bn(cout // 4, cout // 4, 3, 1, 1, None)
        self.conv7X7_2 = t_conv_bn(cout // 4, cout // 4, 3, 1, 1, leaky)
        self.conv7x7_3 = t_conv_bn(cout // 4, cout // 4, 3, 1, 1, None)

    def forward(self, x):
        a = self.conv3X3(x)
        b1 = self.conv5X5_1(x)
        b = self.conv5X5_2(b1)
        c = self.conv7x7_3(self.conv7X7_2(b1))
        return F.relu(torch.cat([a, b, c], dim=1))


class THead(tnn.Module):
    def __init__(self, cin, dim, anchors=2):
        super().__init__()
        self.dim = dim
        self.conv1x1 = tnn.Conv2d(cin, anchors * dim, 1)

    def forward(self, x):
        out = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
        return out.view(out.shape[0], -1, self.dim)


class TRetinaFaceOracle(tnn.Module):
    def __init__(self, cout=256, cins=(512, 1024, 2048)):
        super().__init__()
        # conv_bn blocks always end in LeakyReLU; slope 0 == ReLU (reference
        # layers.py:41,71). Only the *_no_relu blocks pass leaky=None below.
        leaky = 0.1 if cout <= 64 else 0.0
        self.body = TResNet50Body()
        self.fpn = TFPN(cins, cout, leaky)
        self.ssh1 = TSSH(cout, cout, leaky)
        self.ssh2 = TSSH(cout, cout, leaky)
        self.ssh3 = TSSH(cout, cout, leaky)
        self.ClassHead = tnn.ModuleList([THead(cout, 2) for _ in range(3)])
        self.BboxHead = tnn.ModuleList([THead(cout, 4) for _ in range(3)])
        self.LandmarkHead = tnn.ModuleList([THead(cout, 10) for _ in range(3)])

    def forward(self, x):
        c3, c4, c5 = self.body(x)
        feats = [s(f) for s, f in zip((self.ssh1, self.ssh2, self.ssh3), self.fpn(c3, c4, c5))]
        bbox = torch.cat([self.BboxHead[i](f) for i, f in enumerate(feats)], 1)
        cls = torch.cat([self.ClassHead[i](f) for i, f in enumerate(feats)], 1)
        landm = torch.cat([self.LandmarkHead[i](f) for i, f in enumerate(feats)], 1)
        return bbox, F.softmax(cls, dim=-1), landm


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=gen) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)


