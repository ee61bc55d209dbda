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


def t_conv_dw(cin, cout, stride=1, leaky=0.1):
    """Depthwise-separable block with the reference Sequential layout
    (mobilenet025.py:10-19): indices 0/1 = dw conv/BN, 3/4 = pw conv/BN."""
    return tnn.Sequential(
        tnn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False),
        tnn.BatchNorm2d(cin),
        tnn.LeakyReLU(leaky),
        tnn.Conv2d(cin, cout, 1, 1, 0, bias=False),
        tnn.BatchNorm2d(cout),
        tnn.LeakyReLU(leaky),
    )


class TMobileNet025Body(tnn.Module):
    """MobileNetV1 x0.25 feature body, reference state_dict layout
    (mobilenet025.py:21-53: stage1/2/3 Sequentials of conv_bn + conv_dw)."""

    def __init__(self):
        super().__init__()
        self.stage1 = tnn.Sequential(
            t_conv_bn(3, 8, 3, 2, 1, 0.1),
            t_conv_dw(8, 16, 1),
            t_conv_dw(16, 32, 2),
            t_conv_dw(32, 32, 1),
            t_conv_dw(32, 64, 2),
            t_conv_dw(64, 64, 1),
        )
        self.stage2 = tnn.Sequential(
            t_conv_dw(64, 128, 2), *[t_conv_dw(128, 128, 1) for _ in range(5)]
        )
        self.stage3 = tnn.Sequential(t_conv_dw(128, 256, 2), t_conv_dw(256, 256, 1))

    def forward(self, x):
        s1 = self.stage1(x)
        s2 = self.stage2(s1)
        s3 = self.stage3(s2)
        return s1, s2, s3


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
    def __init__(self, cout=256, cins=(512, 1024, 2048), backbone="resnet50"):
        super().__init__()
        if backbone == "mobilenet":
            # cfg_mnet geometry: in_channel=32 -> cins (64, 128, 256), out 64
            # (reference retinaface.py:60-69, config.py:1-16).
            cout, cins = 64, (64, 128, 256)
        # conv_bn blocks always end in LeakyReLU; slope 0 == ReLU (reference
        # layers.py:41,71). Only the *_no_relu blocks pass leaky=None below.
        leaky = 0.1 if cout <= 64 else 0.0
        self.body = TMobileNet025Body() if backbone == "mobilenet" else TResNet50Body()
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




# --------------------------------------------------------------------------
# YOLOv8 torch oracle (ultralytics DetectionModel layout, test-only).
# Written from the public YOLOv8 architecture description; attribute names
# reproduce the ultralytics state_dict key layout (model.{i}.conv/bn,
# cv1/cv2, m.{j}, Detect cv2/cv3 ModuleLists, dfl.conv) so
# convert_yolo_state_dict can be validated against a real-format graph.
# --------------------------------------------------------------------------


class TYoloConv(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TYoloBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TYoloConv(c, c, 3, 1)
        self.cv2 = TYoloConv(c, c, 3, 1)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, cin, cout, n=1, shortcut=False):
        super().__init__()
        self.c = cout // 2
        self.cv1 = TYoloConv(cin, cout, 1, 1)
        self.cv2 = TYoloConv((2 + n) * self.c, cout, 1, 1)
        self.m = tnn.ModuleList(TYoloBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        c_ = cin // 2
        self.cv1 = TYoloConv(cin, c_, 1, 1)
        self.cv2 = TYoloConv(c_ * 4, cout, 1, 1)
        self.mpool = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.mpool(x)
        y2 = self.mpool(y1)
        return self.cv2(torch.cat([x, y1, y2, self.mpool(y2)], 1))


class TDFL(tnn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = tnn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(
            1, c1, 1, 1
        )
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape  # (B, 4*c1, A)
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


class TDetect(tnn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        self.nc = nc
        self.reg_max = reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(
                TYoloConv(c, c2, 3, 1),
                TYoloConv(c2, c2, 3, 1),
                tnn.Conv2d(c2, 4 * reg_max, 1),
            )
            for c in ch
        )
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(
                TYoloConv(c, c3, 3, 1),
                TYoloConv(c3, c3, 3, 1),
                tnn.Conv2d(c3, nc, 1),
            )
            for c in ch
        )
        self.dfl = TDFL(reg_max)

    def forward(self, feats, strides=(8, 16, 32)):
        # inference path: per-scale raw maps -> flatten -> DFL decode
        shapes = [f.shape for f in feats]
        raw = [
            torch.cat((self.cv2[i](f), self.cv3[i](f)), 1) for i, f in enumerate(feats)
        ]
        flat = torch.cat([r.view(r.shape[0], r.shape[1], -1) for r in raw], 2)
        box_raw, cls_raw = flat.split((4 * self.reg_max, self.nc), 1)
        # anchor centers per scale
        pts, strs = [], []
        for (b_, c_, h, w), s in zip(shapes, strides):
            sy = torch.arange(h, dtype=torch.float) + 0.5
            sx = torch.arange(w, dtype=torch.float) + 0.5
            gy, gx = torch.meshgrid(sy, sx, indexing="ij")
            pts.append(torch.stack((gx, gy), -1).view(-1, 2))
            strs.append(torch.full((h * w, 1), float(s)))
        anchor_points = torch.cat(pts).transpose(0, 1)  # (2, A)
        stride_t = torch.cat(strs).transpose(0, 1)  # (1, A)
        dist = self.dfl(box_raw)  # (B, 4, A)
        lt, rb = dist.chunk(2, 1)
        x1y1 = anchor_points.unsqueeze(0) - lt
        x2y2 = anchor_points.unsqueeze(0) + rb
        boxes = torch.cat((x1y1, x2y2), 1) * stride_t
        return boxes.transpose(1, 2), cls_raw.sigmoid().transpose(1, 2)


class TYoloV8Oracle(tnn.Module):
    """ultralytics-layout YOLOv8 (variant 'n' by default)."""

    def __init__(self, nc=1, w=0.25, d=1 / 3, r=2.0):
        super().__init__()
        import math as _math

        def _w(c):
            return max(8, int(_math.ceil(c * w / 8) * 8))

        def _d(n):
            return max(1, round(n * d))

        c64, c128, c256, c512 = _w(64), _w(128), _w(256), _w(512)
        c_last = int(c512 * r)
        n3, n6 = _d(3), _d(6)
        self.model = tnn.ModuleList(
            [
                TYoloConv(3, c64, 3, 2),  # 0
                TYoloConv(c64, c128, 3, 2),  # 1
                TC2f(c128, c128, n3, True),  # 2
                TYoloConv(c128, c256, 3, 2),  # 3
                TC2f(c256, c256, n6, True),  # 4
                TYoloConv(c256, c512, 3, 2),  # 5
                TC2f(c512, c512, n6, True),  # 6
                TYoloConv(c512, c_last, 3, 2),  # 7
                TC2f(c_last, c_last, n3, True),  # 8
                TSPPF(c_last, c_last),  # 9
                tnn.Upsample(scale_factor=2, mode="nearest"),  # 10
                tnn.Identity(),  # 11 Concat
                TC2f(c_last + c512, c512, n3, False),  # 12
                tnn.Upsample(scale_factor=2, mode="nearest"),  # 13
                tnn.Identity(),  # 14 Concat
                TC2f(c512 + c256, c256, n3, False),  # 15
                TYoloConv(c256, c256, 3, 2),  # 16
                tnn.Identity(),  # 17 Concat
                TC2f(c256 + c512, c512, n3, False),  # 18
                TYoloConv(c512, c512, 3, 2),  # 19
                tnn.Identity(),  # 20 Concat
                TC2f(c512 + c_last, c_last, n3, False),  # 21
                TDetect(nc, (c256, c512, c_last)),  # 22
            ]
        )

    def forward(self, x):
        m = self.model
        y = m[0](x)
        y = m[1](y)
        y = m[2](y)
        y = m[3](y)
        p3 = m[4](y)
        y = m[5](p3)
        p4 = m[6](y)
        y = m[7](p4)
        y = m[8](y)
        p5 = m[9](y)
        u = torch.cat([m[10](p5), p4], 1)
        h4 = m[12](u)
        u = torch.cat([m[13](h4), p3], 1)
        h3 = m[15](u)
        dn = m[16](h3)
        h4b = m[18](torch.cat([dn, h4], 1))
        dn = m[19](h4b)
        h5 = m[21](torch.cat([dn, p5], 1))
        return m[22]([h3, h4b, h5])
