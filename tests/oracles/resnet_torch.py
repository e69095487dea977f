"""Minimal torch ResNet-50 + FPN oracle with torchvision/mmdet naming.

Replicates the architectures the reference gets from torchvision / mmdet
(``configs/dp/models/faster_rcnn_r50_fpn.py``) for fp32 parity tests of
the JAX implementations. Supports both stride placements:
``style='pytorch'`` (stride in conv2) and ``'caffe'`` (stride in conv1).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):

    def __init__(self, c_in, c_mid, stride, style):
        super().__init__()
        s1, s2 = (stride, 1) if style == 'caffe' else (1, stride)
        self.conv1 = nn.Conv2d(c_in, c_mid, 1, stride=s1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_mid)
        self.conv2 = nn.Conv2d(
            c_mid, c_mid, 3, stride=s2, padding=1, bias=False
        )
        self.bn2 = nn.BatchNorm2d(c_mid)
        self.conv3 = nn.Conv2d(c_mid, c_mid * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(c_mid * 4)
        if stride != 1 or c_in != c_mid * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_mid * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(c_mid * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return F.relu(out + identity)


class ResNet(nn.Module):

    def __init__(self, blocks=(3, 4, 6, 3), base=64, style='pytorch'):
        super().__init__()
        self.conv1 = nn.Conv2d(3, base, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(base)
        c_in = base
        for i, n in enumerate(blocks):
            c_mid = base * (2 ** i)
            stage = []
            for b in range(n):
                stage.append(
                    Bottleneck(
                        c_in if b == 0 else c_mid * 4,
                        c_mid,
                        (1 if i == 0 else 2) if b == 0 else 1,
                        style,
                    )
                )
                c_in = c_mid * 4
            setattr(self, f'layer{i + 1}', nn.Sequential(*stage))
        self.n_stages = len(blocks)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for i in range(self.n_stages):
            x = getattr(self, f'layer{i + 1}')(x)
            outs.append(x)
        return outs


class ConvModule(nn.Module):
    """mmdet ConvModule with BN (conv no bias)."""

    def __init__(self, c_in, c_out, k, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, k, padding=padding, bias=False)
        self.bn = nn.BatchNorm2d(c_out)

    def forward(self, x):
        return self.bn(self.conv(x))


class FPN(nn.Module):
    """mmdet FPN: laterals + top-down nearest + 3x3 outs + maxpool P6."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), out=256,
                 num_outs=5):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [ConvModule(c, out, 1) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [ConvModule(out, out, 3, padding=1) for _ in in_channels]
        )
        self.num_outs = num_outs

    def forward(self, feats):
        laterals = [l(f) for l, f in zip(self.lateral_convs, feats)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], scale_factor=2, mode='nearest'
            )
        outs = [conv(x) for conv, x in zip(self.fpn_convs, laterals)]
        while len(outs) < self.num_outs:
            outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


@torch.no_grad()
def randomize_bn_stats(module, seed=0):
    """Give BNs non-trivial running stats so eval-mode parity is a real
    test."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.num_features, generator=g) * 0.5 + 0.75
            )
            m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
