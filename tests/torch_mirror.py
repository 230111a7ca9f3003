"""Test-only torch mirror of the reference IMHN.

Rebuilt from the documented reference architecture (models/posenet.py:50-122,
models/layers_transposed.py:12-310) with the reference's module/attribute
NAMES so that ``state_dict()`` keys match the released checkpoints. Used
exclusively to verify that utils/checkpoint.convert_torch_state_dict +
models/imhn.PoseNet reproduce the torch forward numerics exactly — the
framework itself never imports torch.
"""

import torch
from torch import nn


class TConv(nn.Module):
    def __init__(self, ins, outs, k=3, stride=1, bn=True, relu=True, dilation=1):
        super().__init__()
        pad = dilation * (k - 1) // 2
        self.relu = nn.LeakyReLU(0.01, inplace=True) if relu else None
        if bn:
            self.conv = nn.Conv2d(ins, outs, k, stride, pad, bias=False,
                                  dilation=dilation)
            self.bn = nn.BatchNorm2d(outs)
        else:
            self.conv = nn.Conv2d(ins, outs, k, stride, pad, bias=True,
                                  dilation=dilation)
            self.bn = None

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        if self.relu is not None:
            x = self.relu(x)
        return x


class TResidual(nn.Module):
    def __init__(self, ins, outs, bn=True, relu=True):
        super().__init__()
        self.relu_flag = relu
        mid = outs // 2
        self.convBlock = nn.Sequential(
            nn.Conv2d(ins, mid, 1, bias=False), nn.BatchNorm2d(mid),
            nn.LeakyReLU(0.01, inplace=True),
            nn.Conv2d(mid, mid, 3, 1, 1, bias=False), nn.BatchNorm2d(mid),
            nn.LeakyReLU(0.01, inplace=True),
            nn.Conv2d(mid, outs, 1, bias=False), nn.BatchNorm2d(outs),
        )
        if ins != outs:
            self.skipConv = nn.Sequential(
                nn.Conv2d(ins, outs, 1, bias=False), nn.BatchNorm2d(outs))
        self.relu = nn.LeakyReLU(0.01, inplace=True)
        self.ins, self.outs = ins, outs

    def forward(self, x):
        r = x if self.ins == self.outs else self.skipConv(x)
        x = self.convBlock(x) + r
        return self.relu(x) if self.relu_flag else x


class TBackbone(nn.Module):
    def __init__(self, out_dim=256):
        super().__init__()
        q, h = out_dim // 4, out_dim // 2
        self.conv1 = nn.Conv2d(3, q, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(q)
        self.relu = nn.LeakyReLU(0.01, inplace=True)
        self.res1 = TResidual(q, h)
        self.pool = nn.MaxPool2d(2, 2)
        self.res2 = TResidual(h, h)
        self.dilation = nn.Sequential(*[
            TConv(h, h, 3, dilation=d) for d in (3, 3, 4, 4, 5, 5)])

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.pool(self.res1(x))
        x = self.res2(x)
        return torch.cat([x, self.dilation(x)], dim=1)


class THourglass(nn.Module):
    def __init__(self, depth, nfeat, increase, bn=True):
        super().__init__()
        self.depth = depth
        hg = []
        for d in range(depth):
            c = nfeat + increase * d
            cn = c + increase
            mods = [TResidual(c, c, bn), TResidual(c, cn, bn),
                    TResidual(cn, c, bn), TConv(c, c, 3, bn=bn)]
            if d == depth - 1:
                mods.append(TResidual(cn, cn, bn))
            hg.append(nn.ModuleList(mods))
        self.hg = nn.ModuleList(hg)
        self.downsample = nn.MaxPool2d(2, 2)
        self.upsample = nn.Upsample(scale_factor=2, mode="nearest")

    def _fwd(self, d, x, downs):
        up1 = self.hg[d][0](x)
        low = self.hg[d][1](self.downsample(x))
        low2 = self.hg[d][4](low) if d == self.depth - 1 else self._fwd(d + 1, low, downs)
        low3 = self.hg[d][2](low2)
        downs.append(low2)
        return up1 + self.hg[d][3](self.upsample(low3))

    def forward(self, x):
        downs = []
        top = self._fwd(0, x, downs)
        return [top] + downs[::-1]


class TSELayer(nn.Module):
    def __init__(self, c, reduction=16):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Sequential(
            nn.Linear(c, c // reduction), nn.LeakyReLU(0.01, inplace=True),
            nn.Linear(c // reduction, c), nn.Sigmoid())

    def forward(self, x):
        b, c, _, _ = x.shape
        y = self.fc(self.avg_pool(x).view(b, c)).view(b, c, 1, 1)
        return x * y


class TMerge(nn.Module):
    def __init__(self, x_dim, y_dim, bn=True):
        super().__init__()
        self.conv = TConv(x_dim, y_dim, 1, relu=False, bn=bn)

    def forward(self, x):
        return self.conv(x)


class TFeatures(nn.Module):
    def __init__(self, inp_dim, increase, bn=True, reduction=16):
        super().__init__()
        self.before_regress = nn.ModuleList([
            nn.Sequential(TConv(inp_dim + i * increase, inp_dim, 3, bn=bn),
                          TConv(inp_dim, inp_dim, 3, bn=bn),
                          TSELayer(inp_dim, reduction))
            for i in range(5)])

    def forward(self, fms):
        return [self.before_regress[i](f) for i, f in enumerate(fms)]


class TPoseNet(nn.Module):
    def __init__(self, nstack, inp_dim, oup_dim, increase, bn=True, reduction=16):
        super().__init__()
        self.pre = TBackbone(inp_dim)
        self.hourglass = nn.ModuleList()
        self.features = nn.ModuleList()
        self.outs = nn.ModuleList()
        self.merge_features = nn.ModuleList()
        self.merge_preds = nn.ModuleList()
        for t in range(nstack):
            self.hourglass.append(THourglass(4, inp_dim, increase, bn))
            self.features.append(TFeatures(inp_dim, increase, bn, reduction))
            self.outs.append(nn.ModuleList(
                [TConv(inp_dim, oup_dim, 1, relu=False, bn=False) for _ in range(5)]))
            if t < nstack - 1:
                self.merge_features.append(nn.ModuleList(
                    [TMerge(inp_dim, inp_dim + j * increase, bn) for j in range(5)]))
                self.merge_preds.append(nn.ModuleList(
                    [TMerge(oup_dim, inp_dim + j * increase, bn) for j in range(5)]))
        self.nstack = nstack

    def forward(self, imgs_nhwc):
        x = imgs_nhwc.permute(0, 3, 1, 2)
        x = self.pre(x)
        preds = []
        caches = [None] * 5
        for t in range(self.nstack):
            hg_outs = self.hourglass[t](x)
            if t > 0:
                hg_outs = [hg_outs[s] + caches[s] for s in range(5)]
            feats = self.features[t](hg_outs)
            stack = []
            for s in range(5):
                pred = self.outs[t][s](feats[s])
                stack.append(pred)
                if t != self.nstack - 1:
                    cache = (self.merge_preds[t][s](pred)
                             + self.merge_features[t][s](feats[s]))
                    if s == 0:
                        x = x + cache
                    caches[s] = cache
            preds.append(stack)
        return preds
