"""Reference-equivalent torch CPU model.

Two jobs:
1. ``bench.py`` baseline — measure "reference CPU images/sec" on this
   machine (torchvision isn't installed here, so the architecture class the
   reference wraps — attention U-Net over a resnet34 encoder,
   advanced_models.py:64-357 — is built directly).
2. Weight-conversion fixture — parameter names follow the reference /
   torchvision naming (``input_conv``, ``bn1``, ``enc{1-4}.{i}.conv1`` …,
   ``upconv4``, ``decoder4.0`` …, ``attention4.W_g.0`` …,
   ``ch_attention4.fc.0`` …) so its ``state_dict()`` exercises
   ``segtpu.models.torch_convert`` end-to-end in tests.
"""

from __future__ import annotations

import time


def build_model(use_attention: bool = True):
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + r)

    def layer(cin, cout, n, stride):
        blocks = [BasicBlock(cin, cout, stride)]
        blocks += [BasicBlock(cout, cout) for _ in range(n - 1)]
        return nn.Sequential(*blocks)

    class AttentionGate(nn.Module):
        def __init__(self, fg, fl, fi):
            super().__init__()
            self.W_g = nn.Sequential(nn.Conv2d(fg, fi, 1), nn.BatchNorm2d(fi))
            self.W_x = nn.Sequential(nn.Conv2d(fl, fi, 1), nn.BatchNorm2d(fi))
            self.psi = nn.Sequential(nn.Conv2d(fi, 1, 1), nn.BatchNorm2d(1),
                                     nn.Sigmoid())
            self.relu = nn.ReLU(inplace=True)

        def forward(self, g, x):
            return x * self.psi(self.relu(self.W_g(g) + self.W_x(x)))

    class ChannelAttention(nn.Module):
        def __init__(self, c, r=16):
            super().__init__()
            self.fc = nn.Sequential(nn.Conv2d(c, c // r, 1, bias=False),
                                    nn.ReLU(inplace=True),
                                    nn.Conv2d(c // r, c, 1, bias=False))
            self.sigmoid = nn.Sigmoid()

        def forward(self, x):
            import torch.nn.functional as F
            a = self.fc(F.adaptive_avg_pool2d(x, 1))
            m = self.fc(F.adaptive_max_pool2d(x, 1))
            return x * self.sigmoid(a + m)

    def decoder_block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True))

    class UNetR34(nn.Module):
        def __init__(self):
            super().__init__()
            self.use_attention = use_attention
            self.input_conv = nn.Conv2d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.enc1 = layer(64, 64, 3, 1)
            self.enc2 = layer(64, 128, 4, 2)
            self.enc3 = layer(128, 256, 6, 2)
            self.enc4 = layer(256, 512, 3, 2)
            self.upconv4 = nn.ConvTranspose2d(512, 256, 2, 2)
            self.decoder4 = decoder_block(512, 256)
            self.upconv3 = nn.ConvTranspose2d(256, 128, 2, 2)
            self.decoder3 = decoder_block(256, 128)
            self.upconv2 = nn.ConvTranspose2d(128, 64, 2, 2)
            self.decoder2 = decoder_block(128, 64)
            self.upconv1 = nn.ConvTranspose2d(64, 32, 2, 2)
            self.decoder1 = decoder_block(96, 32)
            self.upconv0 = nn.ConvTranspose2d(32, 16, 2, 2)
            self.conv_final = nn.Conv2d(16, 1, 1)
            if use_attention:
                self.attention4 = AttentionGate(256, 256, 128)
                self.attention3 = AttentionGate(128, 128, 64)
                self.attention2 = AttentionGate(64, 64, 32)
                self.attention1 = AttentionGate(32, 64, 32)
                self.ch_attention4 = ChannelAttention(256)
                self.ch_attention3 = ChannelAttention(128)
                self.ch_attention2 = ChannelAttention(64)
                self.ch_attention1 = ChannelAttention(32)

        def forward(self, x):
            import torch
            x1 = self.relu(self.bn1(self.input_conv(x)))
            x2 = self.enc1(self.maxpool(x1))
            x3 = self.enc2(x2)
            x4 = self.enc3(x3)
            x5 = self.enc4(x4)

            d = self.upconv4(x5)
            if self.use_attention:
                d = self.ch_attention4(self.decoder4(
                    torch.cat([self.attention4(d, x4), d], 1)))
            else:
                d = self.decoder4(torch.cat([x4, d], 1))
            d = self.upconv3(d)
            if self.use_attention:
                d = self.ch_attention3(self.decoder3(
                    torch.cat([self.attention3(d, x3), d], 1)))
            else:
                d = self.decoder3(torch.cat([x3, d], 1))
            d = self.upconv2(d)
            if self.use_attention:
                d = self.ch_attention2(self.decoder2(
                    torch.cat([self.attention2(d, x2), d], 1)))
            else:
                d = self.decoder2(torch.cat([x2, d], 1))
            d = self.upconv1(d)
            if self.use_attention:
                d = self.ch_attention1(self.decoder1(
                    torch.cat([self.attention1(d, x1), d], 1)))
            else:
                d = self.decoder1(torch.cat([x1, d], 1))
            return self.conv_final(self.upconv0(d))

    return UNetR34()


def measure_cpu_throughput(size: int = 512, batch: int = 1,
                           warmup: int = 1, iters: int = 3) -> float:
    """Images/sec of the reference-equivalent model on CPU, eval mode."""
    import torch
    model = build_model().eval()
    x = torch.randn(batch, 1, size, size)
    with torch.no_grad():
        for _ in range(warmup):
            model(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    return batch * iters / dt


if __name__ == "__main__":
    print(measure_cpu_throughput())
