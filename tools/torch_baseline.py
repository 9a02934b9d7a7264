"""Reference-equivalent torch CPU baseline for bench.py.

An independent PyTorch implementation of the same architecture class the
reference wraps (attention U-Net over a resnet34 encoder,
advanced_models.py:64-357) so ``bench.py`` can measure "reference CPU
images/sec" on this machine without torchvision (not installed here).
Structurally identical compute: same layer counts, channel plan, attention
gates + SE — built directly, not loaded from torchvision.
"""

from __future__ import annotations

import time


def build_model():
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = nn.BatchNorm2d(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = nn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            r = x if self.down is None else self.down(x)
            y = self.relu(self.b1(self.c1(x)))
            y = self.b2(self.c2(y))
            return self.relu(y + r)

    def layer(cin, cout, n, stride):
        blocks = [BasicBlock(cin, cout, stride)]
        blocks += [BasicBlock(cout, cout) for _ in range(n - 1)]
        return nn.Sequential(*blocks)

    class AttGate(nn.Module):
        def __init__(self, fg, fl, fi):
            super().__init__()
            self.wg = nn.Sequential(nn.Conv2d(fg, fi, 1), nn.BatchNorm2d(fi))
            self.wx = nn.Sequential(nn.Conv2d(fl, fi, 1), nn.BatchNorm2d(fi))
            self.psi = nn.Sequential(nn.Conv2d(fi, 1, 1), nn.BatchNorm2d(1),
                                     nn.Sigmoid())
            self.relu = nn.ReLU(inplace=True)

        def forward(self, g, x):
            return x * self.psi(self.relu(self.wg(g) + self.wx(x)))

    class SE(nn.Module):
        def __init__(self, c, r=16):
            super().__init__()
            self.fc = nn.Sequential(nn.Conv2d(c, c // r, 1, bias=False),
                                    nn.ReLU(inplace=True),
                                    nn.Conv2d(c // r, c, 1, bias=False))
            self.sig = nn.Sigmoid()

        def forward(self, x):
            import torch.nn.functional as F
            a = self.fc(F.adaptive_avg_pool2d(x, 1))
            m = self.fc(F.adaptive_max_pool2d(x, 1))
            return x * self.sig(a + m)

    def dec_block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True))

    class UNetR34Att(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Conv2d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.pool = nn.MaxPool2d(3, 2, 1)
            self.l1 = layer(64, 64, 3, 1)
            self.l2 = layer(64, 128, 4, 2)
            self.l3 = layer(128, 256, 6, 2)
            self.l4 = layer(256, 512, 3, 2)
            self.up4 = nn.ConvTranspose2d(512, 256, 2, 2)
            self.d4 = dec_block(512, 256)
            self.up3 = nn.ConvTranspose2d(256, 128, 2, 2)
            self.d3 = dec_block(256, 128)
            self.up2 = nn.ConvTranspose2d(128, 64, 2, 2)
            self.d2 = dec_block(128, 64)
            self.up1 = nn.ConvTranspose2d(64, 32, 2, 2)
            self.d1 = dec_block(96, 32)
            self.up0 = nn.ConvTranspose2d(32, 16, 2, 2)
            self.head = nn.Conv2d(16, 1, 1)
            self.a4 = AttGate(256, 256, 128)
            self.a3 = AttGate(128, 128, 64)
            self.a2 = AttGate(64, 64, 32)
            self.a1 = AttGate(32, 64, 32)
            self.s4, self.s3 = SE(256), SE(128)
            self.s2, self.s1 = SE(64), SE(32)

        def forward(self, x):
            import torch
            x1 = self.relu(self.bn1(self.stem(x)))
            x2 = self.l1(self.pool(x1))
            x3 = self.l2(x2)
            x4 = self.l3(x3)
            x5 = self.l4(x4)
            d = self.up4(x5)
            d = self.s4(self.d4(torch.cat([self.a4(d, x4), d], 1)))
            d = self.up3(d)
            d = self.s3(self.d3(torch.cat([self.a3(d, x3), d], 1)))
            d = self.up2(d)
            d = self.s2(self.d2(torch.cat([self.a2(d, x2), d], 1)))
            d = self.up1(d)
            d = self.s1(self.d1(torch.cat([self.a1(d, x1), d], 1)))
            return self.head(self.up0(d))

    return UNetR34Att()


def measure_cpu_throughput(size: int = 512, batch: int = 1,
                           warmup: int = 1, iters: int = 3) -> float:
    """Images/sec of the reference-equivalent model on CPU, eval mode."""
    import torch
    torch.set_num_threads(max(torch.get_num_threads(), 1))
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
