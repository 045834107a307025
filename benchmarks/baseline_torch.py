#!/usr/bin/env python
"""Measure the reference's CPU training throughput (the BASELINE.md anchor).

The reference repo publishes no numbers and its shipped code does not run
(SURVEY.md §2.4), so the baseline is the *repaired reference semantics*:
the same semi-supervised architecture (RangeEncoder1d + EnvEncoder1d +
AdaIN Decoder1d + Linear Restorer/Classifier, shapes from reference
models.py comments) and the same per-batch objective, implemented
independently in PyTorch, trained on host CPU at batch 500 — i.e. what the
reference would cost per sample if its defects were fixed.

Usage: python benchmarks/baseline_torch.py [--steps 30] [--batch 500]
Prints a JSON line with samples/sec.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def conv_in_relu(cin, cout, k, s=1, p=0, norm=True):
    layers = [nn.Conv1d(cin, cout, k, s, p)]
    if norm:
        layers.append(nn.InstanceNorm1d(cout))
    layers.append(nn.ReLU(inplace=True))
    return layers


class ResBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad1d(1), nn.Conv1d(c, c, 3), nn.InstanceNorm1d(c),
            nn.ReLU(inplace=True),
            nn.ReflectionPad1d(1), nn.Conv1d(c, c, 3), nn.InstanceNorm1d(c),
        )

    def forward(self, x):
        return x + self.block(x)


class AdainResBlock(nn.Module):
    """Residual block whose norms take per-sample (gamma, beta)."""

    def __init__(self, c):
        super().__init__()
        self.pad = nn.ReflectionPad1d(1)
        self.conv1 = nn.Conv1d(c, c, 3)
        self.conv2 = nn.Conv1d(c, c, 3)

    @staticmethod
    def _adain(x, g, b):
        y = F.instance_norm(x)
        return y * g.unsqueeze(-1) + b.unsqueeze(-1)

    def forward(self, x, g1, b1, g2, b2):
        y = self._adain(self.conv1(self.pad(x)), g1, b1)
        y = F.relu(y, inplace=True)
        y = self._adain(self.conv2(self.pad(y)), g2, b2)
        return x + y


class SemiNet(nn.Module):
    """Enc + AdaIN Dec + Restorer + Classifier, reference-sized."""

    def __init__(self, cir_len=157, num_classes=5, dim=4, style_dim=16):
        super().__init__()
        self.cir_len = cir_len
        # RangeEncoder1d: (1,128) -> (64,8) -> (2,8)
        layers = [nn.AdaptiveAvgPool1d(128), nn.ReflectionPad1d(3)]
        layers += conv_in_relu(1, dim, 7)
        d = dim
        for _ in range(4):
            layers += conv_in_relu(d, d * 2, 4, 2, 1)
            d *= 2
        layers += [ResBlock(d) for _ in range(3)]
        layers += [nn.Conv1d(d, 2, 1), nn.ReLU(inplace=True)]
        self.range_enc = nn.Sequential(*layers)
        # EnvEncoder1d: (1,128) -> (64,32) -> style_dim
        e = [nn.AdaptiveAvgPool1d(128), nn.ReflectionPad1d(3),
             nn.Conv1d(1, 16, 7), nn.ReLU(inplace=True),
             nn.Conv1d(16, 32, 4, 2, 1), nn.ReLU(inplace=True),
             nn.Conv1d(32, 64, 4, 2, 1), nn.ReLU(inplace=True),
             nn.AdaptiveAvgPool1d(1), nn.Conv1d(64, style_dim, 1)]
        self.env_enc = nn.Sequential(*e)
        # Decoder1d
        self.dec_in = nn.Conv1d(2, 64, 1)
        self.dec_res = nn.ModuleList([AdainResBlock(64) for _ in range(3)])
        up = []
        d = 64
        for _ in range(4):
            up += [nn.Upsample(scale_factor=2), nn.Conv1d(d, d // 2, 5, 1, 2),
                   nn.GroupNorm(1, d // 2), nn.ReLU(inplace=True)]
            d //= 2
        up += [nn.ReflectionPad1d(3), nn.Conv1d(d, 1, 7), nn.Tanh(),
               nn.AdaptiveAvgPool1d(cir_len)]
        self.dec_up = nn.Sequential(*up)
        n_adain = 3 * 2 * 2 * 64
        self.mlp = nn.Sequential(
            nn.Linear(style_dim, 256), nn.ReLU(inplace=True),
            nn.Linear(256, 256), nn.ReLU(inplace=True), nn.Linear(256, n_adain),
        )
        # Restorer Linear 16 -> 512 -> 256 -> 256 -> 1
        self.res = nn.Sequential(
            nn.Linear(16, 512), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(512, 256), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(256, 256), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(256, 1),
        )
        # Classifier Linear style_dim -> 16 -> 32 -> 16 -> classes
        self.cls = nn.Sequential(
            nn.Linear(style_dim, 16), nn.LeakyReLU(inplace=True),
            nn.Linear(16, 32), nn.LeakyReLU(inplace=True),
            nn.Linear(32, 16), nn.LeakyReLU(inplace=True),
            nn.Linear(16, num_classes), nn.LeakyReLU(0.2, inplace=True),
        )

    def forward(self, cir):
        x = cir.unsqueeze(1)
        range_code = self.range_enc(x)  # (B, 2, 8)
        cat = self.env_enc(x).squeeze(-1)  # (B, style)
        mu, ls = torch.chunk(cat, 2, dim=1)
        kl = (0.5 * ((2 * ls).exp() + mu**2 - 1 - 2 * ls).sum(1)).mean()
        # decoder with adain params from the env code
        p = self.mlp(cat)
        y = F.relu(self.dec_in(range_code), inplace=True)
        off = 0
        for blk in self.dec_res:
            b1, g1 = p[:, off:off + 64], p[:, off + 64:off + 128]
            b2, g2 = p[:, off + 128:off + 192], p[:, off + 192:off + 256]
            y = blk(y, g1, b1, g2, b2)
            off += 256
        recon = self.dec_up(y).squeeze(1)
        err = self.res(range_code.flatten(1))
        logits = self.cls(cat)
        return recon, err, logits, kl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=500)
    args = ap.parse_args()

    torch.manual_seed(0)
    net = SemiNet()
    opt = torch.optim.Adam(net.parameters(), lr=1e-4, betas=(0.5, 0.999))
    l1 = nn.L1Loss()
    ce = nn.CrossEntropyLoss()

    rng = np.random.default_rng(0)
    cir = torch.from_numpy(rng.standard_normal((args.batch, 157)).astype(np.float32))
    err_gt = torch.from_numpy(np.abs(rng.standard_normal((args.batch, 1))).astype(np.float32))
    label_gt = torch.from_numpy(rng.integers(0, 5, (args.batch,)).astype(np.int64))

    def step():
        opt.zero_grad()
        recon, err, logits, kl = net(cir)
        loss = l1(cir, recon) + kl + 10.0 * l1(err_gt, err) + ce(logits, label_gt)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    elapsed = time.perf_counter() - t0
    sps = args.batch * args.steps / elapsed
    print(json.dumps({
        "metric": "reference_cpu_train_throughput",
        "value": round(sps, 1),
        "unit": "CIR samples/sec (torch CPU, repaired reference semantics)",
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
