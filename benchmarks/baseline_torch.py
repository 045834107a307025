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


def weights_init_normal(m):
    """Reference init (/root/reference/models.py:8-14): Conv* ~ N(0, 0.02);
    BatchNorm* weight ~ N(1, 0.02), bias 0. Applied by the semi driver at
    epoch 0 (/root/reference/train_semi.py:104-107)."""
    name = m.__class__.__name__
    if name.find("Conv") != -1 and hasattr(m, "weight"):
        nn.init.normal_(m.weight.data, 0.0, 0.02)
    elif name.find("BatchNorm") != -1 and hasattr(m, "weight") and m.weight is not None:
        nn.init.normal_(m.weight.data, 1.0, 0.02)
        nn.init.constant_(m.bias.data, 0.0)


def conv_in_relu(cin, cout, k, s=1, p=0, norm=True):
    layers = [nn.Conv1d(cin, cout, k, s, p)]
    if norm:
        layers.append(nn.InstanceNorm1d(cout))
    layers.append(nn.ReLU(inplace=True))
    return layers


class RefLayerNorm(nn.Module):
    """The reference's custom per-sample LayerNorm, exact semantics
    (/root/reference/models.py:965-985): whole-tensor per-sample mean and
    UNBIASED std, normalized as (x-mean)/(std+eps) — std+eps, not
    sqrt(var+eps) — then per-channel affine with gamma ~ U(0,1), beta=0.
    Replaces the round-2 GroupNorm(1,·) stand-in (VERDICT round-3 item 1)."""

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(torch.Tensor(num_features).uniform_())
        self.beta = nn.Parameter(torch.zeros(num_features))
        self.eps = eps

    def forward(self, x):
        flat = x.view(x.size(0), -1)
        mean = flat.mean(1).view(-1, 1, 1)
        std = flat.std(1).view(-1, 1, 1)
        x = (x - mean) / (std + self.eps)
        return x * self.gamma.view(1, -1, 1) + self.beta.view(1, -1, 1)


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
                   RefLayerNorm(d // 2), nn.ReLU(inplace=True)]
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


class EMNetTorch(nn.Module):
    """Torch twin of the reconstructed EMNet / EMNetLoop contract
    (iinsvae_tpu/models/emnet.py; reference call sites train.py:82,
    test.py:73): shared trunk RangeEncoder1d + EnvEncoder1d, Linear
    Classifier on the env latent, Linear Restorer on the range code.
    ``loop=True`` is the 'loops' ablation — softmax(label_est) projected
    into the range-code channels before the regressor."""

    def __init__(self, cir_len=157, num_classes=5, dim=4, style_dim=16,
                 loop=False):
        super().__init__()
        self.loop = loop
        self.num_classes = num_classes
        # RangeEncoder1d: (1,128) -> (64,8) -> (2,8)  (reference models.py:140-176)
        layers = [nn.AdaptiveAvgPool1d(128), nn.ReflectionPad1d(3)]
        layers += conv_in_relu(1, dim, 7)
        d = dim
        for _ in range(4):
            layers += conv_in_relu(d, d * 2, 4, 2, 1)
            d *= 2
        layers += [ResBlock(d) for _ in range(3)]
        layers += [nn.Conv1d(d, 2, 1), nn.ReLU(inplace=True)]
        self.range_enc = nn.Sequential(*layers)
        # EnvEncoder1d: (1,128) -> (64,32) -> style_dim (models.py:258-298)
        e = [nn.AdaptiveAvgPool1d(128), nn.ReflectionPad1d(3),
             nn.Conv1d(1, 16, 7), nn.ReLU(inplace=True),
             nn.Conv1d(16, 32, 4, 2, 1), nn.ReLU(inplace=True),
             nn.Conv1d(32, 64, 4, 2, 1), nn.ReLU(inplace=True),
             nn.AdaptiveAvgPool1d(1), nn.Conv1d(64, style_dim, 1)]
        self.env_enc = nn.Sequential(*e)
        # Restorer Linear 16 -> 512 -> 256 -> 256 -> 1 (models.py:615-658)
        self.res = nn.Sequential(
            nn.Linear(16, 512), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(512, 256), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(256, 256), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(256, 1),
        )
        # Classifier Linear style_dim -> 16 -> 32 -> 16 -> classes (models.py:838-862)
        self.cls = nn.Sequential(
            nn.Linear(style_dim, 16), nn.LeakyReLU(inplace=True),
            nn.Linear(16, 32), nn.LeakyReLU(inplace=True),
            nn.Linear(32, 16), nn.LeakyReLU(inplace=True),
            nn.Linear(16, num_classes), nn.LeakyReLU(0.2, inplace=True),
        )
        if loop:
            self.loop_proj = nn.Linear(num_classes, 2)

    def forward(self, cir):
        x = cir.unsqueeze(1)
        range_code = self.range_enc(x)           # (B, 2, 8)
        env_latent = self.env_enc(x).squeeze(-1)  # (B, style)
        logits = self.cls(env_latent)
        if self.loop:
            cond = self.loop_proj(F.softmax(logits, dim=-1))  # (B, 2)
            range_code = range_code + cond.unsqueeze(-1)
        err = self.res(range_code.flatten(1))
        return logits, env_latent, err


class IdentifierSepTorch(nn.Module):
    """Sep-E twin: env branch only (iinsvae_tpu/models/emnet.py::IdentifierSep;
    reference call sites train.py:203, test.py:282)."""

    def __init__(self, num_classes=2, style_dim=16):
        super().__init__()
        self.env_enc = nn.Sequential(
            nn.AdaptiveAvgPool1d(128), nn.ReflectionPad1d(3),
            nn.Conv1d(1, 16, 7), nn.ReLU(inplace=True),
            nn.Conv1d(16, 32, 4, 2, 1), nn.ReLU(inplace=True),
            nn.Conv1d(32, 64, 4, 2, 1), nn.ReLU(inplace=True),
            nn.AdaptiveAvgPool1d(1), nn.Conv1d(64, style_dim, 1),
        )
        self.cls = nn.Sequential(
            nn.Linear(style_dim, 16), nn.LeakyReLU(inplace=True),
            nn.Linear(16, 32), nn.LeakyReLU(inplace=True),
            nn.Linear(32, 16), nn.LeakyReLU(inplace=True),
            nn.Linear(16, num_classes), nn.LeakyReLU(0.2, inplace=True),
        )

    def forward(self, cir):
        env_latent = self.env_enc(cir.unsqueeze(1)).squeeze(-1)
        return self.cls(env_latent), env_latent


class RegressorSepTorch(nn.Module):
    """Sep-M twin: label-conditional regressor p(dd | r, k)
    (iinsvae_tpu/models/emnet.py::RegressorSep; reference train.py:316,
    test.py:284-289). One-hot label projected into the range-code channels."""

    def __init__(self, num_classes=2, dim=4):
        super().__init__()
        self.num_classes = num_classes
        layers = [nn.AdaptiveAvgPool1d(128), nn.ReflectionPad1d(3)]
        layers += conv_in_relu(1, dim, 7)
        d = dim
        for _ in range(4):
            layers += conv_in_relu(d, d * 2, 4, 2, 1)
            d *= 2
        layers += [ResBlock(d) for _ in range(3)]
        layers += [nn.Conv1d(d, 2, 1), nn.ReLU(inplace=True)]
        self.range_enc = nn.Sequential(*layers)
        self.label_proj = nn.Linear(num_classes, 2)
        self.res = nn.Sequential(
            nn.Linear(16, 512), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(512, 256), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(256, 256), nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(256, 1),
        )

    def forward(self, cir, label):
        range_code = self.range_enc(cir.unsqueeze(1))  # (B, 2, 8)
        onehot = F.one_hot(label.reshape(-1).long(), self.num_classes).float()
        range_code = range_code + self.label_proj(onehot).unsqueeze(-1)
        return self.res(range_code.flatten(1))


def _load_shared_split(args):
    """The SAME synthetic split the JAX framework trains on
    (cli/common.resolve_data with identical seed/env/n)."""
    import os

    # keep the data pipeline off the TPU tunnel; it is numpy/jax-on-CPU only
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    from iinsvae_tpu.config import Config
    from iinsvae_tpu.cli.common import resolve_data

    cfg = Config(
        dataset_env=args.env, synthetic_n=args.synthetic_n, seed=args.seed,
        n_epochs=args.epochs, mode=getattr(args, "mode", "full"),
    )
    return cfg, resolve_data(cfg)


def _lambda_lr(opt, epochs, decay_start=100):
    return torch.optim.lr_scheduler.LambdaLR(
        opt,
        lambda e: max(
            0.0, 1.0 - max(0, e - decay_start) / max(1, epochs - decay_start)
        ),
    )


def train_joint_fixture(args):
    """Torch head-to-head for north-star config 1 (run.py, train_gem):
    EMNet/EMNetLoop twin trained with CE + L1 (reference train.py:87-91) on
    the shared fixture split; reports RMSE + accuracy (VERDICT round-3
    item 3 — validates the reconstructed EMNet contract against exact
    reference training semantics)."""
    cfg, ((cir_tr, err_tr, lab_tr), (cir_te, err_te, lab_te)) = _load_shared_split(args)
    cir_tr_t = torch.from_numpy(np.ascontiguousarray(cir_tr, np.float32))
    err_tr_t = torch.from_numpy(np.ascontiguousarray(err_tr, np.float32)).reshape(-1, 1)
    lab_tr_t = torch.from_numpy(np.ascontiguousarray(lab_tr).reshape(-1)).long()
    cir_te_t = torch.from_numpy(np.ascontiguousarray(cir_te, np.float32))
    err_te_np = np.asarray(err_te, np.float32).reshape(-1)
    lab_te_np = np.asarray(lab_te).reshape(-1).astype(np.int64)

    torch.manual_seed(cfg.seed)
    net = EMNetTorch(
        cir_len=cir_tr.shape[1], num_classes=int(lab_tr_t.max()) + 1,
        loop=(args.net_ablation == "loops"),
    )
    net.apply(weights_init_normal)
    opt = torch.optim.Adam(net.parameters(), lr=1e-4, betas=(0.5, 0.999))
    sched = _lambda_lr(opt, args.epochs)
    l1, ce = nn.L1Loss(), nn.CrossEntropyLoss()

    n = cir_tr_t.shape[0]
    g = torch.Generator().manual_seed(cfg.seed)
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        perm = torch.randperm(n, generator=g)
        for s in range(0, n, args.batch):
            idx = perm[s : s + args.batch]
            opt.zero_grad()
            logits, _, err = net(cir_tr_t[idx])
            loss = ce(logits, lab_tr_t[idx]) + l1(err, err_tr_t[idx])
            loss.backward()
            opt.step()
        sched.step()
        if epoch % 20 == 0:
            print(f"[torch joint {args.net_ablation}] epoch {epoch} loss "
                  f"{loss.item():.4f} ({time.perf_counter() - t0:.0f}s)", flush=True)

    net.eval()
    errs, preds = [], []
    with torch.no_grad():
        for s in range(0, cir_te_t.shape[0], 2000):
            logits, _, err = net(cir_te_t[s : s + 2000])
            errs.append(err.numpy().reshape(-1))
            preds.append(logits.argmax(1).numpy())
    err_est = np.concatenate(errs)
    pred = np.concatenate(preds)
    print(json.dumps({
        "metric": "reference_cpu_joint_quality",
        "net_ablation": args.net_ablation,
        "rmse_m": round(float(np.sqrt(np.mean((err_est - err_te_np) ** 2))), 4),
        "accuracy": round(float(np.mean(pred == lab_te_np)), 4),
        "epochs": args.epochs,
        "train_seconds": round(time.perf_counter() - t0, 1),
        "unit": "range RMSE (m) / env accuracy (torch CPU, repaired reference semantics)",
    }))


def train_sep_fixture(args):
    """Torch head-to-head for north-star config 4 (run_sep.py): sep-E CE
    training, sep-M label-conditioned L1 training, then test_gem_sepEM's
    soft marginalized inference err = sum_k p(k|cir) * mnet(cir, k)
    (reference test.py:282-289)."""
    cfg, ((cir_tr, err_tr, lab_tr), (cir_te, err_te, lab_te)) = _load_shared_split(args)
    cir_tr_t = torch.from_numpy(np.ascontiguousarray(cir_tr, np.float32))
    err_tr_t = torch.from_numpy(np.ascontiguousarray(err_tr, np.float32)).reshape(-1, 1)
    lab_tr_t = torch.from_numpy(np.ascontiguousarray(lab_tr).reshape(-1)).long()
    cir_te_t = torch.from_numpy(np.ascontiguousarray(cir_te, np.float32))
    err_te_np = np.asarray(err_te, np.float32).reshape(-1)
    lab_te_np = np.asarray(lab_te).reshape(-1).astype(np.int64)
    num_classes = int(lab_tr_t.max()) + 1

    torch.manual_seed(cfg.seed)
    enet = IdentifierSepTorch(num_classes=num_classes)
    mnet = RegressorSepTorch(num_classes=num_classes)
    enet.apply(weights_init_normal)
    mnet.apply(weights_init_normal)
    opt_e = torch.optim.Adam(enet.parameters(), lr=1e-4, betas=(0.5, 0.999))
    opt_m = torch.optim.Adam(mnet.parameters(), lr=1e-4, betas=(0.5, 0.999))
    sched_e = _lambda_lr(opt_e, args.epochs)
    sched_m = _lambda_lr(opt_m, args.epochs)
    l1, ce = nn.L1Loss(), nn.CrossEntropyLoss()

    n = cir_tr_t.shape[0]
    g = torch.Generator().manual_seed(cfg.seed)
    t0 = time.perf_counter()
    # sep-E (reference train_gem_sepE, train.py:159-268)
    for epoch in range(args.epochs):
        perm = torch.randperm(n, generator=g)
        for s in range(0, n, args.batch):
            idx = perm[s : s + args.batch]
            opt_e.zero_grad()
            logits, _ = enet(cir_tr_t[idx])
            loss = ce(logits, lab_tr_t[idx])
            loss.backward()
            opt_e.step()
        sched_e.step()
        if epoch % 50 == 0:
            print(f"[torch sep-E] epoch {epoch} loss {loss.item():.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    # sep-M on ground-truth labels (reference train_gem_sepM, train.py:271-382)
    for epoch in range(args.epochs):
        perm = torch.randperm(n, generator=g)
        for s in range(0, n, args.batch):
            idx = perm[s : s + args.batch]
            opt_m.zero_grad()
            err = mnet(cir_tr_t[idx], lab_tr_t[idx])
            loss = l1(err, err_tr_t[idx])
            loss.backward()
            opt_m.step()
        sched_m.step()
        if epoch % 50 == 0:
            print(f"[torch sep-M] epoch {epoch} loss {loss.item():.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    enet.eval(); mnet.eval()
    errs, preds = [], []
    with torch.no_grad():
        for s in range(0, cir_te_t.shape[0], 2000):
            chunk = cir_te_t[s : s + 2000]
            logits, _ = enet(chunk)
            probs = F.softmax(logits, dim=-1)
            est = sum(
                probs[:, k : k + 1]
                * mnet(chunk, torch.full((chunk.shape[0],), k))
                for k in range(num_classes)
            )
            errs.append(est.numpy().reshape(-1))
            preds.append(logits.argmax(1).numpy())
    err_est = np.concatenate(errs)
    pred = np.concatenate(preds)
    print(json.dumps({
        "metric": "reference_cpu_sep_quality",
        "sepE_accuracy": round(float(np.mean(pred == lab_te_np)), 4),
        "sepEM_rmse_m": round(float(np.sqrt(np.mean((err_est - err_te_np) ** 2))), 4),
        "epochs": args.epochs,
        "train_seconds": round(time.perf_counter() - t0, 1),
        "unit": "sep-E accuracy / sep-EM soft-marginalized RMSE (torch CPU)",
    }))


def train_fixture(args):
    """Head-to-head quality parity: train SemiNet to convergence on the SAME
    synthetic split the JAX framework trains on (cli/common.resolve_data with
    identical seed/env/n) and report range-RMSE + env accuracy — parity
    evidence against the repaired reference *semantics*, not just the SVM
    (VERDICT round-1 item 2)."""
    cfg, ((cir_tr, err_tr, lab_tr), (cir_te, err_te, lab_te)) = _load_shared_split(args)
    cir_tr_t = torch.from_numpy(np.ascontiguousarray(cir_tr, np.float32))
    err_tr_t = torch.from_numpy(np.ascontiguousarray(err_tr, np.float32)).reshape(-1, 1)
    lab_tr_t = torch.from_numpy(np.ascontiguousarray(lab_tr).reshape(-1)).long()
    cir_te_t = torch.from_numpy(np.ascontiguousarray(cir_te, np.float32))
    err_te_np = np.asarray(err_te, np.float32).reshape(-1)
    lab_te_np = np.asarray(lab_te).reshape(-1).astype(np.int64)

    torch.manual_seed(cfg.seed)
    net = SemiNet(cir_len=cir_tr.shape[1], num_classes=int(lab_tr_t.max()) + 1)
    net.apply(weights_init_normal)
    opt = torch.optim.Adam(net.parameters(), lr=1e-4, betas=(0.5, 0.999))
    decay_start = getattr(args, "decay_epoch", 100)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt,
        lambda e: 1.0 - max(0, e - decay_start) / max(1, args.epochs - decay_start),
    )
    l1 = nn.L1Loss()
    ce = nn.CrossEntropyLoss()

    n = cir_tr_t.shape[0]
    g = torch.Generator().manual_seed(cfg.seed)
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        perm = torch.randperm(n, generator=g)
        for s in range(0, n, args.batch):
            idx = perm[s : s + args.batch]
            cir, err_gt, label_gt = cir_tr_t[idx], err_tr_t[idx], lab_tr_t[idx]
            opt.zero_grad()
            recon, err, logits, kl = net(cir)
            loss = l1(cir, recon) + kl + 10.0 * l1(err_gt, err) + ce(logits, label_gt)
            loss.backward()
            opt.step()
        sched.step()
        if epoch % 20 == 0:
            print(f"[torch fixture] epoch {epoch} loss {loss.item():.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    net.eval()
    errs, preds = [], []
    with torch.no_grad():
        for s in range(0, cir_te_t.shape[0], 2000):
            recon, err, logits, kl = net(cir_te_t[s : s + 2000])
            errs.append(err.numpy().reshape(-1))
            preds.append(logits.argmax(1).numpy())
    err_est = np.concatenate(errs)
    pred = np.concatenate(preds)
    rmse = float(np.sqrt(np.mean((err_est - err_te_np) ** 2)))
    acc = float(np.mean(pred == lab_te_np))
    print(json.dumps({
        "metric": "reference_cpu_fixture_quality",
        "rmse_m": round(rmse, 4),
        "accuracy": round(acc, 4),
        "epochs": args.epochs,
        "train_seconds": round(time.perf_counter() - t0, 1),
        "unit": "range RMSE (m) / env accuracy (torch CPU, repaired reference semantics)",
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--fixture", action="store_true",
                    help="train to convergence on the shared synthetic split "
                         "and report RMSE/accuracy instead of timing steps")
    ap.add_argument("--twin", default="semi", choices=["semi", "joint", "sep"],
                    help="which architecture-exact twin --fixture trains: the "
                         "semi path (SemiNet), the joint supervised path "
                         "(EMNet/EMNetLoop), or the separated two-stage path")
    ap.add_argument("--net_ablation", default="loop", choices=["loop", "loops"],
                    help="joint twin: EMNet (loop) or EMNetLoop (loops)")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--synthetic_n", type=int, default=10000)
    ap.add_argument("--env", default="room_full")
    ap.add_argument("--decay_epoch", type=int, default=100,
                    help="LambdaLR decay start (reference train_semi.py:125)")
    ap.add_argument("--mode", default="full", choices=["full", "paper"],
                    help="split mode (paper = hold out the medium room, "
                         "reference dataset.py:37-56)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.fixture:
        {"semi": train_fixture,
         "joint": train_joint_fixture,
         "sep": train_sep_fixture}[args.twin](args)
        return

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
