"""Numeric parity tests for ops against torch (CPU) as the oracle.

torch here is only the *oracle* — the framework itself never imports it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from iinsvae_tpu.ops.pooling import adaptive_avg_pool1d, adaptive_avg_pool2d
from iinsvae_tpu.ops.conv import conv1d, conv2d, reflect_pad1d, upsample_nearest1d
from iinsvae_tpu.ops.norms import instance_norm, adain, sample_layer_norm


@pytest.mark.parametrize("l_in,l_out", [(157, 128), (152, 128), (128, 157), (128, 152), (16, 1)])
def test_adaptive_avg_pool1d_matches_torch(rng, l_in, l_out):
    x = rng.normal(size=(3, l_in, 2)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), l_out))
    want = F.adaptive_avg_pool1d(torch.from_numpy(x).permute(0, 2, 1), l_out).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_adaptive_avg_pool2d_matches_torch(rng):
    x = rng.normal(size=(2, 152, 152, 1)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), 128))
    want = (
        F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 128)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "k,stride,pad,pad_mode",
    [(7, 1, 3, "reflect"), (4, 2, 1, "zero"), (1, 1, 0, "zero"), (5, 1, 2, "zero"), (3, 1, 1, "reflect")],
)
def test_conv1d_matches_torch(rng, k, stride, pad, pad_mode):
    b, l, cin, cout = 4, 128, 3, 8
    x = rng.normal(size=(b, l, cin)).astype(np.float32)
    w = rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.normal(size=(cout,)).astype(np.float32)
    got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), stride=stride, padding=pad, pad_mode=pad_mode))
    xt = torch.from_numpy(x).permute(0, 2, 1)
    if pad_mode == "reflect":
        xt = F.pad(xt, (pad, pad), mode="reflect")
        tpad = 0
    else:
        tpad = pad
    wt = torch.from_numpy(w).permute(2, 1, 0)  # (cout, cin, k)
    want = F.conv1d(xt, wt, torch.from_numpy(bias), stride=stride, padding=tpad).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_matches_torch(rng):
    b, h, cin, cout = 2, 16, 3, 4
    x = rng.normal(size=(b, h, h, cin)).astype(np.float32)
    w = rng.normal(size=(4, 4, cin, cout)).astype(np.float32) * 0.1
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1))
    want = (
        F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w).permute(3, 2, 0, 1), stride=2, padding=1)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch(rng):
    x = rng.normal(size=(4, 32, 8)).astype(np.float32) * 3 + 1
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = F.instance_norm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_adain_matches_reference_semantics(rng):
    """AdaIN == F.batch_norm over a (1, B*C, W) reshape with per-sample
    weight/bias (reference models.py:1061-1076)."""
    b, l, c = 3, 16, 4
    x = rng.normal(size=(b, l, c)).astype(np.float32)
    gamma = rng.normal(size=(b, c)).astype(np.float32)
    beta = rng.normal(size=(b, c)).astype(np.float32)
    got = np.asarray(adain(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))

    xt = torch.from_numpy(x).permute(0, 2, 1)  # (B, C, W)
    x_r = xt.contiguous().view(1, b * c, l)
    rm = torch.zeros(c).repeat(b)
    rv = torch.ones(c).repeat(b)
    wt = torch.from_numpy(gamma).reshape(-1)
    bt = torch.from_numpy(beta).reshape(-1)
    want = F.batch_norm(x_r, rm, rv, wt, bt, True, 0.1, 1e-5).view(b, c, l).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sample_layer_norm_matches_reference_semantics(rng):
    """Custom LayerNorm (reference models.py:976-985): per-sample whole-
    tensor mean/UNBIASED std, denominator (std + eps), per-channel affine."""
    b, l, c = 3, 16, 4
    x = rng.normal(size=(b, l, c)).astype(np.float32)
    gamma = rng.uniform(size=(c,)).astype(np.float32)
    beta = rng.normal(size=(c,)).astype(np.float32)
    got = np.asarray(sample_layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))

    xt = torch.from_numpy(x).permute(0, 2, 1)
    mean = xt.reshape(b, -1).mean(1).view(b, 1, 1)
    std = xt.reshape(b, -1).std(1).view(b, 1, 1)
    y = (xt - mean) / (std + 1e-5)
    y = y * torch.from_numpy(gamma).view(1, -1, 1) + torch.from_numpy(beta).view(1, -1, 1)
    want = y.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_reflect_pad_and_upsample(rng):
    x = rng.normal(size=(2, 8, 3)).astype(np.float32)
    got = np.asarray(reflect_pad1d(jnp.asarray(x), 3))
    want = F.pad(torch.from_numpy(x).permute(0, 2, 1), (3, 3), mode="reflect").permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want)

    got_u = np.asarray(upsample_nearest1d(jnp.asarray(x), 2))
    want_u = F.interpolate(torch.from_numpy(x).permute(0, 2, 1), scale_factor=2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got_u, want_u)
