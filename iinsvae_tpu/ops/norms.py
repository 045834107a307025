"""Normalization ops with the reference's exact numerics.

Three norm flavours appear in the reference model zoo and each has a quirk
that matters for output parity:

* InstanceNorm (reference models.py:152 etc.): torch ``nn.InstanceNorm1d``
  with default args — NO affine, NO running stats, biased variance,
  eps=1e-5, identical in train and eval.
* AdaIN (reference models.py:1048-1113): instance norm whose per-sample
  (gamma, beta) are *externally assigned* from an MLP on the env code. The
  reference implements it as ``F.batch_norm`` over a (1, B*C, W) reshape,
  which is instance norm with biased variance. Here it is a pure function
  taking (gamma, beta) — the module-walking mutation is gone.
* "LayerNorm" (reference models.py:965-985): a custom per-sample whole-tensor
  norm that uses torch's UNBIASED std and divides by ``std + eps`` (not
  ``sqrt(var + eps)``), then applies a per-channel affine.

All functions take channels-last inputs: (B, L, C) or (B, H, W, C); the
spatial axes are every axis between batch and channel.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _spatial_axes(x: jnp.ndarray) -> tuple:
    return tuple(range(1, x.ndim - 1))


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) normalization over the spatial axes."""
    axes = _spatial_axes(x)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)  # biased, as torch IN
    return (x - mean) * lax.rsqrt(var + eps)


def adain(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Adaptive instance norm: IN(x) * gamma + beta with per-sample params.

    gamma, beta: (B, C) — broadcast over the spatial axes.
    """
    y = instance_norm(x, eps)
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    return y * gamma.reshape(shape).astype(y.dtype) + beta.reshape(shape).astype(y.dtype)


def sample_layer_norm_stats(x: jnp.ndarray):
    """Per-sample whole-tensor (mean, unbiased std) of the reference's
    custom LayerNorm (models.py:965-985). Split out so a consumer that
    keeps only a SLICE of the normalized tensor can still take the stats
    over the FULL tensor (the fast 2-D decoder's last upsample stage)."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    mean = jnp.mean(flat, axis=1)
    n = flat.shape[1]
    var = jnp.var(flat, axis=1) * (n / (n - 1))  # unbiased, torch .std(1)
    std = jnp.sqrt(var)
    return mean, std


def sample_layer_norm_apply(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Normalize x with externally-computed per-sample (mean, std) —
    denominator (std + eps), per-channel affine. x may be any slice of the
    tensor the stats were taken over."""
    bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
    y = (x - mean.reshape(bshape)) / (std.reshape(bshape) + eps)
    cshape = (1,) * (x.ndim - 1) + (x.shape[-1],)
    return y * gamma.reshape(cshape).astype(y.dtype) + beta.reshape(cshape).astype(y.dtype)


def sample_layer_norm(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """The reference's custom LayerNorm (models.py:965-985).

    Per-sample mean/std over ALL non-batch axes, unbiased std, and the
    denominator is (std + eps). gamma, beta: (C,) per-channel affine.
    """
    mean, std = sample_layer_norm_stats(x)
    return sample_layer_norm_apply(x, mean, std, gamma, beta, eps)
