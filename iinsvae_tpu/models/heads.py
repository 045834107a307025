"""Restorer (range_code -> ranging-error estimate) and Classifier
(env_code -> environment logits) heads (reference models.py:615-943).

The 'soft' Restorer heads output (mu, logvar) and reparameterize with an
explicit PRNG key instead of the reference's numpy global RNG
(models.py:635-640).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from iinsvae_tpu.models.layers import Conv1d, Conv2d, Dense, BatchNormEps


def _soft_sample(key, mu, logvar):
    std = jnp.exp(logvar / 2.0)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return eps * std + mu


def _mlp_chain(mod, x, widths, slopes):
    """Dense+LeakyReLU chain with torch-default init; ONE fused Pallas
    kernel each way on TPU (fused_mlp_chain), composed Dense ops otherwise.
    slopes[j] is the LeakyReLU negative slope after layer j (1.0 = linear).
    """
    from iinsvae_tpu.models.layers import _bias_uniform_init
    from iinsvae_tpu.ops.pallas import fused as pf

    ws, bs, d = [], [], x.shape[-1]
    for j, w in enumerate(widths):
        ws.append(mod.param(f"w{j}", _bias_uniform_init(d), (d, w)))
        bs.append(mod.param(f"b{j}", _bias_uniform_init(d), (w,)))
        d = w
    if pf.pallas_enabled() and x.shape[0] <= pf.MAX_FUSED_BATCH:
        return pf.fused_mlp_chain(
            x, [w.astype(x.dtype) for w in ws], [b.astype(x.dtype) for b in bs],
            slopes,
        )
    for w, b, s in zip(ws, bs, slopes):
        x = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype) + b.astype(x.dtype)
        if s != 1.0:
            x = nn.leaky_relu(x, s)
    return x


class RestorerLinear(nn.Module):
    """flatten -> 512 -> 256 -> 256 (LeakyReLU 0.2) -> 1 or (mu, logvar)
    (reference models.py:615-658). On TPU the whole chain is ONE Pallas
    kernel each way (fused_mlp_chain) — the heads were 8 sub-microsecond
    matmul launches per step."""

    soft: bool = False

    @nn.compact
    def __call__(self, range_code, *, train: bool = False, sample_key: Optional[jax.Array] = None):
        x = range_code.reshape(range_code.shape[0], -1)
        out = _mlp_chain(
            self, x, (512, 256, 256, 2 if self.soft else 1),
            (0.2, 0.2, 0.2, 1.0),
        )
        if self.soft:
            mu, logvar = out[:, 0:1], out[:, 1:2]
            if sample_key is None:
                return mu
            return _soft_sample(sample_key, mu, logvar)
        return out


class RestorerConv1d(nn.Module):
    """Strided conv stack (8,2)->(4,16)->(2,32) + Dropout/BatchNorm(eps=0.8),
    then a linear head (reference models.py:661-716)."""

    soft: bool = False
    conv_type: int = 1
    expand: bool = False

    @nn.compact
    def __call__(self, range_code, *, train: bool = False, sample_key: Optional[jax.Array] = None):
        x = range_code
        if self.conv_type != 1:
            # (B, 8, 8, C) or (B, 8, 1, C) -> take the first column (reference models.py:704)
            x = x[:, :, 0, :]
        x = nn.leaky_relu(Conv1d(16, 4, stride=2, padding=1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.leaky_relu(Conv1d(32, 4, stride=2, padding=1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = BatchNormEps()(x, use_running_average=not train)
        x = x.reshape(x.shape[0], -1)  # (B, 64)
        if self.soft:
            out = Dense(2)(x)
            mu, logvar = out[:, 0:1], out[:, 1:2]
            if sample_key is None:
                return mu
            return _soft_sample(sample_key, mu, logvar)
        return Dense(1)(x)


class RestorerConv2d(nn.Module):
    """2-D conv stack on the (expanded-to-square) code (reference models.py:719-776)."""

    soft: bool = False
    conv_type: int = 1
    expand: bool = False

    @nn.compact
    def __call__(self, range_code, *, train: bool = False, sample_key: Optional[jax.Array] = None):
        x = range_code
        if self.conv_type == 1:
            # (B, 8, C) -> (B, 8, 8, C) by broadcasting a new W axis
            x = jnp.broadcast_to(x[:, :, None, :], (x.shape[0], x.shape[1], x.shape[1], x.shape[2]))
        elif not self.expand:
            x = jnp.broadcast_to(x, (x.shape[0], x.shape[1], x.shape[1], x.shape[3])) if x.shape[2] == 1 else x
        x = nn.leaky_relu(Conv2d(16, 4, stride=2, padding=1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.leaky_relu(Conv2d(32, 4, stride=2, padding=1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = BatchNormEps()(x, use_running_average=not train)
        x = x.reshape(x.shape[0], -1)  # (B, 128)
        if self.soft:
            out = Dense(2)(x)
            mu, logvar = out[:, 0:1], out[:, 1:2]
            if sample_key is None:
                return mu
            return _soft_sample(sample_key, mu, logvar)
        return Dense(1)(x)


class RestorerConv2dNoExpand(nn.Module):
    """Column-image restorer: pool the code to (32,1), four (4,1)-strided
    conv blocks down to (2,1)x128, linear head (reference models.py:779-830;
    its ctor is broken there — ``code_shape.size(0)`` on a tuple — the
    intended structure is implemented)."""

    soft: bool = False

    @nn.compact
    def __call__(self, range_code, *, train: bool = False, sample_key: Optional[jax.Array] = None):
        from iinsvae_tpu.ops.pooling import adaptive_avg_pool2d

        x = range_code  # (B, L, 1, C)
        if x.ndim == 3:
            x = x[:, :, None, :]
        x = adaptive_avg_pool2d(x, (32, 1))
        pad = ((1, 1), (0, 0))
        filters = 16
        for i in range(4):  # (32,1) -> (16,1) -> (8,1) -> (4,1) -> (2,1)
            x = nn.leaky_relu(
                Conv2d(filters, (4, 1), stride=(2, 1), padding=pad)(x), 0.2
            )
            x = nn.Dropout(0.25, deterministic=not train)(x)
            if i > 0:
                x = BatchNormEps()(x, use_running_average=not train)
            filters *= 2
        x = x.reshape(x.shape[0], -1)  # (B, 256)
        if self.soft:
            out = Dense(2)(x)
            mu, logvar = out[:, 0:1], out[:, 1:2]
            if sample_key is None:
                return mu
            return _soft_sample(sample_key, mu, logvar)
        return Dense(1)(x)


class ClassifierLinear(nn.Module):
    """env_dim -> filters -> 2*filters -> filters -> num_classes
    (reference models.py:838-862; default LeakyReLU slope 0.01 between
    layers, 0.2 on the output as in the reference)."""

    num_classes: int
    filters: int = 16

    @nn.compact
    def __call__(self, env_code, *, train: bool = False):
        x = env_code.reshape(env_code.shape[0], -1)
        return _mlp_chain(
            self, x,
            (self.filters, self.filters * 2, self.filters, self.num_classes),
            (0.01, 0.01, 0.01, 0.2),
        )


class ClassifierConv1d(nn.Module):
    """1x1 conv blocks + BatchNorm(eps=0.8)/Dropout, linear head
    (reference models.py:865-902)."""

    num_classes: int
    filters: int = 16

    @nn.compact
    def __call__(self, env_code, *, train: bool = False):
        x = env_code.reshape(env_code.shape[0], 1, -1)  # (B, L=1, C=env_dim)
        x = nn.leaky_relu(Conv1d(self.filters, 1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.leaky_relu(Conv1d(self.filters, 1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = BatchNormEps()(x, use_running_average=not train)
        x = x.reshape(x.shape[0], -1)
        return nn.leaky_relu(Dense(self.num_classes)(x), 0.2)


class ClassifierConv2d(nn.Module):
    """2-D analogue (reference models.py:905-943)."""

    num_classes: int
    filters: int = 16

    @nn.compact
    def __call__(self, env_code, *, train: bool = False):
        x = env_code.reshape(env_code.shape[0], 1, 1, -1)
        x = nn.leaky_relu(Conv2d(self.filters, 1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.leaky_relu(Conv2d(self.filters, 1)(x), 0.2)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = BatchNormEps()(x, use_running_average=not train)
        x = x.reshape(x.shape[0], -1)
        return nn.leaky_relu(Dense(self.num_classes)(x), 0.2)


class Restorer(nn.Module):
    """Facade (reference models.py:94-112)."""

    soft: bool = False
    conv_type: int = 1
    expand: bool = False
    net_type: str = "Linear"  # Linear | Conv1d | Conv2d

    @nn.compact
    def __call__(self, range_code, *, train: bool = False, sample_key=None):
        if self.net_type == "Linear":
            head = RestorerLinear(self.soft, name="restorer")
        elif self.net_type == "Conv1d":
            head = RestorerConv1d(self.soft, self.conv_type, self.expand, name="restorer")
        elif self.net_type == "Conv2d":
            head = RestorerConv2d(self.soft, self.conv_type, self.expand, name="restorer")
        elif self.net_type == "Conv2dNoExpand":
            head = RestorerConv2dNoExpand(self.soft, name="restorer")
        else:
            raise ValueError(f"Unknown network type for Restorer: {self.net_type}")
        return head(range_code, train=train, sample_key=sample_key)


class Classifier(nn.Module):
    """Facade (reference models.py:115-132)."""

    num_classes: int
    filters: int = 16
    net_type: str = "Linear"

    @nn.compact
    def __call__(self, env_code, *, train: bool = False):
        if self.net_type == "Linear":
            head = ClassifierLinear(self.num_classes, self.filters, name="classifier")
        elif self.net_type == "Conv1d":
            head = ClassifierConv1d(self.num_classes, self.filters, name="classifier")
        elif self.net_type == "Conv2d":
            head = ClassifierConv2d(self.num_classes, self.filters, name="classifier")
        else:
            raise ValueError(f"Unknown network type for Classifier: {self.net_type}")
        return head(env_code, train=train)
