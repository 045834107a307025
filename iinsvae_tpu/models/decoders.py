"""AdaIN-conditioned decoders: (range_code, env_code) -> reconstructed CIR.

Functional AdaIN: the reference predicts per-sample (gamma, beta) for every
AdaptiveInstanceNorm layer with an MLP on the env code and *mutates* the
layers before the conv pass (reference models.py:444-471). Here the MLP
output is sliced into per-layer (gamma, beta) pairs and passed down the
residual blocks as arguments — identical math, no module state.

Parameter layout per AdaIN layer matches the reference's assign walk
(models.py:452-464): [beta(C), gamma(C)] chunks in module order — the two
layers of residual block 0 first, then block 1, etc.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from iinsvae_tpu.models.layers import Conv1d, Conv2d, MLP, ResidualBlock1d, ResidualBlock2d, SampleLayerNorm
from iinsvae_tpu.ops.pooling import adaptive_avg_pool1d, adaptive_avg_pool2d
from iinsvae_tpu.ops.conv import upsample_nearest1d, upsample_nearest2d


def slice_adain_params(adain_params: jnp.ndarray, n_blocks: int, features: int):
    """(B, n_blocks*2*2*features) -> [[(g, b), (g, b)], ...] per block."""
    out = []
    off = 0
    for _ in range(n_blocks):
        pairs = []
        for _ in range(2):  # two AdaIN layers per residual block
            beta = adain_params[:, off : off + features]
            gamma = adain_params[:, off + features : off + 2 * features]
            pairs.append((gamma, beta))
            off += 2 * features
        out.append(pairs)
    return out


class Decoder1d(nn.Module):
    """(B, 8, out_dim) + (B, style_dim) -> (B, in_dim) (reference models.py:405-471)."""

    dim: int = 4
    n_residual: int = 3
    n_upsample: int = 4
    in_dim: int = 157
    out_dim: int = 2
    style_dim: int = 8

    @nn.compact
    def __call__(self, range_code, env_code):
        dim = self.dim * 2**self.n_upsample  # 64
        num_adain = self.n_residual * 2 * 2 * dim
        adain_params = MLP(num_adain, name="mlp")(env_code)
        per_block = slice_adain_params(adain_params, self.n_residual, dim)

        x = nn.relu(Conv1d(dim, 1)(range_code))
        for i in range(self.n_residual):
            x = ResidualBlock1d(dim, norm="adain")(x, per_block[i])
        for _ in range(self.n_upsample):
            x = upsample_nearest1d(x, 2)
            x = Conv1d(dim // 2, 5, padding=2)(x)
            x = SampleLayerNorm()(x)
            x = nn.relu(x)
            dim //= 2
        x = jnp.tanh(Conv1d(1, 7, padding=3, pad_mode="reflect")(x))
        x = adaptive_avg_pool1d(x, self.in_dim)  # (B, in_dim, 1)
        return x.reshape(x.shape[0], self.in_dim)


class Decoder2d(nn.Module):
    """2-D analogue (reference models.py:474-539)."""

    dim: int = 4
    n_residual: int = 3
    n_upsample: int = 4
    in_dim: int = 157
    out_dim: int = 2
    style_dim: int = 8

    @nn.compact
    def __call__(self, range_code, env_code):
        dim = self.dim * 2**self.n_upsample
        num_adain = self.n_residual * 2 * 2 * dim
        adain_params = MLP(num_adain, name="mlp")(env_code)
        per_block = slice_adain_params(adain_params, self.n_residual, dim)

        x = nn.relu(Conv2d(dim, 1)(range_code))
        for i in range(self.n_residual):
            x = ResidualBlock2d(dim, norm="adain")(x, per_block[i])
        for _ in range(self.n_upsample):
            x = upsample_nearest2d(x, 2)
            x = Conv2d(dim // 2, 5, padding=2)(x)
            x = SampleLayerNorm()(x)
            x = nn.relu(x)
            dim //= 2
        x = jnp.tanh(Conv2d(1, 7, padding=3, pad_mode="reflect")(x))
        x = adaptive_avg_pool2d(x, self.in_dim)  # (B, in_dim, in_dim, 1)
        return x


class Decoder2dNoExpand(nn.Module):
    """Column-image decoder with (k,1) kernels (reference models.py:542-608,
    flagged "Not available yet" there; functional here — conv_type=3).
    The reference's asymmetric ReflectionPad2d((3,1)) is resolved to the
    intended symmetric 3-pad on the length axis."""

    dim: int = 4
    n_residual: int = 3
    n_upsample: int = 4
    in_dim: int = 157
    out_dim: int = 2
    style_dim: int = 8

    @nn.compact
    def __call__(self, range_code, env_code):  # (B, 8, 1, C)
        from iinsvae_tpu.models.layers import ResidualBlock2dNoExpand

        dim = self.dim * 2**self.n_upsample
        num_adain = self.n_residual * 2 * 2 * dim
        adain_params = MLP(num_adain, name="mlp")(env_code)
        per_block = slice_adain_params(adain_params, self.n_residual, dim)

        x = nn.relu(Conv2d(dim, 1)(range_code))
        for i in range(self.n_residual):
            x = ResidualBlock2dNoExpand(dim, norm="adain")(x, per_block[i])
        for _ in range(self.n_upsample):
            x = jnp.repeat(x, 2, axis=-3)  # Upsample (2,1)
            x = Conv2d(dim // 2, (5, 1), padding=((2, 2), (0, 0)))(x)
            x = SampleLayerNorm()(x)
            x = nn.relu(x)
            dim //= 2
        x = jnp.tanh(Conv2d(1, (7, 1), padding=((3, 3), (0, 0)), pad_mode="reflect")(x))
        x = adaptive_avg_pool2d(x, (self.in_dim, 1))
        return x  # (B, in_dim, 1, 1)


class Decoder(nn.Module):
    """Facade (reference models.py:67-91): squeeze back to (B, in_dim)."""

    conv_type: int = 1
    dim: int = 4
    n_residual: int = 3
    n_upsample: int = 4
    in_dim: int = 157
    out_dim: int = 2
    style_dim: int = 8
    expand: bool = False

    @nn.compact
    def __call__(self, range_code, env_code):
        if self.conv_type == 1:
            return Decoder1d(
                self.dim, self.n_residual, self.n_upsample, self.in_dim,
                self.out_dim, self.style_dim, name="decoder",
            )(range_code, env_code)
        if self.conv_type == 2 and self.expand:
            x = Decoder2d(
                self.dim, self.n_residual, self.n_upsample, self.in_dim,
                self.out_dim, self.style_dim, name="decoder",
            )(range_code, env_code)
            # keep the first column, as the reference does (models.py:90)
            return x[:, :, 0, 0]
        x = Decoder2dNoExpand(
            self.dim, self.n_residual, self.n_upsample, self.in_dim,
            self.out_dim, self.style_dim, name="decoder",
        )(range_code, env_code)
        return x.reshape(x.shape[0], self.in_dim)
