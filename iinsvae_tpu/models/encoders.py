"""Encoders: CIR -> (range_code, env_code stats).

Shapes follow the reference exactly but in channels-last layout:

  RangeEncoder1d (reference models.py:140-176):
    (B, 157, 1) -pool-> (B, 128, 1) -> (B, 128, 4) -> 4x stride-2 ->
    (B, 8, 64) -> 3x residual -> 1x1 conv -> (B, 8, 2)
  EnvEncoder1d (reference models.py:258-298):
    (B, 128, 1) -> (B, 128, 16) -> 2x stride-2 -> (B, 32, 64) ->
    global avg -> 1x1 conv -> (B, 1, style_dim); split into (mu, log_sigma).

The env encoder returns the concatenated stats; sampling is done by the
caller with an explicit PRNG key (utils/prng.py) — the reference samples
inside forward with a global RNG (models.py:288).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from iinsvae_tpu.models.layers import (
    Conv1d,
    Conv2d,
    ConvINAct,
    ResidualBlock1d,
    ResidualBlock2dNoExpand,
    conv_normal_init,
    _bias_uniform_init,
)
from iinsvae_tpu.ops.pooling import adaptive_avg_pool1d, adaptive_avg_pool2d
from iinsvae_tpu.ops.norms import instance_norm
from iinsvae_tpu.ops import colgroups as cg
from iinsvae_tpu.ops import conv as conv_ops


# 2-D lowering defaults (construction-time fields on the facades, not
# module globals — the round-3 trace-time setters were a footgun, VERDICT
# round-3 item 2): Encoder 'grouped' carries only the distinct columns of
# the column-constant expanded image (exact — ops/colgroups.py); 'dense'
# materializes the (B, H, W, C) fields and is the parity oracle.


class RangeEncoder1d(nn.Module):
    """On TPU the stack lowers through the specialized fused kernels
    (conv stages paired via fused_in_pair, one whole-block kernel per
    residual block, fused head — 710k samples/sec on the flagship step);
    off-TPU (or past the fused batch cap) through the composed dense-matmul
    path, identical math (parity: tests/test_pallas.py). A generic
    fused-chain builder and a phase-SLN kernel were measured slower and
    removed in round 4 (BASELINE.md round log; history: commit c90d074).
    Reference models.py:140-176."""

    dim: int = 4
    n_residual: int = 3
    n_downsample: int = 4
    out_dim: int = 2

    @nn.compact
    def __call__(self, x):  # (B, L, 1)
        from iinsvae_tpu.ops import dense_conv as dense_ops
        from iinsvae_tpu.ops.pallas import fused as pf
        from iinsvae_tpu.models.layers import conv_normal_init, _bias_uniform_init
        from iinsvae_tpu.ops import norms as norm_ops

        x = adaptive_avg_pool1d(x, 128)
        b, l_in, _ = x.shape

        # conv stage list: (kernel, stride, padding, pad_mode, l_out, c_out)
        stages = []
        k0 = self.param("in_kernel", conv_normal_init(), (7, 1, self.dim))
        stages.append((k0, 1, 3, "reflect", l_in, self.dim))
        dim, l = self.dim, l_in
        for j in range(self.n_downsample):
            kd = self.param(f"down{j}_kernel", conv_normal_init(), (4, dim, dim * 2))
            l //= 2
            dim *= 2
            stages.append((kd, 2, 1, "zero", l, dim))
        res_kernels = [
            (
                self.param(f"res{i}_kernel1", conv_normal_init(), (3, dim, dim)),
                self.param(f"res{i}_kernel2", conv_normal_init(), (3, dim, dim)),
            )
            for i in range(self.n_residual)
        ]
        out_kernel = self.param("out_kernel", conv_normal_init(), (1, dim, self.out_dim))
        out_bias = self.param("out_bias", _bias_uniform_init(dim), (self.out_dim,))

        use_fused = pf.pallas_enabled() and b <= pf.MAX_FUSED_BATCH
        if use_fused:
            # specialized lowering: conv stages PAIRED two per kernel, each
            # residual block one whole-block kernel, head one kernel —
            # identical math to the composed path below.
            x2 = x.reshape(b, l_in)
            i = 0
            cur_l = l_in
            while i < len(stages):
                if i + 1 < len(stages):
                    (ka, sa, pa, ma, la, ca) = stages[i]
                    (kb, sb, pb, mb, lb, cb) = stages[i + 1]
                    m1 = dense_ops.dense_conv_matrix(
                        ka.astype(x.dtype), cur_l, stride=sa, padding=pa,
                        pad_mode=ma, centered=True)
                    m2 = dense_ops.dense_conv_matrix(
                        kb.astype(x.dtype), la, stride=sb, padding=pb,
                        pad_mode=mb, centered=True)
                    x2 = pf.fused_in_pair(
                        x2, m1, m2, l1=la, c1=ca, l2=lb, c2=cb, centered=True)
                    cur_l = lb
                    i += 2
                else:
                    (ka, sa, pa, ma, la, ca) = stages[i]
                    m1 = dense_ops.dense_conv_matrix(
                        ka.astype(x.dtype), cur_l, stride=sa, padding=pa,
                        pad_mode=ma, centered=True)
                    x2 = pf.fused_dense_layer(
                        x2, m1, l_out=la, c_out=ca, norm="in", act="relu",
                        centered=True)
                    cur_l = la
                    i += 1
            for (k1, k2) in res_kernels:
                m1 = dense_ops.dense_conv_matrix(
                    k1.astype(x.dtype), l, padding=1, pad_mode="reflect",
                    centered=True)
                m2 = dense_ops.dense_conv_matrix(
                    k2.astype(x.dtype), l, padding=1, pad_mode="reflect",
                    centered=True)
                x2 = pf.fused_res_block(x2, m1, m2, l_out=l, c_out=dim,
                                        centered=True)
            m_out = dense_ops.dense_conv_matrix(out_kernel.astype(x.dtype), l)
            x2 = pf.fused_dense_layer(
                x2, m_out, l_out=l, c_out=self.out_dim, norm="none",
                act="relu", bias=jnp.tile(out_bias, l))
            return x2.reshape(b, l, self.out_dim)
        # composed path, identical math
        for (k, s, p, m, _, _) in stages:
            x = dense_ops.conv1d_dense(x, k, None, stride=s, padding=p,
                                       pad_mode=m)
            x = nn.relu(norm_ops.instance_norm(x))
        for (k1, k2) in res_kernels:
            y = dense_ops.conv1d_dense(x, k1, None, padding=1, pad_mode="reflect")
            y = nn.relu(norm_ops.instance_norm(y))
            y = dense_ops.conv1d_dense(y, k2, None, padding=1, pad_mode="reflect")
            x = x + norm_ops.instance_norm(y)
        x = nn.relu(dense_ops.conv1d_dense(x, out_kernel, out_bias))
        return x  # (B, 128 / 2**n_downsample, out_dim)


class RangeEncoder2d(nn.Module):
    """2-D analogue on the square-expanded CIR (reference models.py:179-215).

    Accepts either the dense (B, H, W, 1) image (oracle lowering) or a
    ``colgroups.GroupedField`` carrying only the distinct columns of the
    column-constant expansion — the two lowerings share one explicit
    parameter set and are parity-tested (tests/test_colgroups.py)."""

    dim: int = 4
    n_residual: int = 3
    n_downsample: int = 4
    out_dim: int = 2

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1) | GroupedField
        dims, d = [], self.dim
        for _ in range(self.n_downsample):
            dims.append((d, d * 2))
            d *= 2
        k0 = self.param("in_kernel", conv_normal_init(), (7, 7, 1, self.dim))
        b0 = self.param("in_bias", _bias_uniform_init(49), (self.dim,))
        down = [
            (
                self.param(f"down{j}_kernel", conv_normal_init(), (4, 4, di, do)),
                self.param(f"down{j}_bias", _bias_uniform_init(di * 16), (do,)),
            )
            for j, (di, do) in enumerate(dims)
        ]
        res = [
            (
                self.param(f"res{i}_kernel1", conv_normal_init(), (3, 3, d, d)),
                self.param(f"res{i}_bias1", _bias_uniform_init(d * 9), (d,)),
                self.param(f"res{i}_kernel2", conv_normal_init(), (3, 3, d, d)),
                self.param(f"res{i}_bias2", _bias_uniform_init(d * 9), (d,)),
            )
            for i in range(self.n_residual)
        ]
        ko = self.param("out_kernel", conv_normal_init(), (1, 1, d, self.out_dim))
        bo = self.param("out_bias", _bias_uniform_init(d), (self.out_dim,))

        if isinstance(x, cg.GroupedField):
            x = cg.pool_constant_field(x, 128)
            x = cg.relu_grouped(cg.instance_norm_grouped(
                cg.conv2d_grouped(x, k0, b0, padding=3, pad_mode="reflect")))
            for kd, bd in down:
                x = cg.relu_grouped(cg.instance_norm_grouped(
                    cg.conv2d_grouped(x, kd, bd, stride=2, padding=1)))
            from iinsvae_tpu.ops.pallas import fused as pf
            from iinsvae_tpu.ops.pallas import res2d

            bh, hh, gh, ch = x.data.shape
            wh = x.width
            if pf.pallas_enabled() and res2d.applicable(hh, wh, ch, bh):
                # expand the grouped field once (exact — a static gather)
                # and run each IN residual block as one Pallas kernel each
                # way (ops/pallas/res2d.py); conv biases are mean-cancelled
                # by IN (zero grad), matching the grouped lowering.
                xd = x.expand()  # (B, 8, 8, dim)
                for k1, b1, k2, b2 in res:
                    xd = res2d.fused_res_block_2d(xd, k1, k2, norm="in")
                return nn.relu(conv_ops.conv2d(xd, ko, bo))
            for k1, b1, k2, b2 in res:
                y = cg.conv2d_grouped(x, k1, b1, padding=1, pad_mode="reflect")
                y = cg.relu_grouped(cg.instance_norm_grouped(y))
                y = cg.conv2d_grouped(y, k2, b2, padding=1, pad_mode="reflect")
                x = cg.add_grouped(x, cg.instance_norm_grouped(y))
            x = cg.relu_grouped(cg.conv2d_grouped(x, ko, bo))
            return x.expand()  # (B, 8, 8, out_dim)

        x = adaptive_avg_pool2d(x, 128)
        x = nn.relu(instance_norm(
            conv_ops.conv2d(x, k0, b0, padding=3, pad_mode="reflect")))
        for kd, bd in down:
            x = nn.relu(instance_norm(
                conv_ops.conv2d(x, kd, bd, stride=2, padding=1)))
        for k1, b1, k2, b2 in res:
            y = conv_ops.conv2d(x, k1, b1, padding=1, pad_mode="reflect")
            y = nn.relu(instance_norm(y))
            y = conv_ops.conv2d(y, k2, b2, padding=1, pad_mode="reflect")
            x = x + instance_norm(y)
        x = nn.relu(conv_ops.conv2d(x, ko, bo))
        return x  # (B, 8, 8, out_dim)


class RangeEncoder2dNoExpand(nn.Module):
    """Column-image variant: (B, L, 1, 1) with (4,1)-strided convs
    (reference models.py:218-255, flagged "Not available yet" there; made
    functional here — conv_type=3)."""

    dim: int = 4
    n_residual: int = 3
    n_downsample: int = 4
    out_dim: int = 2

    @nn.compact
    def __call__(self, x):  # (B, L, 1, 1)
        x = adaptive_avg_pool2d(x, (128, 1))
        x = nn.relu(Conv2d(self.dim, 1)(x))  # 1x1 conv, no norm (ref :228-233)
        dim = self.dim
        for _ in range(self.n_downsample):
            x = nn.relu(instance_norm(Conv2d(dim * 2, (4, 1), stride=(2, 1), padding=((1, 1), (0, 0)))(x)))
            dim *= 2
        for _ in range(self.n_residual):
            x = ResidualBlock2dNoExpand(dim, norm="in")(x)
        x = nn.relu(Conv2d(self.out_dim, 1)(x))
        return x  # (B, 8, 1, out_dim)


class EnvEncoder2dNoExpand(nn.Module):
    """(B, L, 1, 1) column-image env encoder (reference models.py:352-394).

    Defect resolution (recorded in PARITY.md): the reference — a class
    literally marked "Not available yet" — opens with
    ``ReflectionPad2d(3)`` + 7x7 conv (models.py:363), which CRASHES on a
    width-1 field (cannot reflect-pad width 1 by 3). Intent reconstruction
    here: a (7,1) zero-padded conv — the column analogue of the other
    NoExpand stages' (k,1) kernels; zero rather than reflect padding
    because no width-1-compatible reflect interpretation exists."""

    dim: int = 16
    n_downsample: int = 2
    style_dim: int = 8
    conv_init: str = "reference"  # see EnvEncoder1d

    @nn.compact
    def __call__(self, x):  # (B, L, 1, 1)
        from iinsvae_tpu.models.layers import pick_conv_init

        kinit = pick_conv_init(self.conv_init)
        x = adaptive_avg_pool2d(x, (128, 1))
        x = nn.relu(Conv2d(self.dim, (7, 1), padding=((3, 3), (0, 0)),
                           pad_mode="zero", kernel_init=kinit)(x))
        dim = self.dim
        for _ in range(2):
            x = nn.relu(Conv2d(dim * 2, (4, 1), stride=(2, 1),
                               padding=((1, 1), (0, 0)), kernel_init=kinit)(x))
            dim *= 2
        for _ in range(self.n_downsample - 2):
            x = nn.relu(Conv2d(dim, (4, 1), stride=(2, 1),
                               padding=((1, 1), (0, 0)), kernel_init=kinit)(x))
        x = jnp.mean(x, axis=(-3, -2), keepdims=True)
        cat = Conv2d(self.style_dim, 1, kernel_init=kinit)(x)
        return cat.reshape(cat.shape[0], self.style_dim)


class EnvEncoder1d(nn.Module):
    dim: int = 16
    n_downsample: int = 2  # extra constant-depth downsamples = n_downsample - 2
    style_dim: int = 8
    # 'reference' = weights_init_normal N(0, 0.02) (models.py:8-14);
    # 'torch' = torch's Conv default U(+-1/sqrt(fan_in)) — opt-in, measured
    # +8 points env accuracy at equal range RMSE (BASELINE.md round-3)
    conv_init: str = "reference"

    @nn.compact
    def __call__(self, x):  # (B, L, 1)
        from iinsvae_tpu.models.layers import pick_conv_init

        kinit = pick_conv_init(self.conv_init)
        x = adaptive_avg_pool1d(x, 128)
        x = ConvINAct(self.dim, 7, padding=3, pad_mode="reflect",
                      norm="none", act="relu", kernel_init=kinit)(x)
        dim = self.dim
        for _ in range(2):
            x = ConvINAct(dim * 2, 4, stride=2, padding=1, norm="none",
                          act="relu", kernel_init=kinit)(x)
            dim *= 2
        for _ in range(self.n_downsample - 2):
            x = ConvINAct(dim, 4, stride=2, padding=1, norm="none",
                          act="relu", kernel_init=kinit)(x)
        x = jnp.mean(x, axis=-2, keepdims=True)  # AdaptiveAvgPool1d(1)
        cat = Conv1d(self.style_dim, 1, kernel_init=kinit)(x)  # (B, 1, style_dim)
        return cat.reshape(cat.shape[0], self.style_dim)  # (B, style_dim)


class EnvEncoder2d(nn.Module):
    """Dense-or-grouped lowering; see RangeEncoder2d. This is the FLOP
    monster of the expanded path (its 7x7x16 conv at 128^2 and the two wide
    stride-2 stages are ~80 GFLOP/step at batch 500 when dense); grouped, it
    computes 1-3 distinct columns instead of 128/64/32."""

    dim: int = 16
    n_downsample: int = 2
    style_dim: int = 8
    conv_init: str = "reference"  # see EnvEncoder1d

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1) | GroupedField
        from iinsvae_tpu.models.layers import pick_conv_init

        kinit = pick_conv_init(self.conv_init)
        dims, d = [], self.dim
        for _ in range(2):
            dims.append((d, d * 2, 2))
            d *= 2
        for _ in range(self.n_downsample - 2):
            dims.append((d, d, 2))
        k0 = self.param("in_kernel", kinit, (7, 7, 1, self.dim))
        b0 = self.param("in_bias", _bias_uniform_init(49), (self.dim,))
        down = [
            (
                self.param(f"down{j}_kernel", kinit, (4, 4, di, do)),
                self.param(f"down{j}_bias", _bias_uniform_init(di * 16), (do,)),
            )
            for j, (di, do, _) in enumerate(dims)
        ]
        ko = self.param("out_kernel", kinit, (1, 1, d, self.style_dim))
        bo = self.param("out_bias", _bias_uniform_init(d), (self.style_dim,))

        if isinstance(x, cg.GroupedField):
            x = cg.pool_constant_field(x, 128)
            x = cg.relu_grouped(
                cg.conv2d_grouped(x, k0, b0, padding=3, pad_mode="reflect"))
            for kd, bd in down:
                x = cg.relu_grouped(
                    cg.conv2d_grouped(x, kd, bd, stride=2, padding=1))
            pooled = cg.global_mean_grouped(x)  # (B, C)
            cat = jnp.dot(pooled, ko[0, 0].astype(pooled.dtype))
            return cat + bo.astype(cat.dtype)

        x = adaptive_avg_pool2d(x, 128)
        x = nn.relu(conv_ops.conv2d(x, k0, b0, padding=3, pad_mode="reflect"))
        for kd, bd in down:
            x = nn.relu(conv_ops.conv2d(x, kd, bd, stride=2, padding=1))
        x = jnp.mean(x, axis=(-3, -2), keepdims=True)  # AdaptiveAvgPool2d(1)
        cat = conv_ops.conv2d(x, ko, bo)  # (B, 1, 1, style_dim)
        return cat.reshape(cat.shape[0], self.style_dim)


def split_env_stats(cat: jnp.ndarray):
    """cat (B, style_dim) -> (mu, log_sigma), each (B, style_dim // 2)."""
    half = cat.shape[-1] // 2
    return cat[..., :half], cat[..., half:]


def env_kl(mu: jnp.ndarray, log_sigma: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0, I)) = 0.5 * sum(e^{2ls} + mu^2 - 1 - 2ls), batch mean
    (reference models.py:294-298)."""
    kl = 0.5 * jnp.sum(jnp.exp(2.0 * log_sigma) + mu**2 - 1.0 - 2.0 * log_sigma, axis=-1)
    return jnp.mean(kl)


def reparameterize(key: jax.Array, mu: jnp.ndarray, log_sigma: jnp.ndarray) -> jnp.ndarray:
    """z = eps * exp(log_sigma) + mu (reference models.py:288-289)."""
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return eps * jnp.exp(log_sigma) + mu


class Encoder(nn.Module):
    """Facade matching reference models.py:32-64.

    __call__(cir, sample_key) -> (range_code, env_code, env_code_rv, kl_div)
      * cir: (B, L) raw waveform
      * range_code: (B, 8, out_dim) [1d] or (B, 8, 8, out_dim) [2d]
      * env_code: (B, style_dim) concatenated (mu, log_sigma) stats
      * env_code_rv: (B, style_dim // 2) reparameterized sample (None if no key)
      * kl_div: scalar
    """

    conv_type: int = 1
    dim: int = 4
    n_residual: int = 3
    n_downsample: int = 4
    style_dim: int = 8
    out_dim: int = 2
    expand: bool = False
    # 'grouped' (default, column-compressed exact lowering) | 'dense'
    # (materialized-field parity oracle); None = 'grouped'
    lowering: Optional[str] = None
    # env-branch conv init: 'reference' (weights_init_normal N(0,0.02)) or
    # the opt-in 'torch' default — measured +8 points env-ID accuracy at
    # equal range RMSE (benchmarks/init_ablation.py, BASELINE.md round 3)
    env_conv_init: str = "reference"

    @nn.compact
    def __call__(self, x, sample_key: Optional[jax.Array] = None):
        if self.lowering not in (None, "grouped", "dense"):
            raise ValueError(
                f"Encoder lowering must be 'grouped' or 'dense', "
                f"got {self.lowering!r}")
        b, l = x.shape[0], x.shape[-1]
        if self.conv_type == 1:
            xin = x.reshape(b, l, 1)
            range_code = RangeEncoder1d(
                self.dim, self.n_residual, self.n_downsample, self.out_dim,
                name="range_encoder",
            )(xin)
            cat = EnvEncoder1d(
                self.dim * 4, self.n_downsample - 2, self.style_dim,
                conv_init=self.env_conv_init, name="env_encoder",
            )(xin)
        elif self.conv_type == 2 and self.expand:
            # (B, L) -> (B, L, L, 1): row i of the image is x broadcast
            # along columns (reference models.py:55). Under the 'grouped'
            # lowering the square image is never materialized: the expansion
            # is column-constant, so the encoders carry only its distinct
            # columns (ops/colgroups.py) — exact, parity-tested.
            if (self.lowering or "grouped") == "grouped":
                xin = cg.constant_field(x.reshape(b, l, 1), l)
            else:
                xin = jnp.broadcast_to(x[:, :, None], (b, l, l))[..., None]
            range_code = RangeEncoder2d(
                self.dim, self.n_residual, self.n_downsample, self.out_dim,
                name="range_encoder",
            )(xin)
            cat = EnvEncoder2d(
                self.dim * 4, self.n_downsample - 2, self.style_dim,
                conv_init=self.env_conv_init, name="env_encoder",
            )(xin)
        else:
            # conv_type=3 (or conv_type=2 without expand): column image
            # (B, L, 1, 1) with (k,1) kernels (reference models.py:218-255)
            xin = x.reshape(b, l, 1, 1)
            range_code = RangeEncoder2dNoExpand(
                self.dim, self.n_residual, self.n_downsample, self.out_dim,
                name="range_encoder",
            )(xin)
            cat = EnvEncoder2dNoExpand(
                self.dim * 4, self.n_downsample - 2, self.style_dim,
                conv_init=self.env_conv_init, name="env_encoder",
            )(xin)

        mu, log_sigma = split_env_stats(cat)
        kl = env_kl(mu, log_sigma)
        rv = reparameterize(sample_key, mu, log_sigma) if sample_key is not None else None
        return range_code, cat, rv, kl

    def sample(self, key: jax.Array, n: int) -> jnp.ndarray:
        """Draw n latents from the N(0, I) prior, shape (n, style_dim)
        (reference models.py:63-64 — torch.randn(n, latent_dim) with the
        global RNG; here an explicit key)."""
        return jax.random.normal(key, (n, self.style_dim))
