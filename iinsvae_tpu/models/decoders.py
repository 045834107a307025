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

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from iinsvae_tpu.models.layers import Conv2d, MLP, SampleLayerNorm
from iinsvae_tpu.ops.pooling import adaptive_avg_pool1d, adaptive_avg_pool2d
from iinsvae_tpu.ops.conv import upsample_nearest1d, upsample_nearest2d


# 2-D decoder lowerings (selected at construction via the facade's
# ``lowering`` field — no trace-time module globals, VERDICT round-3
# item 2): 'fast' (W-folded res tail, subpixel phase upsample convs,
# column-0-only final stage, the default) or 'dense' (the reference op
# sequence, parity oracle). One parameter set drives both; the facade
# normalizes their differing output shapes to (B, in_dim).


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
    """(B, 8, out_dim) + (B, style_dim) -> (B, in_dim) (reference models.py:405-471).

    Declares its conv kernels / affine params explicitly so the SAME param
    tree drives either lowering:
      * fused (TPU): one Pallas kernel per stage — AdaIN residual stages,
        upsample+conv+SampleLayerNorm+relu stages (upsample folded into the
        dense matrix), and a final tanh+adaptive-pool kernel;
      * composed: the reference op sequence, identical math.
    AdaIN-stage convs carry no bias (normalized away; zero-grad in the
    reference too).
    """

    dim: int = 4
    n_residual: int = 3
    n_upsample: int = 4
    in_dim: int = 157
    out_dim: int = 2
    style_dim: int = 8

    @nn.compact
    def __call__(self, range_code, env_code):
        from iinsvae_tpu.models.layers import (
            conv_normal_init,
            _bias_uniform_init,
        )
        from iinsvae_tpu.ops import dense_conv as dense_ops
        from iinsvae_tpu.ops import norms as norm_ops
        from iinsvae_tpu.ops.conv import conv1d
        from iinsvae_tpu.ops.pallas import fused as pf
        from iinsvae_tpu.ops.pooling import adaptive_avg_pool_matrix

        b = range_code.shape[0]
        l0 = range_code.shape[1]  # 8
        dim = self.dim * 2**self.n_upsample  # 64
        num_adain = self.n_residual * 2 * 2 * dim
        adain_params = MLP(num_adain, name="mlp")(env_code)
        per_block = slice_adain_params(adain_params, self.n_residual, dim)

        # ---- params ----
        in_kernel = self.param("in_kernel", conv_normal_init(), (1, self.out_dim, dim))
        in_bias = self.param("in_bias", _bias_uniform_init(self.out_dim), (dim,))
        blk_kernels = [
            (
                self.param(f"res{i}_kernel1", conv_normal_init(), (3, dim, dim)),
                self.param(f"res{i}_kernel2", conv_normal_init(), (3, dim, dim)),
            )
            for i in range(self.n_residual)
        ]
        up_kernels, up_biases, up_gammas, up_betas, up_dims = [], [], [], [], []
        d = dim
        for j in range(self.n_upsample):
            up_kernels.append(
                self.param(f"up{j}_kernel", conv_normal_init(), (5, d, d // 2))
            )
            # reference nn.Conv1d(dim, dim//2, 5) has bias=True; the custom
            # per-sample LayerNorm does NOT absorb a per-channel bias
            # (unlike IN/AdaIN stages), so it must exist (ADVICE round-2)
            up_biases.append(
                self.param(f"up{j}_bias", _bias_uniform_init(d * 5), (d // 2,))
            )
            up_gammas.append(
                self.param(f"up{j}_gamma", lambda k, s: jax.random.uniform(k, s), (d // 2,))
            )
            up_betas.append(self.param(f"up{j}_beta", nn.initializers.zeros, (d // 2,)))
            up_dims.append((d, d // 2))
            d //= 2
        out_kernel = self.param("out_kernel", conv_normal_init(), (7, d, 1))
        out_bias = self.param("out_bias", _bias_uniform_init(d * 7), (1,))

        use_fused = pf.pallas_enabled() and b <= pf.MAX_FUSED_BATCH

        if use_fused:
            # specialized lowering: in-stage one kernel, each AdaIN residual
            # block one whole-block kernel, the whole upsample tail + final
            # conv+tanh+pool one kernel (fused_sln_chain); identical math to
            # the composed path below.
            x2 = range_code.reshape(b, l0 * self.out_dim)
            m_in = dense_ops.dense_conv_matrix(in_kernel, l0)
            x2 = pf.fused_dense_layer(
                x2, m_in, l_out=l0, c_out=dim, norm="none", act="relu",
                bias=jnp.tile(in_bias, l0),
            )
            for i in range(self.n_residual):
                (g1, b1), (g2, b2) = per_block[i]
                m1 = dense_ops.dense_conv_matrix(
                    blk_kernels[i][0], l0, padding=1, pad_mode="reflect",
                    centered=True,
                )
                m2 = dense_ops.dense_conv_matrix(
                    blk_kernels[i][1], l0, padding=1, pad_mode="reflect",
                    centered=True,
                )
                x2 = pf.fused_adain_res_block(
                    x2, m1, m2,
                    jnp.tile(g1, (1, l0)), jnp.tile(b1, (1, l0)),
                    jnp.tile(g2, (1, l0)), jnp.tile(b2, (1, l0)),
                    l_out=l0, c_out=dim, centered=True,
                )
            l = l0
            ms, biases, gammas, betas = [], [], [], []
            for j in range(self.n_upsample):
                ms.append(dense_ops.dense_upconv_matrix(up_kernels[j], l, padding=2))
                l *= 2
                biases.append(jnp.tile(up_biases[j], l).reshape(1, -1))
                gammas.append(jnp.tile(up_gammas[j], l).reshape(1, -1))
                betas.append(jnp.tile(up_betas[j], l).reshape(1, -1))
            m_out = dense_ops.dense_conv_matrix(
                out_kernel, l, padding=3, pad_mode="reflect"
            )
            pool = adaptive_avg_pool_matrix(l, self.in_dim)
            return pf.fused_sln_chain(
                x2, tuple(ms), tuple(gammas), tuple(betas),
                m_out, jnp.tile(out_bias, l).reshape(1, -1), pool,
                biases=tuple(biases),
            )

        # ---- composed reference path (identical math) ----
        x = range_code
        x = nn.relu(
            dense_ops.conv1d_dense(x, in_kernel, in_bias)
        )
        for i in range(self.n_residual):
            (g1, b1), (g2, b2) = per_block[i]
            y = dense_ops.conv1d_dense(x, blk_kernels[i][0], None, padding=1, pad_mode="reflect")
            y = nn.relu(norm_ops.adain(y, g1, b1))
            y = dense_ops.conv1d_dense(y, blk_kernels[i][1], None, padding=1, pad_mode="reflect")
            x = x + norm_ops.adain(y, g2, b2)
        for j in range(self.n_upsample):
            x = upsample_nearest1d(x, 2)
            x = conv1d(x, up_kernels[j], up_biases[j], padding=2)
            x = norm_ops.sample_layer_norm(x, up_gammas[j], up_betas[j])
            x = nn.relu(x)
        x = jnp.tanh(conv1d(x, out_kernel, out_bias, padding=3, pad_mode="reflect"))
        x = adaptive_avg_pool1d(x, self.in_dim)  # (B, in_dim, 1)
        return x.reshape(x.shape[0], self.in_dim)


class Decoder2d(nn.Module):
    """2-D analogue (reference models.py:474-539).

    Two lowerings over ONE explicit parameter set (parity-tested,
    tests/test_decoder2d_fast.py):

    * 'fast' (default): the 8x8 AdaIN residual tail runs W-folded through
      the grouped machinery (ops/colgroups.py, identity grouping — one
      MXU-shaped 1-D matmul per conv instead of an 8x8-spatial XLA conv);
      each upsample stage is an exact 4-phase subpixel conv
      (ops/subpixel.py); and the final 7x7 conv + (157,157) pool are
      computed only for output column 0 — the only column the Decoder
      facade keeps (reference models.py:90). Returns (B, in_dim).
    * 'dense': the reference op sequence; returns (B, in_dim, in_dim, 1).
    """

    dim: int = 4
    n_residual: int = 3
    n_upsample: int = 4
    in_dim: int = 157
    out_dim: int = 2
    style_dim: int = 8
    lowering: str = "fast"  # 'fast' | 'dense'
    # A/B knob for the non-sliced upsample stages: False = conv ->
    # SLN(tiled affine) -> relu -> pixel_shuffle (shipped order); True =
    # conv -> pixel_shuffle -> SLN(per-channel affine) -> relu. Exact
    # either way (the per-sample whole-tensor SLN stats are layout-
    # invariant); measured via benchmarks/profile2d.py --shuffle_first.
    shuffle_first: bool = False

    @nn.compact
    def __call__(self, range_code, env_code):
        if self.lowering not in ("fast", "dense"):
            raise ValueError(
                f"Decoder2d lowering must be 'fast' or 'dense', "
                f"got {self.lowering!r}")
        from iinsvae_tpu.models.layers import conv_normal_init, _bias_uniform_init
        from iinsvae_tpu.ops import colgroups as cg
        from iinsvae_tpu.ops import subpixel as sp
        from iinsvae_tpu.ops import conv as conv_ops
        from iinsvae_tpu.ops.norms import sample_layer_norm
        from iinsvae_tpu.ops.pooling import adaptive_avg_pool_matrix

        dim = self.dim * 2**self.n_upsample
        num_adain = self.n_residual * 2 * 2 * dim
        adain_params = MLP(num_adain, name="mlp")(env_code)
        per_block = slice_adain_params(adain_params, self.n_residual, dim)

        c0 = range_code.shape[-1]
        k_in = self.param("in_kernel", conv_normal_init(), (1, 1, c0, dim))
        b_in = self.param("in_bias", _bias_uniform_init(c0), (dim,))
        res = [
            (
                self.param(f"res{i}_kernel1", conv_normal_init(), (3, 3, dim, dim)),
                self.param(f"res{i}_bias1", _bias_uniform_init(dim * 9), (dim,)),
                self.param(f"res{i}_kernel2", conv_normal_init(), (3, 3, dim, dim)),
                self.param(f"res{i}_bias2", _bias_uniform_init(dim * 9), (dim,)),
            )
            for i in range(self.n_residual)
        ]
        ups, d = [], dim
        for j in range(self.n_upsample):
            ups.append(
                (
                    self.param(f"up{j}_kernel", conv_normal_init(), (5, 5, d, d // 2)),
                    self.param(f"up{j}_bias", _bias_uniform_init(d * 25), (d // 2,)),
                    self.param(f"up{j}_gamma", lambda k, s: jax.random.uniform(k, s), (d // 2,)),
                    self.param(f"up{j}_beta", nn.initializers.zeros, (d // 2,)),
                )
            )
            d //= 2
        k_out = self.param("out_kernel", conv_normal_init(), (7, 7, d, 1))
        b_out = self.param("out_bias", _bias_uniform_init(d * 49), (1,))

        if self.lowering == "fast":
            from iinsvae_tpu.ops.pallas import fused as pf
            from iinsvae_tpu.ops.pallas import res2d

            x = nn.relu(conv_ops.conv2d(range_code, k_in, b_in))
            bh, hh, wh, ch = x.shape
            if pf.pallas_enabled() and res2d.applicable(hh, wh, ch, bh):
                # whole AdaIN residual blocks as one Pallas kernel each way
                # (ops/pallas/res2d.py); the conv biases b1/b2 are
                # mean-cancelled by AdaIN (zero grad) exactly as in the
                # grouped/dense lowerings, so they are not kernel inputs.
                for i, (k1, b1, k2, b2) in enumerate(res):
                    (g1, be1), (g2, be2) = per_block[i]
                    x = res2d.fused_res_block_2d(
                        x, k1, k2, norm="adain",
                        gamma1=g1, beta1=be1, gamma2=g2, beta2=be2,
                    )
            else:
                xg = cg.identity_field(x)
                for i, (k1, b1, k2, b2) in enumerate(res):
                    (g1, be1), (g2, be2) = per_block[i]
                    y = cg.conv2d_grouped(xg, k1, b1, padding=1, pad_mode="reflect")
                    y = cg.relu_grouped(cg.adain_grouped(y, g1, be1))
                    y = cg.conv2d_grouped(y, k2, b2, padding=1, pad_mode="reflect")
                    xg = cg.add_grouped(xg, cg.adain_grouped(y, g2, be2))
                x = xg.expand()
            # Upsample stages on the XLA subpixel phase-conv path. (A fused
            # channels-first conv+SLN Pallas kernel for these stages was
            # built and MEASURED 2.7x slower than XLA's fusion — removed in
            # round 4; BASELINE.md round-3 log, history: commit 4f6faf4^.
            # A standalone Pallas SLN was likewise measured and rejected in
            # round 2: XLA's own SLN already streams at bandwidth.)
            for j, (k_up, b_up, gamma, beta) in enumerate(ups):
                z = sp.upsample_conv5_phase(x, k_up, b_up)
                if j == len(ups) - 1 and x.shape[2] >= 2:
                    # Last stage: its output feeds ONLY the 7-tap
                    # reflect gather below, which reads post-shuffle
                    # columns {0,1,2,3} = pre-shuffle columns {0,1}.
                    # The whole-tensor SLN stats still need the FULL
                    # conv output, but normalize/relu/shuffle run on
                    # the 2-column slice — skipping the full-field
                    # normalized write + re-read of the widest tensor
                    # in the decoder ((B, 64, 64, 16) at the flagship
                    # geometry). Exact: identical ops on the kept
                    # columns, zero grads through the dropped ones
                    # (stats coupling is preserved via the full-z
                    # reduction).
                    from iinsvae_tpu.ops.norms import (
                        sample_layer_norm_apply,
                        sample_layer_norm_stats,
                    )

                    mean, std = sample_layer_norm_stats(z)
                    z = sample_layer_norm_apply(
                        z[:, :, :2, :], mean, std,
                        jnp.tile(gamma, 4), jnp.tile(beta, 4),
                    )
                    x = sp.pixel_shuffle2(nn.relu(z))
                elif self.shuffle_first:
                    x = sp.pixel_shuffle2(z)
                    x = nn.relu(sample_layer_norm(x, gamma, beta))
                else:
                    z = sample_layer_norm(z, jnp.tile(gamma, 4), jnp.tile(beta, 4))
                    x = sp.pixel_shuffle2(nn.relu(z))
            # final 7x7 reflect conv + (in_dim, in_dim) pool, column 0 only:
            # W-pool output column 0 averages exactly input column 0 (window
            # [0, ceil(W/in_dim)) = [0,1) since in_dim > W), and conv column
            # 0 reads reflect-padded columns [3,2,1,0,1,2,3].
            cols = jnp.asarray([3, 2, 1, 0, 1, 2, 3], jnp.int32)
            b_sz, h, w, c = x.shape
            xcols = jnp.take(x, cols, axis=2)  # (B, H, 7, C)
            k1d = k_out.reshape(7, 7 * c, 1)  # (t_h, (t_w, ci), 1)
            y = conv_ops.conv1d(
                xcols.reshape(b_sz, h, 7 * c), k1d, b_out,
                padding=3, pad_mode="reflect",
            )  # (B, H, 1)
            y = jnp.tanh(y)
            pool = adaptive_avg_pool_matrix(h, self.in_dim, dtype=y.dtype)
            return jnp.einsum("bhc,ho->boc", y, pool).reshape(b_sz, self.in_dim)

        x = nn.relu(conv_ops.conv2d(range_code, k_in, b_in))
        for i, (k1, b1, k2, b2) in enumerate(res):
            (g1, be1), (g2, be2) = per_block[i]
            from iinsvae_tpu.ops import norms as norm_ops

            y = conv_ops.conv2d(x, k1, b1, padding=1, pad_mode="reflect")
            y = nn.relu(norm_ops.adain(y, g1, be1))
            y = conv_ops.conv2d(y, k2, b2, padding=1, pad_mode="reflect")
            x = x + norm_ops.adain(y, g2, be2)
        for k_up, b_up, gamma, beta in ups:
            x = upsample_nearest2d(x, 2)
            x = conv_ops.conv2d(x, k_up, b_up, padding=2)
            x = sample_layer_norm(x, gamma, beta)
            x = nn.relu(x)
        x = jnp.tanh(conv_ops.conv2d(x, k_out, b_out, padding=3, pad_mode="reflect"))
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
    # 'fast' (default) | 'dense' (parity oracle); None = 'fast'
    lowering: Optional[str] = None
    shuffle_first: bool = False  # see Decoder2d.shuffle_first

    @nn.compact
    def __call__(self, range_code, env_code):
        if self.lowering not in (None, "fast", "dense"):
            raise ValueError(
                f"Decoder lowering must be 'fast' or 'dense', "
                f"got {self.lowering!r}")
        if self.conv_type == 1:
            return Decoder1d(
                self.dim, self.n_residual, self.n_upsample, self.in_dim,
                self.out_dim, self.style_dim, name="decoder",
            )(range_code, env_code)
        if self.conv_type == 2 and self.expand:
            impl = self.lowering or "fast"
            x = Decoder2d(
                self.dim, self.n_residual, self.n_upsample, self.in_dim,
                self.out_dim, self.style_dim, name="decoder",
                lowering=impl, shuffle_first=self.shuffle_first,
            )(range_code, env_code)
            if impl == "fast":
                return x  # already the first column, (B, in_dim)
            # keep the first column, as the reference does (models.py:90)
            return x[:, :, 0, 0]
        x = Decoder2dNoExpand(
            self.dim, self.n_residual, self.n_upsample, self.in_dim,
            self.out_dim, self.style_dim, name="decoder",
        )(range_code, env_code)
        return x.reshape(x.shape[0], self.in_dim)
