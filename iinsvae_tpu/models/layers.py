"""Core flax.linen layers shared by the model zoo.

Initialisation mirrors the reference's ``weights_init_normal``
(reference models.py:8-14): conv kernels ~ N(0, 0.02), batch-norm scale
~ N(1, 0.02) with zero bias; everything the reference leaves untouched keeps
torch's default U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights and biases.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from iinsvae_tpu.ops import conv as conv_ops
from iinsvae_tpu.ops import dense_conv as dense_ops
from iinsvae_tpu.ops import norms as norm_ops

def conv_normal_init(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def _bias_uniform_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def conv_torch_init():
    """torch's Conv default kernel init U(+-1/sqrt(fan_in)), fan_in = all
    axes but the trailing out-channel one. The reference overrides this with
    weights_init_normal N(0, 0.02) (models.py:8-14) — measured on the env
    branch that override costs ~8 points of env-ID accuracy at equal range
    RMSE (benchmarks/init_ablation.py; BASELINE.md round-3 'init
    attribution'), so the env encoders expose it as the opt-in
    conv_init='torch'."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for s in shape[:-1]:
            fan_in *= int(s)
        bound = 1.0 / float(fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def pick_conv_init(name: str):
    """'reference' -> N(0, 0.02) (weights_init_normal); 'torch' -> torch's
    Conv default U(+-1/sqrt(fan_in))."""
    assert name in ("reference", "torch"), name
    return conv_normal_init() if name == "reference" else conv_torch_init()


class Conv1d(nn.Module):
    """Channels-last Conv1d lowered to an im2col matmul (ops/conv.py)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    pad_mode: str = "zero"
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    # Conv1d lowering, a construction-time field (no trace-time globals —
    # a setter called after tracing would silently keep the old lowering):
    # 'dense' (one MXU matmul per layer, ops/dense_conv.py) or 'im2col'
    # (reference lowering, ops/conv.py). Exact same math — parity-tested;
    # 'dense' is ~2x faster end-to-end on v5e at these sizes.
    impl: str = "dense"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kinit = self.kernel_init or conv_normal_init()
        kernel = self.param(
            "kernel", kinit, (self.kernel_size, c_in, self.features)
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", _bias_uniform_init(c_in * self.kernel_size), (self.features,)
            )
        if self.impl == "dense":
            return dense_ops.conv1d_dense(
                x, kernel, bias, stride=self.stride, padding=self.padding,
                pad_mode=self.pad_mode,
            )
        return conv_ops.conv1d(
            x, kernel, bias, stride=self.stride, padding=self.padding,
            pad_mode=self.pad_mode,
        )


class Conv2d(nn.Module):
    """NHWC Conv2d via XLA's TPU conv lowering."""

    features: int
    kernel_size: tuple | int
    stride: tuple | int = 1
    padding: tuple | int = 0
    pad_mode: str = "zero"
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        kinit = self.kernel_init or conv_normal_init()
        kernel = self.param("kernel", kinit, ks + (c_in, self.features))
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", _bias_uniform_init(c_in * ks[0] * ks[1]), (self.features,)
            )
        return conv_ops.conv2d(
            x, kernel, bias, stride=self.stride, padding=self.padding,
            pad_mode=self.pad_mode,
        )


class ConvINAct(nn.Module):
    """Fused Conv1d + {InstanceNorm|nothing} + {relu|tanh|none} [+ skip add].

    On TPU (batch <= MAX_FUSED_BATCH) this is ONE Pallas kernel forward and
    one backward (ops/pallas/fused.py); otherwise it composes the same math
    from the dense-conv matmul and norm ops. No bias is created under
    InstanceNorm — a pre-IN bias is normalized away and gets zero gradient
    (exactly the reference's effective behavior, models.py:151-152).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    pad_mode: str = "zero"
    norm: str = "in"  # 'in' | 'none'
    act: str = "relu"  # 'relu' | 'tanh' | 'none'
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, residual: Optional[jnp.ndarray] = None):
        b, l_in, c_in = x.shape
        kinit = self.kernel_init or conv_normal_init()
        kernel = self.param("kernel", kinit, (self.kernel_size, c_in, self.features))
        bias = None
        if self.norm == "none":
            bias = self.param(
                "bias", _bias_uniform_init(c_in * self.kernel_size), (self.features,)
            )
        l_out = (l_in + 2 * self.padding - self.kernel_size) // self.stride + 1

        from iinsvae_tpu.ops.pallas.fused import (
            fused_dense_layer,
            pallas_enabled,
            MAX_FUSED_BATCH,
        )

        if self.norm == "none" and self.act == "relu" and residual is None:
            # the env encoder's stride-2 stages: row-tile Pallas conv
            # (ops/pallas/strided_conv.py) — one kernel each way, no dense
            # matrix, no im2col HBM round trip. Strictly cheaper than the
            # dense lowering whenever it applies, so it goes first.
            from iinsvae_tpu.ops.pallas import strided_conv

            if pallas_enabled() and strided_conv.applicable(
                l_in, c_in, self.features, self.kernel_size,
                self.stride, self.padding, self.pad_mode,
            ):
                return strided_conv.fused_strided_conv(
                    x, kernel.astype(x.dtype), bias, l_in=l_in, c_in=c_in
                )

        # dense lowering only while the (K, N) layer matrix stays small
        # (4 MB); beyond that (e.g. the env encoder's 2048x2048 stages) the
        # im2col path wins and the fused kernel would blow VMEM.
        k_n = (l_in * c_in) * (l_out * self.features)
        dense_ok = k_n <= 1_048_576

        if pallas_enabled() and b <= MAX_FUSED_BATCH and dense_ok:
            m = dense_ops.dense_conv_matrix(
                kernel.astype(x.dtype), l_in, stride=self.stride,
                padding=self.padding, pad_mode=self.pad_mode,
                centered=self.norm == "in",
            )
            full_bias = None
            if bias is not None:
                full_bias = jnp.tile(bias.astype(x.dtype), l_out)
            out = fused_dense_layer(
                x.reshape(b, l_in * c_in),
                m,
                l_out=l_out,
                c_out=self.features,
                norm=self.norm,
                act=self.act,
                residual=None if residual is None else residual.reshape(b, -1),
                bias=full_bias,
                centered=self.norm == "in",
            )
            return out.reshape(b, l_out, self.features)

        # unfused reference path — identical math
        conv_fn = dense_ops.conv1d_dense if dense_ok else conv_ops.conv1d
        y = conv_fn(
            x, kernel, bias, stride=self.stride, padding=self.padding,
            pad_mode=self.pad_mode,
        )
        if self.norm == "in":
            y = norm_ops.instance_norm(y)
        if self.act == "relu":
            y = nn.relu(y)
        elif self.act == "tanh":
            y = jnp.tanh(y)
        if residual is not None:
            y = y + residual
        return y


class Dense(nn.Module):
    """Linear layer with torch-default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", _bias_uniform_init(fan_in), (fan_in, self.features))
        y = jnp.einsum(
            "...i,io->...o", x, kernel.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", _bias_uniform_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class MLP(nn.Module):
    """The AdaIN-parameter predictor MLP (reference models.py:951-962).

    input -> dim -> ... -> output with ReLU between, n_blk linear layers.
    """

    output_dim: int
    dim: int = 256
    n_blk: int = 3

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for _ in range(self.n_blk - 1):
            x = nn.relu(Dense(self.dim)(x))
        return Dense(self.output_dim)(x)


class SampleLayerNorm(nn.Module):
    """The reference's custom LayerNorm (models.py:965-985): per-sample
    whole-tensor normalization with per-channel affine. gamma ~ U(0,1),
    beta = 0 as in the reference ctor."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", lambda k, s: jax.random.uniform(k, s), (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        return norm_ops.sample_layer_norm(x, gamma, beta)


class BatchNormEps(nn.Module):
    """BatchNorm matching the reference's ``nn.BatchNorm1d(c, 0.8)`` — the
    0.8 lands on torch's *eps* argument (reference models.py:675), so these
    heads genuinely train with eps=0.8. Running stats tracked for eval.
    Scale ~ N(1, 0.02), bias = 0 per weights_init_normal."""

    eps: float = 0.8
    momentum: float = 0.1
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        c = x.shape[-1]
        scale = self.param("scale", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        shape = (1,) * (x.ndim - 1) + (c,)
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean.reshape(shape)) * inv.reshape(shape) * scale.reshape(shape) + bias.reshape(shape)


class ResidualBlock1d(nn.Module):
    """ReflectionPad+Conv(k3)+norm+ReLU+ReflectionPad+Conv(k3)+norm, skip add
    (reference models.py:988-1005). For norm='adain' the per-sample (gamma,
    beta) pairs are passed in — two pairs per block."""

    features: int
    norm: str = "in"  # 'in' | 'adain'

    @nn.compact
    def __call__(self, x, adain_params: Optional[Sequence] = None):
        if self.norm == "in":
            b, l, c = x.shape
            k1 = self.param("kernel1", conv_normal_init(), (3, c, self.features))
            k2 = self.param("kernel2", conv_normal_init(), (3, self.features, self.features))
            from iinsvae_tpu.ops.pallas.fused import (
                fused_res_block,
                pallas_enabled,
                MAX_FUSED_BATCH,
            )

            if pallas_enabled() and b <= MAX_FUSED_BATCH and l * c <= 1024:
                m1 = dense_ops.dense_conv_matrix(
                    k1.astype(x.dtype), l, padding=1, pad_mode="reflect",
                    centered=True)
                m2 = dense_ops.dense_conv_matrix(
                    k2.astype(x.dtype), l, padding=1, pad_mode="reflect",
                    centered=True)
                # the WHOLE block — conv+IN+relu+conv+IN+skip — in one kernel
                out = fused_res_block(x.reshape(b, l * c), m1, m2,
                                      l_out=l, c_out=self.features,
                                      centered=True)
                return out.reshape(b, l, self.features)
            # composed path, identical math
            y = dense_ops.conv1d_dense(x, k1, None, padding=1, pad_mode="reflect")
            y = nn.relu(norm_ops.instance_norm(y))
            y = dense_ops.conv1d_dense(y, k2, None, padding=1, pad_mode="reflect")
            return x + norm_ops.instance_norm(y)
        y = Conv1d(self.features, 3, padding=1, pad_mode="reflect")(x)
        g1, b1 = adain_params[0]
        y = norm_ops.adain(y, g1, b1)
        y = nn.relu(y)
        y = Conv1d(self.features, 3, padding=1, pad_mode="reflect")(y)
        g2, b2 = adain_params[1]
        y = norm_ops.adain(y, g2, b2)
        return x + y


class ResidualBlock2dNoExpand(nn.Module):
    """Column-image residual block with (3,1) kernels
    (reference models.py:1028-1045)."""

    features: int
    norm: str = "in"

    @nn.compact
    def __call__(self, x, adain_params: Optional[Sequence] = None):
        pad = ((1, 1), (0, 0))
        y = Conv2d(self.features, (3, 1), padding=pad, pad_mode="reflect")(x)
        if self.norm == "adain":
            g1, b1 = adain_params[0]
            y = norm_ops.adain(y, g1, b1)
        else:
            y = norm_ops.instance_norm(y)
        y = nn.relu(y)
        y = Conv2d(self.features, (3, 1), padding=pad, pad_mode="reflect")(y)
        if self.norm == "adain":
            g2, b2 = adain_params[1]
            y = norm_ops.adain(y, g2, b2)
        else:
            y = norm_ops.instance_norm(y)
        return x + y


class ResidualBlock2d(nn.Module):
    """2-D analogue (reference models.py:1008-1025)."""

    features: int
    norm: str = "in"

    @nn.compact
    def __call__(self, x, adain_params: Optional[Sequence] = None):
        y = Conv2d(self.features, 3, padding=1, pad_mode="reflect")(x)
        if self.norm == "adain":
            g1, b1 = adain_params[0]
            y = norm_ops.adain(y, g1, b1)
        else:
            y = norm_ops.instance_norm(y)
        y = nn.relu(y)
        y = Conv2d(self.features, 3, padding=1, pad_mode="reflect")(y)
        if self.norm == "adain":
            g2, b2 = adain_params[1]
            y = norm_ops.adain(y, g2, b2)
        else:
            y = norm_ops.instance_norm(y)
        return x + y
