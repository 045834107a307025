"""Conv1d as ONE dense matmul — the op-count killer for tiny convs.

The model's Conv1d layers act on (L, C) planes no bigger than 128x4 /
8x64 — i.e. L*C <= 1024 values per sample. At those sizes the im2col
lowering (k slices + concat + dot) costs more in op count and HBM round
trips than the FLOPs it saves. Instead, the whole layer is lowered as

    y = x.reshape(B, L_in*C_in) @ M + b,
    M[(i,ci),(o,co)] = sum_k S[k,i,o] * kernel[k,ci,co]

where S is a CONSTANT 0/1 selector tensor encoding stride / zero-or-
reflect padding (cached per signature, folded by XLA), and M is built
per step by one tiny einsum. The matmul is MXU-shaped ((B,512)@(512,512)
for every encoder stage), autodiff flows through the build einsum (dx is
one matmul with M^T, dkernel one einsum), and the redundant zeros cost
<3x FLOPs on ops that were >95% below peak anyway.

Selected via Conv1d(impl='dense'); the im2col path (ops/conv.py) remains
the reference implementation and the parity oracle in tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _selector_np(l_in: int, k: int, stride: int, padding: int, pad_mode: str) -> np.ndarray:
    """S[k, i, o] = 1 where output o's tap kk reads input i."""
    l_out = (l_in + 2 * padding - k) // stride + 1
    s = np.zeros((k, l_in, l_out), dtype=np.float32)
    for o in range(l_out):
        for kk in range(k):
            u = o * stride + kk - padding
            if u < 0:
                if pad_mode == "reflect":
                    u = -u
                else:
                    continue
            elif u >= l_in:
                if pad_mode == "reflect":
                    u = 2 * l_in - 2 - u
                else:
                    continue
            s[kk, u, o] += 1.0
    return s


@functools.lru_cache(maxsize=None)
def _upconv_selector_np(l_in: int, k: int, padding: int, factor: int) -> np.ndarray:
    """Selector for (nearest-upsample x factor) o (conv k, stride 1, zero
    pad): output o's tap kk reads PRE-upsample input i = (o*1 + kk - p)//factor.
    Folding the upsample into the matrix makes each decoder stage one matmul."""
    l_up = l_in * factor
    l_out = l_up + 2 * padding - k + 1
    s = np.zeros((k, l_in, l_out), dtype=np.float32)
    for o in range(l_out):
        for kk in range(k):
            j = o + kk - padding
            if 0 <= j < l_up:
                s[kk, j // factor, o] += 1.0
    return s


def dense_upconv_matrix(
    kernel: jnp.ndarray, l_in: int, *, padding: int, factor: int = 2
) -> jnp.ndarray:
    """kernel (k, C_in, C_out) -> matrix for upsample(factor)+conv."""
    k, c_in, c_out = kernel.shape
    s = jnp.asarray(_upconv_selector_np(l_in, k, padding, factor), kernel.dtype)
    m = jnp.einsum("kio,kcd->icod", s, kernel)
    return m.reshape(l_in * c_in, s.shape[-1] * c_out)


@functools.lru_cache(maxsize=None)
def _centered_selector_np(l_in: int, k: int, stride: int, padding: int,
                          pad_mode: str) -> np.ndarray:
    """Selector with the InstanceNorm mean-centering folded in.

    center_matrix(einsum(S, kernel)) == einsum(S - mean_o(S), kernel): the
    IN centering subtracts the mean over output POSITIONS per (input row,
    out channel), and the kernel coefficient is position-independent — so
    the centering collapses into the constant selector and costs ZERO ops
    per train step (the separate center_matrix added ~2 fused HLO ops per
    matrix per direction)."""
    s = _selector_np(l_in, k, stride, padding, pad_mode)
    return s - s.mean(axis=2, keepdims=True)


def dense_conv_matrix(
    kernel: jnp.ndarray,
    l_in: int,
    *,
    stride: int = 1,
    padding: int = 0,
    pad_mode: str = "zero",
    centered: bool = False,
) -> jnp.ndarray:
    """kernel (k, C_in, C_out) -> M (L_in*C_in, L_out*C_out).

    centered=True folds the InstanceNorm mean-centering
    (ops/pallas/fused.center_matrix) into the constant selector."""
    k, c_in, c_out = kernel.shape
    sel = _centered_selector_np if centered else _selector_np
    s = jnp.asarray(sel(l_in, k, stride, padding, pad_mode), kernel.dtype)
    l_out = s.shape[-1]
    m = jnp.einsum("kio,kcd->icod", s, kernel)
    return m.reshape(l_in * c_in, l_out * c_out)


def conv1d_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    pad_mode: str = "zero",
) -> jnp.ndarray:
    """x (B, L_in, C_in) -> (B, L_out, C_out), one matmul."""
    b, l_in, c_in = x.shape
    k = kernel.shape[0]
    l_out = (l_in + 2 * padding - k) // stride + 1
    c_out = kernel.shape[-1]
    m = dense_conv_matrix(
        kernel.astype(x.dtype), l_in, stride=stride, padding=padding, pad_mode=pad_mode
    )
    y = jnp.dot(
        x.reshape(b, l_in * c_in), m, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    y = y.reshape(b, l_out, c_out)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
