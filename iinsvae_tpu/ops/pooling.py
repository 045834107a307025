"""Adaptive average pooling with exact torch semantics, as a matmul.

The reference uses ``nn.AdaptiveAvgPool1d(128)`` to resample the 152/157-tap
CIR onto a power-of-two grid (reference models.py:146,264) and
``nn.AdaptiveAvgPool1d(in_dim)`` to resample the decoder output back to the
CIR length (reference models.py:436).

Torch semantics: output bin ``i`` averages input taps
``[floor(i*L_in/L_out), ceil((i+1)*L_in/L_out))``. Those windows are static
for static shapes, so the whole op is a single constant matrix ``P`` with
``y = x @ P`` — which XLA fuses into the neighbouring conv matmuls and the
MXU executes for free. This avoids any gather/dynamic-window code on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _pool_matrix_np(l_in: int, l_out: int) -> np.ndarray:
    p = np.zeros((l_in, l_out), dtype=np.float32)
    for i in range(l_out):
        start = (i * l_in) // l_out
        end = -((-(i + 1) * l_in) // l_out)  # ceil((i+1)*l_in / l_out)
        p[start:end, i] = 1.0 / (end - start)
    return p


def adaptive_avg_pool_matrix(l_in: int, l_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """The (l_in, l_out) pooling matrix P such that y = x @ P."""
    return jnp.asarray(_pool_matrix_np(l_in, l_out), dtype=dtype)


def adaptive_avg_pool1d(x: jnp.ndarray, l_out: int) -> jnp.ndarray:
    """x: (..., L_in, C) channels-last -> (..., l_out, C)."""
    l_in = x.shape[-2]
    if l_in == l_out:
        return x
    p = adaptive_avg_pool_matrix(l_in, l_out, dtype=x.dtype)
    # contract the length axis: (..., L_in, C) x (L_in, l_out) -> (..., l_out, C)
    return jnp.einsum("...lc,lo->...oc", x, p)


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., out_h, out_w, C).

    Torch's 2-D adaptive pooling is separable (the window of an output pixel
    is the Cartesian product of the per-axis windows), so it is exactly two
    1-D pooling matmuls.
    """
    out_h, out_w = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    h, w = x.shape[-3], x.shape[-2]
    if h != out_h:
        ph = adaptive_avg_pool_matrix(h, out_h, dtype=x.dtype)
        x = jnp.einsum("...hwc,ho->...owc", x, ph)
    if w != out_w:
        pw = adaptive_avg_pool_matrix(w, out_w, dtype=x.dtype)
        x = jnp.einsum("...hwc,wo->...hoc", x, pw)
    return x
