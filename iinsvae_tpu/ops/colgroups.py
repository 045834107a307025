"""Exact column-group compression for the expanded 2-D path (conv_type=2).

The reference's conv_type=2 encoder runs on a square "expansion" of the CIR
(reference models.py:55): ``image[b, i, j] = x[b, i]`` — every COLUMN of the
image is identical. That structure survives the whole encoder in compressed
form:

* adaptive pooling (separable, exact-weight windows) keeps columns equal;
* a conv whose output columns read the same multiset of input columns (after
  padding) produces equal output columns — so a field only ever has a small
  number of DISTINCT columns ("groups"): 1 through the first reflect-padded
  conv, 3 through every zero-padded stride-2 stage (left edge / interior /
  right edge), growing by one per reflect-padded residual conv only at the
  tiny 8-wide tail;
* InstanceNorm / global means over (H, W) are exact weighted reductions over
  the distinct columns with their multiplicities.

So the encoder never materializes (B, H, W, C) fields at all: it carries
(B, H, G, C) with G ∈ {1..8} plus a static column→group map, and every 2-D
conv becomes a 1-D conv over H with a transformed kernel

    K1[dh, (g, ci), (g', co)] = sum_t A[g', t, g] * K[dh, t, ci, co]

where A is the constant 0/1 tap-to-group incidence of the output group's
column signature. That reuses the whole 1-D lowering stack (dense-matrix /
im2col matmuls, ops/dense_conv.py + ops/conv.py) and cuts the dominant
stages (the env encoder's 7x7x16 @ 128^2 and 4x4 stride-2 stages,
~80 GFLOP/step at batch 500) by the column multiplicity (~40-100x) — with
outputs mathematically identical to the dense 2-D path (fp-reassociation
only; parity-tested in tests/test_colgroups.py).

All group bookkeeping is static Python over (W, kernel, stride, padding,
pad_mode) signatures, cached — nothing dynamic reaches XLA.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp
from jax import lax

from iinsvae_tpu.ops import conv as conv_ops
from iinsvae_tpu.ops import dense_conv as dense_ops
from iinsvae_tpu.ops.pooling import _pool_matrix_np


PAD = -1  # sentinel group id for a zero-padding tap


@dataclass
class GroupedField:
    """A width-compressed NHWC field: data[b, h, g, c] is the value of every
    column j with col2g[j] == g. ``col2g`` is a static tuple (length W)."""

    data: jnp.ndarray  # (B, H, G, C)
    col2g: tuple  # length W, values in [0, G)

    @property
    def width(self) -> int:
        return len(self.col2g)

    @property
    def counts(self) -> np.ndarray:
        return np.bincount(np.asarray(self.col2g), minlength=self.data.shape[2]).astype(np.float32)

    def expand(self) -> jnp.ndarray:
        """-> dense (B, H, W, C)."""
        idx = jnp.asarray(np.asarray(self.col2g), jnp.int32)
        return jnp.take(self.data, idx, axis=2)


def constant_field(x1d: jnp.ndarray, width: int) -> GroupedField:
    """(B, H, C) column-constant field of the given width: one group."""
    return GroupedField(x1d[:, :, None, :], (0,) * width)


@functools.lru_cache(maxsize=None)
def conv_group_structure(
    col2g: tuple, kw: int, stride: int, padding: int, pad_mode: str
):
    """Static group calculus for one conv layer along W.

    Returns (col2g_out, signatures) where signatures[g'] is the kw-tuple of
    input group ids (PAD for a zero tap) read by any output column in group
    g'. Two output columns with equal signatures are exactly equal.
    """
    w = len(col2g)
    w_out = (w + 2 * padding - kw) // stride + 1
    sig2g: dict = {}
    col2g_out = []
    signatures = []
    for j in range(w_out):
        sig = []
        for t in range(kw):
            u = j * stride + t - padding
            if u < 0:
                u = -u if pad_mode == "reflect" else PAD
            elif u >= w:
                u = 2 * w - 2 - u if pad_mode == "reflect" else PAD
            sig.append(PAD if u == PAD else col2g[u])
        sig = tuple(sig)
        if sig not in sig2g:
            sig2g[sig] = len(signatures)
            signatures.append(sig)
        col2g_out.append(sig2g[sig])
    return tuple(col2g_out), tuple(signatures)


@functools.lru_cache(maxsize=None)
def _tap_incidence_np(signatures: tuple, g_in: int) -> np.ndarray:
    """A[g', t, g] = 1 where output group g' tap t reads input group g."""
    g_out, kw = len(signatures), len(signatures[0])
    a = np.zeros((g_out, kw, g_in), dtype=np.float32)
    for gp, sig in enumerate(signatures):
        for t, g in enumerate(sig):
            if g != PAD:
                a[gp, t, g] = 1.0
    return a


def conv2d_grouped(
    xg: GroupedField,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    pad_mode: str = "zero",
) -> GroupedField:
    """2-D conv (square kernel/stride/padding, same pad mode both axes) on a
    grouped field: ONE 1-D conv over H with the group-transformed kernel."""
    kh, kw, c_in, c_out = kernel.shape
    b, h, g, c = xg.data.shape
    assert c == c_in, (c, c_in)
    col2g_out, sigs = conv_group_structure(
        xg.col2g, kw, stride, padding, pad_mode
    )
    g_out = len(sigs)
    a = jnp.asarray(_tap_incidence_np(sigs, g), kernel.dtype)
    # K1[dh, (g, ci), (g', co)] = sum_t A[g', t, g] K[dh, t, ci, co]
    k1 = jnp.einsum("Gtg,htcd->hgcGd", a, kernel).reshape(
        kh, g * c_in, g_out * c_out
    )
    full_bias = None
    if bias is not None:
        full_bias = jnp.tile(bias, g_out)
    x2 = xg.data.reshape(b, h, g * c_in)
    # dense single-matmul lowering while the layer matrix stays small,
    # im2col beyond (same policy as ConvINAct, models/layers.py)
    h_out = (h + 2 * padding - kh) // stride + 1
    if (h * g * c_in) * (h_out * g_out * c_out) <= 1_048_576:
        y = dense_ops.conv1d_dense(
            x2, k1, full_bias, stride=stride, padding=padding, pad_mode=pad_mode
        )
    else:
        y = conv_ops.conv1d(
            x2, k1, full_bias, stride=stride, padding=padding, pad_mode=pad_mode
        )
    return GroupedField(y.reshape(b, h_out, g_out, c_out), col2g_out)


def instance_norm_grouped(xg: GroupedField, eps: float = 1e-5) -> GroupedField:
    """InstanceNorm over (H, W) per (sample, channel), with W reduced as a
    multiplicity-weighted sum over groups — exact (ops/norms.py semantics:
    biased variance, eps=1e-5, no affine)."""
    b, h, g, c = xg.data.shape
    wts = jnp.asarray(xg.counts / (h * xg.width), xg.data.dtype)  # (G,)
    mean = jnp.einsum("bhgc,g->bc", xg.data, wts)
    centered = xg.data - mean[:, None, None, :]
    var = jnp.einsum("bhgc,g->bc", centered * centered, wts)
    inv = lax.rsqrt(var + eps)
    return GroupedField(centered * inv[:, None, None, :], xg.col2g)


def adain_grouped(
    xg: GroupedField, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5
) -> GroupedField:
    """AdaIN (ops/norms.py::adain) on a grouped field: weighted IN stats,
    then the per-sample (B, C) affine broadcast over (H, G)."""
    y = instance_norm_grouped(xg, eps)
    g = gamma[:, None, None, :].astype(y.data.dtype)
    b = beta[:, None, None, :].astype(y.data.dtype)
    return GroupedField(y.data * g + b, y.col2g)


def identity_field(x: jnp.ndarray) -> GroupedField:
    """Dense (B, H, W, C) -> grouped with every column its own group: the
    degenerate case where the grouped conv becomes a W-folded 1-D conv with
    W*C channels (used by the decoder's 8x8 AdaIN residual tail, where the
    spatial extent is too small for XLA's conv to tile the MXU)."""
    return GroupedField(x, tuple(range(x.shape[2])))


def global_mean_grouped(xg: GroupedField) -> jnp.ndarray:
    """mean over (H, W) -> (B, C) (AdaptiveAvgPool2d(1) on the dense field)."""
    b, h, g, c = xg.data.shape
    wts = jnp.asarray(xg.counts / (h * xg.width), xg.data.dtype)
    return jnp.einsum("bhgc,g->bc", xg.data, wts)


def relu_grouped(xg: GroupedField) -> GroupedField:
    return GroupedField(jnp.maximum(xg.data, 0), xg.col2g)


def add_grouped(a: GroupedField, b: GroupedField) -> GroupedField:
    """Skip-connection add. Both fields must share the same grouping; if not,
    refine to the coarsest common refinement (static)."""
    if a.col2g == b.col2g:
        return GroupedField(a.data + b.data, a.col2g)
    col2g, map_a, map_b = _common_refinement(a.col2g, b.col2g)
    da = jnp.take(a.data, jnp.asarray(map_a, jnp.int32), axis=2)
    db = jnp.take(b.data, jnp.asarray(map_b, jnp.int32), axis=2)
    return GroupedField(da + db, col2g)


@functools.lru_cache(maxsize=None)
def _common_refinement(col2g_a: tuple, col2g_b: tuple):
    """Coarsest grouping refining both: groups = distinct (ga, gb) pairs.
    Returns (col2g, rep_a, rep_b) where rep_x[g] is the source group in x."""
    assert len(col2g_a) == len(col2g_b)
    pair2g: dict = {}
    col2g, rep_a, rep_b = [], [], []
    for ga, gb in zip(col2g_a, col2g_b):
        key = (ga, gb)
        if key not in pair2g:
            pair2g[key] = len(rep_a)
            rep_a.append(ga)
            rep_b.append(gb)
        col2g.append(pair2g[key])
    return tuple(col2g), tuple(rep_a), tuple(rep_b)


def pool_constant_field(xg: GroupedField, out_hw: int) -> GroupedField:
    """Adaptive average pool (both axes) of a SINGLE-GROUP (column-constant)
    field. Pooling along W of a column-constant image is exact (each window
    averages equal values with weights summing to exactly 1 — windows are 1
    or 2 taps wide at these sizes), so only the H pool computes; the result
    is the constant field of the output width."""
    assert xg.data.shape[2] == 1, "pool_constant_field needs G == 1"
    h = xg.data.shape[1]
    if h == out_hw and xg.width == out_hw:
        return xg
    p = jnp.asarray(_pool_matrix_np(h, out_hw), xg.data.dtype)
    return GroupedField(
        jnp.einsum("bhgc,ho->bogc", xg.data, p), (0,) * out_hw
    )


def pool_h_grouped(xg: GroupedField, h_out: int) -> GroupedField:
    """Adaptive average pool along H only (W pooling of a grouped field with
    the exact-weight windows is the identity on group values when the output
    width equals the input width; the encoder pools H=157->128 BEFORE the
    field is built, so this is only used by tests)."""
    p = jnp.asarray(_pool_matrix_np(xg.data.shape[1], h_out), xg.data.dtype)
    return GroupedField(
        jnp.einsum("bhgc,ho->bogc", xg.data, p), xg.col2g
    )
