"""Pallas TPU kernel: fused stride-2 Conv1d (+bias+ReLU) for the env
encoder's strided stages (reference models.py:270-277).

The env encoder's hot stages are k=4/s=2/p=1 convs at flat width 1024-2048
((B,128,16)->(B,64,32), (B,64,32)->(B,32,64), then the constant-depth
(B,32,64)->(B,16,64) and (B,16,64)->(B,8,64)). The dense lowering
(ops/dense_conv.py) would need a 2048x2048 mostly-zero matrix (32x
FLOP-redundant, 16 MB); the im2col lowering round-trips an 8 MB patch tensor
through HBM. This kernel does neither:

  * view the output (B, L_out*C_out) as (B*R, 128) row tiles and the input
    (B, L_in*C_in) as (B*R, IN_LANES) row tiles with the SAME row count R
    (IN_LANES = L_in*C_in/R is 128 for channel-doubling stages, 256 for
    constant-depth ones) — free XLA reshapes outside the kernel;
  * output row r covers P_out = 128/C_out output positions; their receptive
    field 2*lo+t-1 spans input positions [-1, P_in] of the same input row
    (P_in = IN_LANES/C_in = 2*P_out always) — i.e. exactly the PREVIOUS
    row's last position, the CURRENT row, and the NEXT row's first
    position. Prev/next are one-sublane rolls (VPU-cheap), with rows masked
    to zero at sample boundaries — which implements the p=1 zero-padding
    for free;
  * the conv then collapses to three structured (IN_LANES,128) matmuls
    out = relu(roll_down(x) @ Wp + x @ Wc + roll_up(x) @ Wn + b), fused
    with bias+ReLU in VMEM. W3 = [Wp; Wc; Wn] is assembled OUTSIDE the
    kernel from the (4, C_in, C_out) conv kernel by ONE static gather
    (it runs every train step inside the epoch scan, so it must not
    decompose into a pile of scatter kernels); the custom VJP returns dW3
    and autodiff maps it back to the conv kernel through the gather.

Forward reads 4 MB and writes 4 MB per stage at batch 500 — the HBM
speed-of-light for this op. Backward is one kernel producing dx, dW3, db
with dW3/db accumulated across the sample-aligned batch grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iinsvae_tpu.ops.pallas.fused import _interpret, _ld

LANES = 128


@functools.lru_cache(maxsize=None)
def _plan(l_in: int, c_in: int, c_out: int, kernel_size: int,
          stride: int, padding: int, pad_mode: str):
    """(rows_per_sample, in_lanes, p_in, p_out) when the row-tile
    formulation applies, else None."""
    if not (kernel_size == 4 and stride == 2 and padding == 1
            and pad_mode == "zero" and l_in % 2 == 0):
        return None
    if c_out > LANES or LANES % c_out:
        return None
    n_out = (l_in // 2) * c_out
    n_in = l_in * c_in
    if n_out % LANES:
        return None
    r = n_out // LANES  # rows per sample, both views
    if n_in % r:
        return None
    in_lanes = n_in // r
    if in_lanes % LANES or in_lanes % c_in or in_lanes > 2 * LANES:
        return None
    p_in = in_lanes // c_in
    p_out = LANES // c_out
    if 2 * p_out != p_in:  # receptive field must fit prev/cur/next rows
        return None
    return r, in_lanes, p_in, p_out


def applicable(l_in: int, c_in: int, c_out: int, kernel_size: int,
               stride: int, padding: int, pad_mode: str) -> bool:
    return _plan(l_in, c_in, c_out, kernel_size, stride, padding, pad_mode) is not None


@functools.lru_cache(maxsize=None)
def _tap_index(in_lanes: int, c_in: int, c_out: int):
    """Static (3, P_in, P_out) tap-index table: which conv tap (0..3, or 4
    = zero) feeds output position lo from input position lp of the
    prev/cur/next row. For (s, lp, lo) the input position is
    l = lp + (s-1)*P_in and the tap is t = l - 2*lo + 1."""
    import numpy as np

    p_in = in_lanes // c_in
    p_out = LANES // c_out
    tt = np.full((3, p_in, p_out), 4, dtype=np.int32)
    for s in range(3):
        for lp in range(p_in):
            for lo in range(p_out):
                t = lp + (s - 1) * p_in - 2 * lo + 1
                if 0 <= t < 4:
                    tt[s, lp, lo] = t
    return tt


def _assemble_w3(kernel: jnp.ndarray, in_lanes: int, c_in: int, c_out: int) -> jnp.ndarray:
    """(4, C_in, C_out) conv taps -> (3*IN_LANES, 128) [Wp; Wc; Wn]."""
    tt = jnp.asarray(_tap_index(in_lanes, c_in, c_out))
    k5 = jnp.concatenate([kernel, jnp.zeros((1,) + kernel.shape[1:], kernel.dtype)])
    w = jnp.take(k5, tt, axis=0)  # (3, P_in, P_out, C_in, C_out)
    w = jnp.transpose(w, (0, 1, 3, 2, 4))  # (3, P_in, C_in, P_out, C_out)
    return w.reshape(3 * in_lanes, LANES)


def _roll(x, shift: int):
    """Sublane roll; pltpu.roll only takes non-negative shifts."""
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


def _shifted(x, rows_per_sample):
    """(xprev, xnext): one-row rolls masked at sample boundaries (= the
    conv's p=1 zero padding)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    first = (rows % rows_per_sample) == 0
    last = (rows % rows_per_sample) == rows_per_sample - 1
    xprev = jnp.where(first, 0.0, _roll(x, 1))
    xnext = jnp.where(last, 0.0, _roll(x, -1))
    return xprev, xnext, first, last


def _fwd_kernel(rows_per_sample, in_lanes, refs):
    x_ref, w3_ref, b_ref, out_ref = refs
    x = _ld(x_ref)
    w3 = _ld(w3_ref)
    xprev, xnext, _, _ = _shifted(x, rows_per_sample)
    z = (
        jnp.dot(xprev, w3[:in_lanes], preferred_element_type=jnp.float32)
        + jnp.dot(x, w3[in_lanes : 2 * in_lanes], preferred_element_type=jnp.float32)
        + jnp.dot(xnext, w3[2 * in_lanes :], preferred_element_type=jnp.float32)
        + _ld(b_ref)
    )
    out_ref[:] = jnp.maximum(z, 0.0).astype(out_ref.dtype)


def _bwd_kernel(rows_per_sample, in_lanes, refs):
    g_ref, out_ref, x_ref, w3_ref, dx_ref, dw3_ref, db_ref = refs
    g = _ld(g_ref)
    x = _ld(x_ref)
    w3 = _ld(w3_ref)
    dz = jnp.where(_ld(out_ref) > 0, g, 0.0)
    xprev, xnext, first, last = _shifted(x, rows_per_sample)

    dwp = jnp.dot(xprev.T, dz, preferred_element_type=jnp.float32)
    dwc = jnp.dot(x.T, dz, preferred_element_type=jnp.float32)
    dwn = jnp.dot(xnext.T, dz, preferred_element_type=jnp.float32)
    dw_block = jnp.concatenate([dwp, dwc, dwn], axis=0)
    db_block = jnp.sum(dz, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw3_ref[:] += dw_block.astype(dw3_ref.dtype)
    db_ref[:] += db_block.astype(db_ref.dtype)

    # dx: transpose of the masked rolls — mask, then roll the other way
    yp = jnp.dot(dz, w3[:in_lanes].T, preferred_element_type=jnp.float32)
    yc = jnp.dot(dz, w3[in_lanes : 2 * in_lanes].T, preferred_element_type=jnp.float32)
    yn = jnp.dot(dz, w3[2 * in_lanes :].T, preferred_element_type=jnp.float32)
    dx = (
        yc
        + _roll(jnp.where(first, 0.0, yp), -1)
        + _roll(jnp.where(last, 0.0, yn), 1)
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _chunk_samples(b: int, rows_per_sample: int, max_c: int = 125) -> int:
    """Samples per grid chunk: a divisor of b <= max_c whose row count is
    divisible by 8 (Mosaic block sublane granularity). Falls back to the
    whole batch — a block equal to the full array has no such constraint."""
    for c in range(min(b, max_c), 0, -1):
        if b % c == 0 and (c * rows_per_sample) % 8 == 0:
            return c
    return b


@functools.lru_cache(maxsize=None)
def _make_layer(rows_per_sample: int, in_lanes: int):
    def fwd_call(x2, w3, b_row):
        rows = x2.shape[0]
        b = rows // rows_per_sample
        c = _chunk_samples(b, rows_per_sample)
        rc = c * rows_per_sample
        grid = (rows // rc,)
        return pl.pallas_call(
            lambda *refs: _fwd_kernel(rows_per_sample, in_lanes, refs),
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), x2.dtype),
            in_specs=[
                pl.BlockSpec((rc, in_lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * in_lanes, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rc, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(x2, w3, b_row)

    def bwd_call(g, out, x2, w3):
        rows = x2.shape[0]
        b = rows // rows_per_sample
        c = _chunk_samples(b, rows_per_sample)
        rc = c * rows_per_sample
        grid = (rows // rc,)
        return pl.pallas_call(
            lambda *refs: _bwd_kernel(rows_per_sample, in_lanes, refs),
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((rows, in_lanes), x2.dtype),
                jax.ShapeDtypeStruct((3 * in_lanes, LANES), w3.dtype),
                jax.ShapeDtypeStruct((1, LANES), x2.dtype),
            ),
            in_specs=[
                pl.BlockSpec((rc, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rc, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rc, in_lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * in_lanes, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((rc, in_lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * in_lanes, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            interpret=_interpret(),
        )(g, out, x2, w3)

    @jax.custom_vjp
    def layer(x2, w3, b_row):
        return fwd_call(x2, w3, b_row)

    def layer_fwd(x2, w3, b_row):
        out = fwd_call(x2, w3, b_row)
        return out, (x2, w3, out)

    def layer_bwd(saved, g):
        x2, w3, out = saved
        dx, dw3, db = bwd_call(g, out, x2, w3)
        return dx, dw3, db

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_strided_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    l_in: int,
    c_in: int,
) -> jnp.ndarray:
    """relu(conv1d(x, kernel, k=4, s=2, p=1, zero-pad) + bias) as one Pallas
    kernel each way.

    x: (B, l_in, c_in); kernel: (4, c_in, c_out); bias: (c_out,).
    Returns (B, l_in//2, c_out).
    """
    b = x.shape[0]
    c_out = kernel.shape[-1]
    l_out = l_in // 2
    plan = _plan(l_in, c_in, c_out, 4, 2, 1, "zero")
    assert plan is not None, (l_in, c_in, c_out)
    rows_per_sample, in_lanes, _, p_out = plan

    w3 = _assemble_w3(kernel.astype(x.dtype), in_lanes, c_in, c_out)
    b_row = jnp.tile(bias.astype(x.dtype), p_out).reshape(1, LANES)
    x2 = x.reshape(b * rows_per_sample, in_lanes)
    out2 = _make_layer(rows_per_sample, in_lanes)(x2, w3, b_row)
    return out2.reshape(b, l_out, c_out)
